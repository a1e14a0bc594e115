"""Per-config stage breakdown on the real chip.

For each BASELINE config, times three jitted programs built from the
same engine internals:
  A) input normalize only (u8->f32 RGBA + packed convert)
  B) normalize + chain, NO viewport blit (f32 at chain-native size)
  C) the full u8 path (normalize + chain + fused blit + u8)
so chain cost = B - A and blit cost = C - B, with honest scalar syncs.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp

from retrocapture_tpu.runtime.engine import Engine

SHADERS = Path("/root/reference/shaders/shaders_glsl")
CONFIGS = [
    ("scanline-320", SHADERS / "interpolation/sharp-bilinear-scanlines.glslp", (240, 320), 64, "rgb"),
    ("xbr-lv2-1080p", SHADERS / "xbr/xbr-lv2.glslp", (240, 320), 32, "rgb"),
    ("crt-mattias-1080p", SHADERS / "crt/crt-mattias.glslp", (240, 320), 16, "rgb"),
    ("ntsc-320px", SHADERS / "ntsc/ntsc-320px.glslp", (240, 320), 32, "rgb"),
    ("feedback-ghost-nv12", REPO / "assets/presets/feedback-ghost.glslp", (240, 320), 32, "nv12"),
]
VW, VH = 1920, 1080


def sync(x):
    x = jnp.asarray(x)
    if x.dtype == jnp.uint8:
        x = x.astype(jnp.float32)
    return float(jnp.sum(x))


def timeit(fn, produce, iters=12, warmup=2):
    for _ in range(warmup):
        out = fn(produce())
    sync(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(produce())
    sync(out)
    return (time.time() - t0) / iters


def main():
    only = sys.argv[1] if len(sys.argv) > 1 else None
    for name, preset, (h, w), batch, fmt in CONFIGS:
        if only and only not in name:
            continue
        rng = np.random.default_rng(0)
        if fmt == "nv12":
            raw = jnp.asarray((rng.random((batch, h + h // 2, w)) * 255).astype(np.uint8))
        else:
            raw = jnp.asarray((rng.random((batch, h, w, 3)) * 255).astype(np.uint8))
        vary = jax.jit(lambda f, k: f ^ k)
        ctr = [0]

        def produce():
            ctr[0] += 1
            return vary(raw, jnp.uint8(ctr[0] % 251))

        e = Engine(viewport=(VW, VH))
        ok = e.load_preset(str(preset))
        if not ok:
            print(f"{name}: LOAD FAILED {e.last_error}")
            continue
        e.set_input_format(fmt)
        key = (h, w, VW, VH)
        state = e._get_state(key, jnp.float32)

        # A: normalize only
        prog = e._program

        def norm_only(raw_b):
            if fmt != "rgb":
                raw_b = e._convert_packed(raw_b)
            return Engine._to_rgba_float(raw_b)

        fa = jax.jit(norm_only)
        ta = timeit(fa, produce)

        # B: chain no-blit f32 — reproduce batch_fn but with blit off.
        from retrocapture_tpu.runtime.engine import _run_chain
        from retrocapture_tpu.graph.scale import compute_chain_shapes

        shapes = compute_chain_shapes(prog.preset, w, h, VW, VH)
        params = dict(prog.defaults)
        temporal = prog.uses_history() or prog.uses_feedback()

        def chain_noblit(raw_b):
            src_b = norm_only(raw_b)
            nb = src_b.shape[0]
            if temporal:
                def step(carry, src):
                    hist, fb, fc, tm = carry
                    out, hist, fb = _run_chain(
                        prog, shapes, (VW, VH), src, hist, fb, fc, tm, params,
                        blit=False, allow_factored=False)
                    return (hist, fb, fc + 1, tm + jnp.float32(0.016)), out
                carry0 = (state.history, state.feedback, state.frame_count, state.time)
                _, outs = jax.lax.scan(step, carry0, src_b)
                return outs
            fcs = state.frame_count + jnp.arange(nb, dtype=jnp.int32)
            tms = state.time + jnp.float32(0.016) * jnp.arange(nb, dtype=jnp.float32)
            def one(src, fc, tm):
                out, _, _ = _run_chain(
                    prog, shapes, (VW, VH), src, state.history, state.feedback,
                    fc, tm, params, blit=False)
                return out
            return jax.vmap(one)(src_b, fcs, tms)

        fb_ = jax.jit(chain_noblit)
        t0 = time.time()
        tb = timeit(fb_, produce)
        out = fb_(produce())
        chain_shape = out.shape

        # C: full u8
        fn = e._get_jit(key, u8=True)
        fc_ = lambda r: fn(r, state)[0]
        tc = timeit(fc_, produce)

        us = lambda t: t / batch * 1e6
        print(
            f"{name:22s} batch={batch:3d} chain_out={chain_shape}  "
            f"A_norm={us(ta):7.1f}  B_chain={us(tb):7.1f}  C_full={us(tc):7.1f} us/f  "
            f"[chain-only={us(tb-ta):7.1f}, blit+u8={us(tc-tb):7.1f}]"
        )


if __name__ == "__main__":
    main()
