"""Itemize the per-frame plumbing tax on the bench configs (round-3).

Round-2 left a profiled-but-unexplained gap: scanline burns 0.335 ms/f
where its I/O roofline is ~0.03 ms, and scanline/feedback land at the
SAME ms/f — a hint that a fixed per-call cost, not per-pixel math,
dominates. This probe measures, with value-varying inputs and scalar
readback syncs (the honest-timing rules from PARITY.md):

  1. produce-only: the bench's input-varying XOR kernel + sync
  2. u8->f32 normalize alone (the [B,240,320,4] conversion)
  3. blit-only chain: normalize -> identity -> fused u8 viewport blit
     (the floor any 1080p-output config pays)
  4. full apply(u8) per config
  5. batch scaling for scanline: 128 / 256 / 512
  6. ntsc A/B: per-frame FrameCount (batch-varying trig fields) vs one
     shared FrameCount for the whole batch (batch-invariant trig)

Usage: python tools/profile_plumbing.py [step ...]
  steps: floor scanline ntsc batches
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

SHADERS = Path("/root/reference/shaders/shaders_glsl")

_sync = None


def sync(x):
    global _sync
    if _sync is None:
        # Sparse-slice fence (bench.py rationale): PJRT buffer-level deps
        # make any consumer wait for the whole producing execution; a
        # full-tensor f32 sum of a batch-128 u8 1080p output is a 3.2 GB
        # temp that OOMs alongside the chain's own buffers.
        _sync = jax.jit(
            lambda t: jnp.sum(t[..., ::64, ::64, :].astype(jnp.float32))
            if jnp.ndim(t) >= 3
            else jnp.sum(t.astype(jnp.float32))
        )
    return float(_sync(x))


def timeit(fn, produce, iters=8, windows=3):
    out = fn(produce())
    sync(out)
    times = []
    for _ in range(windows):
        t0 = time.time()
        for _ in range(iters):
            out = fn(produce())
        sync(out)
        times.append((time.time() - t0) / iters)
    return min(times)


def make_produce(batch, h=240, w=320, c=3):
    rng = np.random.default_rng(0)
    raw = jnp.asarray((rng.random((batch, h, w, c)) * 255).astype(np.uint8))
    vary = jax.jit(lambda f, k: f ^ k)
    counter = [0]

    def produce():
        counter[0] += 1
        return vary(raw, jnp.uint8(counter[0] % 251))

    return produce


def step_floor(batch=128):
    from retrocapture_tpu.runtime.engine import Engine
    from retrocapture_tpu.ops.pallas.resample import blit_u8

    produce = make_produce(batch)

    # 1. produce-only: bench input variation + sync round trip
    t = timeit(lambda x: x, produce, iters=16)
    print(f"produce-only (batch {batch}): {t * 1e3:.2f} ms/call "
          f"{t / batch * 1e3:.4f} ms/f", flush=True)

    # 2. normalize alone
    norm = jax.jit(lambda r: Engine._to_rgba_float(r))
    t = timeit(norm, produce, iters=16)
    print(f"u8->f32 normalize: {t * 1e3:.2f} ms/call {t / batch * 1e3:.4f} ms/f",
          flush=True)

    # 3. normalize + fused u8 blit to 1080p (identity chain)
    @jax.jit
    def blit_only(r):
        src = Engine._to_rgba_float(r)
        return jax.vmap(lambda t: blit_u8(t[..., :3], 1920, 1080))(src)

    t = timeit(blit_only, produce, iters=8)
    print(f"normalize+blit-u8 1080p: {t * 1e3:.2f} ms/call "
          f"{t / batch * 1e3:.4f} ms/f", flush=True)


def step_scanline(batches=(128, 256, 512)):
    from retrocapture_tpu.runtime.engine import Engine

    for batch in batches:
        produce = make_produce(batch)
        e = Engine(viewport=(1920, 1080))
        assert e.load_preset(
            str(SHADERS / "interpolation/sharp-bilinear-scanlines.glslp")
        ), e.last_error
        try:
            t = timeit(lambda f: e.apply(f, output="u8"), produce, iters=6)
            print(f"scanline batch {batch}: {batch / t:.1f} fps "
                  f"({t / batch * 1e3:.4f} ms/f, {t * 1e3:.2f} ms/call)",
                  flush=True)
        except Exception as ex:  # noqa: BLE001
            print(f"scanline batch {batch}: ERROR {type(ex).__name__}: {ex}",
                  flush=True)


def step_ntsc(batch=128):
    """A/B: batch-varying FrameCount vs shared FrameCount, and noblit."""
    import retrocapture_tpu.runtime.engine as em
    from retrocapture_tpu.runtime.engine import Engine

    produce = make_produce(batch)
    e = Engine(viewport=(1920, 1080))
    assert e.load_preset(str(SHADERS / "ntsc/ntsc-320px.glslp")), e.last_error
    t = timeit(lambda f: e.apply(f, output="u8"), produce, iters=6)
    print(f"ntsc full u8 (per-frame fc): {batch / t:.1f} fps "
          f"({t / batch * 1e3:.4f} ms/f)", flush=True)

    key = (240, 320, 1920, 1080)
    state = e._get_state(key, jnp.float32)
    shapes = em.compute_chain_shapes(e._program.preset, 320, 240, 1920, 1080)
    params = dict(e._program.defaults)
    prog = e._program

    def chain(raw_b, shared_fc: bool, blit: bool):
        src_b = Engine._to_rgba_float(raw_b)
        nb = src_b.shape[0]
        fcs = state.frame_count + (
            jnp.zeros((nb,), jnp.int32) if shared_fc
            else jnp.arange(nb, dtype=jnp.int32)
        )
        tms = state.time + jnp.float32(0.016) * jnp.arange(nb, dtype=jnp.float32)

        def one(src, fc, tm):
            out, _, _ = em._run_chain(
                prog, shapes, (1920, 1080), src, state.history,
                state.feedback, fc, tm, params, blit=blit,
            )
            return out

        return jax.vmap(one)(src_b, fcs, tms)

    for shared in (False, True):
        fn = jax.jit(lambda r, s=shared: chain(r, s, blit=True))
        t = timeit(fn, produce, iters=6)
        print(f"ntsc chain+blit(f32) shared_fc={shared}: "
              f"{t / batch * 1e3:.4f} ms/f", flush=True)
    for shared in (False, True):
        fn = jax.jit(lambda r, s=shared: chain(r, s, blit=False))
        t = timeit(fn, produce, iters=6)
        print(f"ntsc chain-noblit(f32) shared_fc={shared}: "
              f"{t / batch * 1e3:.4f} ms/f", flush=True)


STEPS = {
    "floor": step_floor,
    "scanline": step_scanline,
    "ntsc": step_ntsc,
}

if __name__ == "__main__":
    names = sys.argv[1:] or list(STEPS)
    dev = jax.devices()[0]
    print(f"device: {dev} platform={dev.platform}", flush=True)
    for n in names:
        STEPS[n]()
