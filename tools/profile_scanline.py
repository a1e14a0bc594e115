"""On-chip decomposition of the scanline-320 bench config.

Times the full Engine.apply(u8) against isolated stages (pure Pallas
blit, chain-without-finalize, finalize-only) with honest scalar-readback
syncs, and dumps the compiled HLO's largest buffers when the backend
exposes it.
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

PRESET = "/root/reference/shaders/shaders_glsl/interpolation/sharp-bilinear-scanlines.glslp"
BATCH = 64
H, W = 240, 320
VW, VH = 1920, 1080


def sync(x):
    return float(jnp.sum(jnp.asarray(x, jnp.float32) if x.dtype == jnp.uint8 else x))


def timeit(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    sync(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    dt = (time.time() - t0) / iters
    return dt


def main():
    rng = np.random.default_rng(0)
    raw = jnp.asarray((rng.random((BATCH, H, W, 3)) * 255).astype(np.uint8))
    vary = jax.jit(lambda f, k: f ^ k)
    ctr = [0]

    def produce():
        ctr[0] += 1
        return vary(raw, jnp.uint8(ctr[0] % 251))

    e = Engine(viewport=(VW, VH))
    assert e.load_preset(PRESET), e.last_error

    # 1. full apply u8
    t0 = time.time()
    out = e.apply(produce(), output="u8")
    sync(out)
    print(f"compile: {time.time()-t0:.1f}s out {out.shape} {out.dtype}")
    dt = timeit(lambda: e.apply(produce(), output="u8"))
    print(f"full apply u8:        {dt*1e3:8.2f} ms/batch  {dt/BATCH*1e6:8.1f} us/frame")

    # 2. full apply f32
    dt = timeit(lambda: e.apply(produce(), output="f32"))
    print(f"full apply f32:       {dt*1e3:8.2f} ms/batch  {dt/BATCH*1e6:8.1f} us/frame")

    # 3. pure Pallas blit 240x320x4 -> 1080p u8, batch
    from retrocapture_tpu.ops.pallas.resample import resample_u8
    from retrocapture_tpu.ops.sampling import _axis_matrix_device

    u_row = ((np.arange(VW) + 0.5) / VW).astype(np.float32)
    v_col = ((np.arange(VH) + 0.5) / VH).astype(np.float32)
    ax = _axis_matrix_device(u_row, W, True, "clamp_to_edge")
    ay = _axis_matrix_device(v_col, H, True, "clamp_to_edge")
    srcf = jnp.asarray(rng.random((BATCH, H, W, 4)), jnp.float32)

    blit = jax.jit(lambda s: jax.vmap(lambda t: resample_u8(t, ay, ax))(s))
    dt = timeit(blit, srcf)
    print(f"pure pallas blit u8:  {dt*1e3:8.2f} ms/batch  {dt/BATCH*1e6:8.1f} us/frame")

    # 4. chain without finalize (pass output f32 at 1080p, no u8)
    key = (H, W, VW, VH)
    state = e._get_state(key, jnp.float32)
    fn32 = e._get_jit(key, u8=False)
    dt = timeit(lambda: fn32(produce(), state)[0])
    print(f"jit f32 path:         {dt*1e3:8.2f} ms/batch  {dt/BATCH*1e6:8.1f} us/frame")

    fnu8 = e._get_jit(key, u8=True)
    dt = timeit(lambda: fnu8(produce(), state)[0])
    print(f"jit u8 path:          {dt*1e3:8.2f} ms/batch  {dt/BATCH*1e6:8.1f} us/frame")

    # 5. HLO buffer analysis
    try:
        lowered = jax.jit(lambda r, s: fnu8._fun(r, s) if hasattr(fnu8, "_fun") else None)
    except Exception:
        pass
    try:
        txt = fnu8.lower(raw, state).compile().as_text()
        big = []
        for line in txt.splitlines():
            if "fusion" in line or "dot" in line or "convert" in line:
                if "f32[64" in line or "u8[64" in line or "f32[1080" in line:
                    big.append(line.strip()[:160])
        print(f"--- compiled HLO: {len(txt.splitlines())} lines; sample big-tensor ops:")
        for line in big[:30]:
            print("   ", line)
        Path("/tmp/scanline_hlo.txt").write_text(txt)
        print("full HLO -> /tmp/scanline_hlo.txt")
    except Exception as ex:
        print("HLO dump unavailable:", ex)


if __name__ == "__main__":
    main()
