"""Round-3: itemize scanline-320's per-call cost on chip.

scanline full apply(u8) = 38 ms/call at batch 128 (0.30 ms/f) where the
normalize+blit floor is 14 ms/call. This probe times each candidate
component of the remaining 24 ms in isolation, batched 128:

  a. y-axis one-hot matmul  [1080,240] @ [B,240,320,4]
  b. + x-axis matmul        [1920,320] @ [B,1080,320,4] (the 5.3 GFLOP/f)
  c. + epilogue + u8 convert (fused by XLA?)
  d. b with DEFAULT vs HIGH precision
  e. blit_u8 Pallas kernel alone (vmapped)
  f. dispatch floor: K empty chained calls per window

Usage: python tools/profile_scanline_parts.py
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

B, H, W = 128, 240, 320
OH, OW = 1080, 1920


def sync(x):
    return float(jnp.sum(jnp.asarray(x, jnp.float32)))


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


def main():
    from retrocapture_tpu.ops.sampling import _axis_matrix

    rng = np.random.default_rng(0)
    raw = jnp.asarray((rng.random((B, H, W, 4)) * 255).astype(np.float32))
    vary = jax.jit(lambda f, k: f + k)
    counter = [0]

    def produce():
        counter[0] += 1
        return vary(raw, jnp.float32(counter[0] % 7))

    u_row = ((np.arange(OW) + 0.5) / OW).astype(np.float32)
    v_col = ((np.arange(OH) + 0.5) / OH).astype(np.float32)
    ax = jnp.asarray(_axis_matrix(u_row, W, True, "clamp_to_edge"))
    ay = jnp.asarray(_axis_matrix(v_col, H, True, "clamp_to_edge"))
    sine = jnp.asarray(
        0.6 + 0.75 * np.sin((np.arange(OH) + 0.5) * 3.14159).astype(np.float32)
    )[None, :, None, None]

    @jax.jit
    def y_only(t):
        return jnp.einsum("hs,bswc->bhwc", ay, t, preferred_element_type=jnp.float32)

    @jax.jit
    def yx(t):
        th = jnp.einsum("hs,bswc->bhwc", ay, t, preferred_element_type=jnp.float32)
        return jnp.einsum("ws,bhsc->bhwc", ax, th, preferred_element_type=jnp.float32)

    @jax.jit
    def yx_u8(t):
        th = jnp.einsum("hs,bswc->bhwc", ay, t, preferred_element_type=jnp.float32)
        o = jnp.einsum("ws,bhsc->bhwc", ax, th, preferred_element_type=jnp.float32)
        o = o * sine
        return jnp.round(jnp.clip(o[..., :3], 0, 1) * 255).astype(jnp.uint8)

    @jax.jit
    def yx_u8_high(t):
        th = jnp.einsum("hs,bswc->bhwc", ay, t,
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGH)
        o = jnp.einsum("ws,bhsc->bhwc", ax, th,
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGH)
        o = o * sine
        return jnp.round(jnp.clip(o[..., :3], 0, 1) * 255).astype(jnp.uint8)

    from retrocapture_tpu.ops.pallas.resample import blit_u8

    @jax.jit
    def pallas_blit(t):
        return jax.vmap(lambda f: blit_u8(f[..., :3], OW, OH))(t)

    for name, fn, iters in [
        ("y-matmul only (f32 out)", y_only, 8),
        ("y+x matmul (f32 out)", yx, 8),
        ("y+x matmul + sine + u8", yx_u8, 8),
        ("y+x HIGH precision + u8", yx_u8_high, 8),
        ("pallas blit_u8 vmap", pallas_blit, 8),
    ]:
        try:
            t = timeit(fn, produce, iters=iters)
            print(f"{name}: {t * 1e3:.2f} ms/call  {t / B * 1e3:.4f} ms/f",
                  flush=True)
        except Exception as ex:  # noqa: BLE001
            print(f"{name}: ERROR {type(ex).__name__}: {ex}", flush=True)

    # dispatch floor: chained trivial kernels, one sync per window
    x = jnp.zeros((8, 128), jnp.float32)
    triv = jax.jit(lambda a: a * 1.0001 + 1.0)
    t0 = time.time()
    o = x
    for _ in range(64):
        o = triv(o)
    sync(o)
    print(f"chained trivial dispatch: {(time.time() - t0) / 64 * 1e3:.3f} ms/call",
          flush=True)


if __name__ == "__main__":
    dev = jax.devices()[0]
    print(f"device: {dev} platform={dev.platform}", flush=True)
    main()
