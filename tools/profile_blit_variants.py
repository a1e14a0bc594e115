"""Round-3: A/B the 1080p viewport-blit lowering on the real chip.

The floor probe puts normalize+blit-u8 at 14.2 ms/call (batch 128) —
~0.08 ms/frame of fixed cost on every 1080p-output config. The current
Pallas kernel runs dense f32 matmuls: ~96 GMAC/call, which at the v5e's
~1/8-rate f32 MXU path is exactly the measured cost. Banding can't
help (MXU K-dim pads to 128), so the candidates are arithmetic:

  v0     current pallas kernel (y-first, in-kernel f32 dots)
  v0x    pallas kernel, x-first (645 vs 746 MMAC/frame/ch)
  vhi    XLA einsum precision=HIGH (3-pass bf16 f32-emulation) + cast
  vlo    XLA einsum default precision (1-pass bf16) — speed ceiling +
         error yardstick, NOT a shipping candidate
  v3p    pallas kernel with explicit 3-pass hi/lo split, y-first
  v3px   same, x-first
  wfloor pure u8-write kernel — the HBM floor for this output

Each variant is timed with value-varying inputs + lagged-fence syncs
and bit-compared against v0's uint8 output (max |diff| in u8 steps and
flip rate) — a candidate ships only if u8-identical or provably below
the GL oracle's own noise.

Usage: python tools/profile_blit_variants.py [variant ...]
"""

from __future__ import annotations

import sys
import time
from functools import partial
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp

B, H, W, C = 128, 240, 320, 3
VW, VH = 1920, 1080


def fence(x):
    return jax.jit(lambda t: jnp.sum(t[..., ::64, ::64, :].astype(jnp.float32)))(x)


def timeit(fn, produce, iters=12, windows=3):
    out = fn(produce())
    float(fence(out))
    times = []
    for _ in range(windows):
        fs = []
        t0 = time.time()
        for i in range(iters):
            out = fn(produce())
            fs.append(fence(out))
            if i % 4 == 3 and i >= 2:
                float(fs[i - 2])
        float(fence(out))
        times.append((time.time() - t0) / iters)
    return min(times)


def make_produce():
    rng = np.random.default_rng(0)
    raw = jnp.asarray(rng.random((B, H, W, C), np.float32))
    vary = jax.jit(lambda f, k: jnp.abs(f - k))
    counter = [0]

    def produce():
        counter[0] += 1
        return vary(raw, jnp.float32((counter[0] % 17) / 16.0))

    return produce


def axes():
    from retrocapture_tpu.ops.sampling import _axis_matrix

    u = ((np.arange(VW, dtype=np.float64) + 0.5) / VW).astype(np.float32)
    v = ((np.arange(VH, dtype=np.float64) + 0.5) / VH).astype(np.float32)
    ax = _axis_matrix(u, W, True, "clamp_to_edge")  # [VW, W]
    ay = _axis_matrix(v, H, True, "clamp_to_edge")  # [VH, H]
    return jnp.asarray(ay), jnp.asarray(ax)


def split_hi_lo(a):
    hi = a.astype(jnp.bfloat16).astype(jnp.float32)
    return hi, a - hi


@jax.jit
def v0(t):
    from retrocapture_tpu.ops.pallas.resample import blit_u8

    return jax.vmap(lambda f: blit_u8(f, VW, VH))(t)


def _pallas_xfirst(tex, ay, ax):
    """x-first dense pallas: grid over output rows; stage1 (shared) is
    tex @ ax^T at source rows, stage2 per tile ay_tile @ X."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    h, w, c = tex.shape
    oh, ow = ay.shape[0], ax.shape[0]
    TR = 128
    oh_pad = ((oh + TR - 1) // TR) * TR
    if oh_pad != oh:
        ay = jnp.pad(ay, ((0, oh_pad - oh), (0, 0)))

    def kernel(*refs):
        ay_r = refs[0][:]  # [TR, h]
        axt = refs[1][:]  # [w, ow]
        texs = refs[2 : 2 + c]
        outs = refs[2 + c :]
        for ch in range(c):
            x1 = jnp.dot(texs[ch][:], axt, preferred_element_type=jnp.float32)
            b = jnp.dot(ay_r, x1, preferred_element_type=jnp.float32)
            q = jnp.round(jnp.clip(b, 0.0, 1.0) * 255.0).astype(jnp.int32)
            outs[ch][:] = q.astype(jnp.uint8)

    grid = (oh_pad // TR,)
    in_specs = [
        pl.BlockSpec((TR, h), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((w, ow), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ] + [
        pl.BlockSpec((h, w), lambda i: (0, 0), memory_space=pltpu.VMEM)
        for _ in range(c)
    ]
    out_specs = [
        pl.BlockSpec((TR, ow), lambda i: (i, 0), memory_space=pltpu.VMEM)
        for _ in range(c)
    ]
    outs = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((oh_pad, ow), jnp.uint8) for _ in range(c)],
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
    )(ay, ax.T, *(tex[:, :, ch] for ch in range(c)))
    out = jnp.stack(outs, axis=-1)
    return out[:oh] if oh_pad != oh else out


def _pallas_3pass(tex, ay, ax, xfirst: bool):
    """Dense pallas with explicit 3-pass hi/lo bf16 split on both dots."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    h, w, c = tex.shape
    oh, ow = ay.shape[0], ax.shape[0]
    TR = 128
    oh_pad = ((oh + TR - 1) // TR) * TR
    if oh_pad != oh:
        ay = jnp.pad(ay, ((0, oh_pad - oh), (0, 0)))

    def dot3(a, b):
        a_hi = a.astype(jnp.bfloat16)
        a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        b_hi = b.astype(jnp.bfloat16)
        b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        o = jnp.dot(a_hi, b_hi, preferred_element_type=jnp.float32)
        o += jnp.dot(a_hi, b_lo, preferred_element_type=jnp.float32)
        o += jnp.dot(a_lo, b_hi, preferred_element_type=jnp.float32)
        return o

    def kernel(*refs):
        ay_r = refs[0][:]
        axt = refs[1][:]
        texs = refs[2 : 2 + c]
        outs = refs[2 + c :]
        for ch in range(c):
            if xfirst:
                x1 = dot3(texs[ch][:], axt)
                b = dot3(ay_r, x1)
            else:
                a = dot3(ay_r, texs[ch][:])
                b = dot3(a, axt)
            q = jnp.round(jnp.clip(b, 0.0, 1.0) * 255.0).astype(jnp.int32)
            outs[ch][:] = q.astype(jnp.uint8)

    grid = (oh_pad // TR,)
    in_specs = [
        pl.BlockSpec((TR, h), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((w, ow), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ] + [
        pl.BlockSpec((h, w), lambda i: (0, 0), memory_space=pltpu.VMEM)
        for _ in range(c)
    ]
    out_specs = [
        pl.BlockSpec((TR, ow), lambda i: (i, 0), memory_space=pltpu.VMEM)
        for _ in range(c)
    ]
    outs = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((oh_pad, ow), jnp.uint8) for _ in range(c)],
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
    )(ay, ax.T, *(tex[:, :, ch] for ch in range(c)))
    out = jnp.stack(outs, axis=-1)
    return out[:oh] if oh_pad != oh else out


def _einsum(tex, ay, ax, prec):
    a = jnp.einsum("os,shc->ohc", ay, tex, precision=prec,
                   preferred_element_type=jnp.float32)
    b = jnp.einsum("pt,otc->opc", ax, a, precision=prec,
                   preferred_element_type=jnp.float32)
    return jnp.round(jnp.clip(b, 0.0, 1.0) * 255.0).astype(jnp.uint8)


def _wfloor(tex):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(t_ref, *outs):
        v = (t_ref[0, 0] * 0.0 + 37.0).astype(jnp.int32).astype(jnp.uint8)
        for o in outs:
            o[:] = jnp.full_like(o[:], v)

    TR = 128
    grid = (VH * TR // TR // TR + (1 if (1080 % TR) else 0),)
    oh_pad = ((VH + TR - 1) // TR) * TR
    outs = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((oh_pad, VW), jnp.uint8) for _ in range(C)],
        grid=(oh_pad // TR,),
        in_specs=[pl.BlockSpec((8, 128), lambda i: (0, 0), memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((TR, VW), lambda i: (i, 0), memory_space=pltpu.VMEM)
            for _ in range(C)
        ],
    )(tex[:8, :128, 0])
    return jnp.stack(outs, axis=-1)[:VH]


def main():
    names = sys.argv[1:] or ["v0", "v0x", "vhi", "vlo", "v3p", "v3px", "wfloor"]
    dev = jax.devices()[0]
    print(f"device: {dev} platform={dev.platform}", flush=True)
    ay, ax = axes()
    produce = make_produce()

    variants = {
        "v0": v0,
        "v0x": jax.jit(jax.vmap(lambda f: _pallas_xfirst(f, ay, ax))),
        "vhi": jax.jit(jax.vmap(lambda f: _einsum(f, ay, ax, jax.lax.Precision.HIGH))),
        "vlo": jax.jit(jax.vmap(lambda f: _einsum(f, ay, ax, jax.lax.Precision.DEFAULT))),
        "v3p": jax.jit(jax.vmap(lambda f: _pallas_3pass(f, ay, ax, False))),
        "v3px": jax.jit(jax.vmap(lambda f: _pallas_3pass(f, ay, ax, True))),
        "wfloor": jax.jit(jax.vmap(_wfloor)),
    }

    base = np.asarray(v0(produce()))
    for n in names:
        fn = variants[n]
        try:
            got = np.asarray(fn(produce()))
            # exactness vs v0 on the SAME input requires replays — use a
            # fixed probe input instead:
            probe = jnp.asarray(np.random.default_rng(7).random((B, H, W, C), np.float32))
            a = np.asarray(v0(probe)).astype(np.int32)
            bq = np.asarray(fn(probe)).astype(np.int32)
            d = np.abs(a - bq)
            t = timeit(fn, produce)
            print(
                f"{n}: {t * 1e3:.2f} ms/call {t / B * 1e3:.4f} ms/f  "
                f"maxdiff={d.max()} flips={float((d > 0).mean()):.2e}",
                flush=True,
            )
        except Exception as ex:  # noqa: BLE001
            print(f"{n}: ERROR {type(ex).__name__}: {ex}", flush=True)
    del base


if __name__ == "__main__":
    main()
