"""Pallas TPU kernel: fused separable resample + uint8 pack.

The viewport blit is the bandwidth-dominant tensor of the whole chain at
1080p output. XLA's lowering materializes the row-resampled f32
intermediate and the full f32 output before the uint8 cast; this kernel
keeps everything in VMEM per output-row tile — row matmul (MXU), column
matmul (MXU), quantize — and writes ONLY final uint8 planes to HBM:

    out[y, x, c] = u8( clip( Σ_s Σ_t ay[y,s] · tex[s,t,c] · ax[x,t] ) )

Channels ride as separate [H, W] planes (Mosaic has no in-register
[T, W*C]→[T, W, C] reshape), outputs as uint8 planes stacked by the
wrapper. Grid over OH tiles of 32 rows (uint8 sublane tiling). Falls
back to the einsum path off-TPU or when the working set exceeds VMEM.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

__all__ = ["resample_u8", "pallas_available"]

_TILE_ROWS = 32  # uint8 min sublane tile


def _make_kernel(c: int):
    def kernel(*refs):
        ay_ref = refs[0]
        axt_ref = refs[1]
        tex_refs = refs[2 : 2 + c]
        out_refs = refs[2 + c :]
        ay = ay_ref[:]  # [T, H]
        axt = axt_ref[:]  # [W, OW]
        for ch in range(c):
            a = jnp.dot(ay, tex_refs[ch][:], preferred_element_type=jnp.float32)
            b = jnp.dot(a, axt, preferred_element_type=jnp.float32)
            # Mosaic has no f32->u8 cast; round-trip through int32.
            q = jnp.round(jnp.clip(b, 0.0, 1.0) * 255.0).astype(jnp.int32)
            out_refs[ch][:] = q.astype(jnp.uint8)

    return kernel


def pallas_available() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:  # noqa: BLE001
        return False


def _einsum_fallback(tex, ay, ax):
    th = jnp.einsum("os,shc->ohc", ay, tex, preferred_element_type=jnp.float32)
    out = jnp.einsum("pt,otc->opc", ax, th, preferred_element_type=jnp.float32)
    return jnp.round(jnp.clip(out, 0.0, 1.0) * 255.0).astype(jnp.uint8)


def resample_u8(tex: jax.Array, ay, ax, *, force_pallas: bool = False) -> jax.Array:
    """tex [H, W, C] f32, ay [OH, H], ax [OW, W] → uint8 [OH, OW, C]."""
    ay = jnp.asarray(ay, jnp.float32)
    ax = jnp.asarray(ax, jnp.float32)
    h, w, c = tex.shape
    oh, ow = ay.shape[0], ax.shape[0]
    vmem_bytes = (h * w * c + w * ow + _TILE_ROWS * (h + ow * c)) * 4
    if not force_pallas and (not pallas_available() or vmem_bytes > 12 * 2**20):
        return _einsum_fallback(tex, ay, ax)

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    oh_pad = ((oh + _TILE_ROWS - 1) // _TILE_ROWS) * _TILE_ROWS
    if oh_pad != oh:
        ay = jnp.pad(ay, ((0, oh_pad - oh), (0, 0)))
    axt = ax.T  # [W, OW]
    planes = [tex[:, :, ch] for ch in range(c)]

    outs = pl.pallas_call(
        _make_kernel(c),
        out_shape=[jax.ShapeDtypeStruct((oh_pad, ow), jnp.uint8) for _ in range(c)],
        grid=(oh_pad // _TILE_ROWS,),
        in_specs=[
            pl.BlockSpec((_TILE_ROWS, h), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((w, ow), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ]
        + [
            pl.BlockSpec((h, w), lambda i: (0, 0), memory_space=pltpu.VMEM)
            for _ in range(c)
        ],
        out_specs=[
            pl.BlockSpec((_TILE_ROWS, ow), lambda i: (i, 0), memory_space=pltpu.VMEM)
            for _ in range(c)
        ],
    )(ay, axt, *planes)
    out = jnp.stack(outs, axis=-1)
    return out[:oh] if oh_pad != oh else out
