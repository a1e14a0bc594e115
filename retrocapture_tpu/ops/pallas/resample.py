"""Pallas TPU kernel: fused separable resample + uint8 pack.

The viewport blit is the bandwidth-dominant tensor of the whole chain at
1080p output. XLA's lowering materializes the row-resampled f32
intermediate and the full f32 output before the uint8 cast; this kernel
keeps everything in VMEM per output-row tile — row matmul (MXU), column
matmul (MXU), quantize — and writes ONLY final uint8 planes to HBM:

    out[y, x, c] = u8( clip( Σ_s Σ_t ay[y,s] · tex[s,t,c] · ax[x,t] ) )

Channels ride as separate [H, W] planes (Mosaic has no in-register
[T, W*C]→[T, W, C] reshape), outputs as uint8 planes stacked by the
wrapper. Grid over OH tiles of 32 rows (uint8 sublane tiling).

Identity axes skip their matmul entirely (`blit_u8`): a same-size LINEAR
blit axis has exact {1, 0} diagonal weights, and the dense [n, n] einsum
it would otherwise build is pure waste (the ntsc chain's final blit paid
a 1080x1080 y-matmul — 8.9 GFLOP/frame of multiply-by-one).

The in-kernel dots run at native f32 MXU precision — no bf16 rounding of
the blit weights (XLA's default-precision einsum is a 1-pass bf16
emulation, ~0.2% weight error → ±2 u8 steps on the output).

Falls back to the einsum path off-TPU or when the working set exceeds
the (raised) VMEM budget.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["resample_u8", "blit_u8", "pallas_available"]

_TILE_ROWS = 128  # full MXU M-dim; u8 sublane tiling needs multiples of 32
_VMEM_LIMIT = 64 * 2**20  # raised Mosaic scoped-VMEM budget (v5e: 128 MB)


def _quant(b):
    # Mosaic has no f32->u8 cast; round-trip through int32.
    q = jnp.round(jnp.clip(b, 0.0, 1.0) * 255.0).astype(jnp.int32)
    return q.astype(jnp.uint8)


def _make_kernel_both(c: int):
    def kernel(*refs):
        ay = refs[0][:]  # [T, H]
        axt = refs[1][:]  # [W, OW]
        tex_refs = refs[2 : 2 + c]
        out_refs = refs[2 + c :]
        for ch in range(c):
            a = jnp.dot(ay, tex_refs[ch][:], preferred_element_type=jnp.float32)
            b = jnp.dot(a, axt, preferred_element_type=jnp.float32)
            out_refs[ch][:] = _quant(b)

    return kernel


def _make_kernel_x(c: int):
    def kernel(*refs):
        axt = refs[0][:]  # [W, OW]
        tex_refs = refs[1 : 1 + c]
        out_refs = refs[1 + c :]
        for ch in range(c):
            b = jnp.dot(tex_refs[ch][:], axt, preferred_element_type=jnp.float32)
            out_refs[ch][:] = _quant(b)

    return kernel


def _make_kernel_y(c: int):
    def kernel(*refs):
        ay = refs[0][:]  # [T, H]
        tex_refs = refs[1 : 1 + c]
        out_refs = refs[1 + c :]
        for ch in range(c):
            b = jnp.dot(ay, tex_refs[ch][:], preferred_element_type=jnp.float32)
            out_refs[ch][:] = _quant(b)

    return kernel


def _make_kernel_none(c: int):
    def kernel(*refs):
        tex_refs = refs[:c]
        out_refs = refs[c:]
        for ch in range(c):
            out_refs[ch][:] = _quant(tex_refs[ch][:])

    return kernel


def pallas_available() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:  # noqa: BLE001
        return False


def _einsum_fallback(tex, ay, ax):
    hi = jax.lax.Precision.HIGH
    if ay is not None:
        tex = jnp.einsum(
            "os,shc->ohc", ay, tex, preferred_element_type=jnp.float32, precision=hi
        )
    if ax is not None:
        tex = jnp.einsum(
            "pt,otc->opc", ax, tex, preferred_element_type=jnp.float32, precision=hi
        )
    return jnp.round(jnp.clip(tex, 0.0, 1.0) * 255.0).astype(jnp.uint8)


def resample_u8(
    tex: jax.Array, ay, ax, *, force_pallas: bool = False
) -> jax.Array:
    """tex [H, W, C] f32, ay [OH, H] | None (identity), ax [OW, W] | None
    → uint8 [OH, OW, C]. None axes skip their matmul."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    h, w, c = tex.shape
    ay = None if ay is None else jnp.asarray(ay, jnp.float32)
    ax = None if ax is None else jnp.asarray(ax, jnp.float32)
    oh = h if ay is None else ay.shape[0]
    ow = w if ax is None else ax.shape[0]

    # VMEM working set: resident per-channel tex planes (+double buffer
    # across a batch grid), the axt panel, and per-tile operands.
    tex_bytes = h * w * c * 4
    vmem_bytes = 2 * tex_bytes + (0 if ax is None else w * ow * 4) + _TILE_ROWS * (
        h + ow * c
    ) * 4
    if not force_pallas and (
        not pallas_available() or vmem_bytes > _VMEM_LIMIT - 8 * 2**20
    ):
        return _einsum_fallback(tex, ay, ax)

    oh_pad = ((oh + _TILE_ROWS - 1) // _TILE_ROWS) * _TILE_ROWS
    planes = [tex[:, :, ch] for ch in range(c)]
    params = pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)
    grid = (oh_pad // _TILE_ROWS,)
    out_specs = [
        pl.BlockSpec((_TILE_ROWS, ow), lambda i: (i, 0), memory_space=pltpu.VMEM)
        for _ in range(c)
    ]
    out_shape = [jax.ShapeDtypeStruct((oh_pad, ow), jnp.uint8) for _ in range(c)]

    if ay is not None and oh_pad != oh:
        ay = jnp.pad(ay, ((0, oh_pad - oh), (0, 0)))

    if ay is not None and ax is not None:
        kern = _make_kernel_both(c)
        in_specs = [
            pl.BlockSpec((_TILE_ROWS, h), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((w, ow), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ] + [
            pl.BlockSpec((h, w), lambda i: (0, 0), memory_space=pltpu.VMEM)
            for _ in range(c)
        ]
        args = (ay, ax.T, *planes)
    elif ax is not None:
        # y identity: tex rows tile directly with the output rows.
        if oh_pad != oh:
            planes = [jnp.pad(p, ((0, oh_pad - oh), (0, 0))) for p in planes]
        kern = _make_kernel_x(c)
        in_specs = [
            pl.BlockSpec((w, ow), lambda i: (0, 0), memory_space=pltpu.VMEM)
        ] + [
            pl.BlockSpec((_TILE_ROWS, w), lambda i: (i, 0), memory_space=pltpu.VMEM)
            for _ in range(c)
        ]
        args = (ax.T, *planes)
    elif ay is not None:
        kern = _make_kernel_y(c)
        in_specs = [
            pl.BlockSpec((_TILE_ROWS, h), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ] + [
            pl.BlockSpec((h, w), lambda i: (0, 0), memory_space=pltpu.VMEM)
            for _ in range(c)
        ]
        args = (ay, *planes)
    else:
        if oh_pad != oh:
            planes = [jnp.pad(p, ((0, oh_pad - oh), (0, 0))) for p in planes]
        kern = _make_kernel_none(c)
        in_specs = [
            pl.BlockSpec((_TILE_ROWS, w), lambda i: (i, 0), memory_space=pltpu.VMEM)
            for _ in range(c)
        ]
        args = tuple(planes)

    outs = pl.pallas_call(
        kern,
        out_shape=out_shape,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        compiler_params=params,
    )(*args)
    out = jnp.stack(outs, axis=-1)
    return out[:oh] if oh_pad != oh else out


def blit_u8(tex: jax.Array, vw: int, vh: int) -> jax.Array:
    """Final viewport blit (LINEAR, clamp_to_edge) fused with the uint8
    pack: tex [H, W, C] f32 → u8 [vh, vw, C]. Identity axes skip their
    matmul (OpenGLRenderer::renderTexture's stretch, the RGBA8 readback
    product — PBOManager.cpp:86-170)."""
    from retrocapture_tpu.ops.sampling import _axis_is_identity, _axis_matrix_device

    h, w, _ = tex.shape
    u_row = ((np.arange(vw, dtype=np.float64) + 0.5) / np.float64(vw)).astype(
        np.float32
    )
    v_col = ((np.arange(vh, dtype=np.float64) + 0.5) / np.float64(vh)).astype(
        np.float32
    )
    ax = (
        None
        if _axis_is_identity(u_row, w, True, "clamp_to_edge")
        else _axis_matrix_device(u_row, w, True, "clamp_to_edge")
    )
    ay = (
        None
        if _axis_is_identity(v_col, h, True, "clamp_to_edge")
        else _axis_matrix_device(v_col, h, True, "clamp_to_edge")
    )
    return resample_u8(tex, ay, ax)
