"""Pallas TPU kernel: gather-free 2-D warped texture sampling.

The TPU-native formulation of the warped ``texture()`` tap that the
reference gets from the GL rasterizer's texture units
(ShaderEngine::renderMultipassPass dispatch, ShaderEngine.cpp:850-1475):
the source texture rides VMEM for the whole grid (constant-index block,
loaded once), each (8 x 512)-pixel output tile slices a small
(KB x XB) band of it, builds the 1/2-hot tap-weight matrices in VMEM
registers (never HBM — the round-1 banded path materialized HO*WO*W
weights through HBM, ~2.6 GB per tap at 1080p), contracts them on the
MXU, and accumulates per-channel [TY, TX] planes.

Exactness: taps are wrapped into [0, n) first (all four GL wrap modes),
then a dynamic while loop walks the XB/KB-aligned sub-bands covering
the tile's actual index range; every tap contributes exactly once,
gated by an in-band mask. Smooth warps (CRT curvature) take one
iteration; violent warps take more but never clamp silently. NEAREST
taps are bit-exact (one-hot weights; HIGH-precision bf16x3 products
reconstruct f32 values exactly); LINEAR taps are within ~1e-7.

Layout: output pixels ride [TY=8 sublanes, TX=512 lanes]; the texture
is pre-transposed to [H, C, W] so a band slice reshapes to a
[KB*C, XB] matmul operand without relayout.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["warp_sample_pallas", "warp_sample_available"]

TX = 512  # output pixels per tile row (lane dim)
TY = 8  # output rows per tile (sublane dim)
XB = 128  # x sub-band width (MXU contraction dim, 128-aligned)
KB = 8  # y sub-band rows
_MAX_CH = 4
_VMEM_TEX_BYTES = 6 * 2**20  # resident-texture budget


def _padded_hw(h: int, w: int) -> tuple[int, int]:
    return ((h + KB - 1) // KB) * KB, ((w + XB - 1) // XB) * XB


def warp_sample_available(tex, out_shape) -> bool:
    try:
        h, w, c = tex.shape
    except (AttributeError, ValueError):
        return False
    if c > _MAX_CH:
        return False
    hp, wp = _padded_hw(h, w)
    if hp * wp * c * 4 > _VMEM_TEX_BYTES:
        return False  # texture won't stay VMEM-resident
    try:
        platform = jax.devices()[0].platform
    except Exception:  # noqa: BLE001
        return False
    return platform in ("tpu", "axon")


def _wrap_idx_inkernel(idx, n: int, mode: str):
    """Wrapped indices in [0, n) + validity weight (border)."""
    if mode == "repeat":
        return idx % n, None
    if mode == "mirrored_repeat":
        m = idx % (2 * n)
        return jnp.where(m < n, m, 2 * n - 1 - m), None
    if mode == "clamp_to_border":
        valid = ((idx >= 0) & (idx < n)).astype(jnp.float32)
        return jnp.clip(idx, 0, n - 1), valid
    return jnp.clip(idx, 0, n - 1), None  # clamp_to_edge


def _axis_taps(coord, n: int, filter_linear: bool, mode: str):
    """[(wrapped_idx, weight)] per tap for one axis; coord is the
    un-normalized texel-space coordinate array."""
    if filter_linear:
        x = coord - 0.5
        x0f = jnp.floor(x)
        f = (x - x0f).astype(jnp.float32)
        x0 = x0f.astype(jnp.int32)
        i0, v0 = _wrap_idx_inkernel(x0, n, mode)
        i1, v1 = _wrap_idx_inkernel(x0 + 1, n, mode)
        w0 = 1.0 - f
        w1 = f
        if v0 is not None:
            w0 = w0 * v0
        if v1 is not None:
            w1 = w1 * v1
        return ((i0, w0), (i1, w1))
    i0, v0 = _wrap_idx_inkernel(jnp.floor(coord).astype(jnp.int32), n, mode)
    w0 = jnp.ones(i0.shape, jnp.float32)
    if v0 is not None:
        w0 = w0 * v0
    return ((i0, w0),)


def _make_kernel(h: int, w: int, hp: int, wp: int, c: int, filter_linear: bool, wrap_mode: str):
    from jax.experimental import pallas as pl

    def kernel(u_ref, v_ref, tex_ref, *out_refs):
        uu = u_ref[:].astype(jnp.float32) * np.float32(w)  # [TY, TX]
        vv = v_ref[:].astype(jnp.float32) * np.float32(h)
        xtaps = _axis_taps(uu, w, filter_linear, wrap_mode)
        ytaps = _axis_taps(vv, h, filter_linear, wrap_mode)

        # Tile-wide index ranges in units of aligned sub-bands: aligned
        # disjoint bands mean every tap lands in exactly one band and
        # Mosaic can prove the lane-dim slice offset divisible by 128.
        xlo = functools.reduce(jnp.minimum, [jnp.min(t) for t, _ in xtaps]) // XB
        xhi = functools.reduce(jnp.maximum, [jnp.max(t) for t, _ in xtaps]) // XB
        ylo = functools.reduce(jnp.minimum, [jnp.min(t) for t, _ in ytaps]) // KB
        yhi = functools.reduce(jnp.maximum, [jnp.max(t) for t, _ in ytaps]) // KB
        n_x = xhi - xlo + 1
        n_y = yhi - ylo + 1

        ioty = jax.lax.broadcasted_iota(jnp.int32, (KB, TX), 0)

        def gather_x(bt, li):
            """bt [KB*c, XB=128]; li [1, TX] lane indices in [0, XB) →
            [KB*c, TX] where out[s, p] = bt[s, li[p]] — the hardware
            dynamic-gather along lanes, 128 pixels per instruction."""
            cols = []
            for j in range(TX // XB):
                idx = jnp.broadcast_to(li[:, j * XB : (j + 1) * XB], (KB * c, XB))
                cols.append(jnp.take_along_axis(bt, idx, axis=1))
            return jnp.concatenate(cols, axis=1)

        def body(carry):
            it, accs = carry
            ys = pl.multiple_of((ylo + it // n_x) * KB, KB)
            xs = pl.multiple_of((xlo + it % n_x) * XB, XB)
            band = tex_ref[pl.ds(ys, KB), :, pl.ds(xs, XB)]  # VMEM slice
            bt = band.reshape(KB * c, XB)

            rows = []
            for r in range(TY):
                def row_contrib(r=r):
                    # x taps: one lane-gather per 128 pixels fetches
                    # the whole (KB rows x c channels) column; in-band
                    # masks fold into the per-pixel weights.
                    zx = None
                    for ti, wt in xtaps:
                        tr = ti[r : r + 1, :]
                        wm = wt[r : r + 1, :] * (
                            (tr >= xs) & (tr < xs + XB)
                        ).astype(jnp.float32)
                        g = gather_x(bt, jnp.clip(tr - xs, 0, XB - 1))
                        zx = g * wm if zx is None else zx + g * wm
                    # y taps: KB-row one-hot blend (KB x TX — cheap)
                    oyT = jnp.zeros((KB, TX), jnp.float32)
                    for ti, wt in ytaps:
                        tr = ti[r : r + 1, :]
                        m = (ioty + ys == tr) & (tr >= ys) & (tr < ys + KB)
                        oyT = oyT + m.astype(jnp.float32) * wt[r : r + 1, :]
                    z3 = zx.reshape(KB, c, TX)
                    return [
                        jnp.sum(oyT * z3[:, ch, :], axis=0, keepdims=True)
                        for ch in range(c)
                    ]

                # Skip the gathers entirely when none of this row's taps
                # touch the current sub-band (common once the tile range
                # spans several bands).
                touch_y = jnp.zeros((), jnp.bool_)
                touch_x = jnp.zeros((), jnp.bool_)
                for ti, _ in ytaps:
                    tr = ti[r : r + 1, :]
                    touch_y = touch_y | jnp.any((tr >= ys) & (tr < ys + KB))
                for ti, _ in xtaps:
                    tr = ti[r : r + 1, :]
                    touch_x = touch_x | jnp.any((tr >= xs) & (tr < xs + XB))
                rows.append(
                    jax.lax.cond(
                        touch_y & touch_x,
                        row_contrib,
                        lambda: [jnp.zeros((1, TX), jnp.float32) for _ in range(c)],
                    )
                )
            block = tuple(
                jnp.concatenate([rows[r][ch] for r in range(TY)], axis=0)
                for ch in range(c)
            )
            return (it + 1, tuple(a + b for a, b in zip(accs, block)))

        acc0 = tuple(jnp.zeros((TY, TX), jnp.float32) for _ in range(c))
        _, accs = jax.lax.while_loop(
            lambda cr: cr[0] < n_x * n_y, body, (jnp.int32(0), acc0)
        )
        for ch in range(c):
            out_refs[ch][:] = accs[ch]

    return kernel


from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402


def warp_sample_pallas(
    tex: jax.Array,
    u,
    v,
    *,
    filter_linear: bool,
    wrap_mode: str = "clamp_to_edge",
    interpret: bool = False,
) -> jax.Array:
    """tex [H, W, C] f32, u/v [HO, WO] normalized coords (traced or
    concrete) → [HO, WO, C] samples with GL semantics.

    vmap-native: batching `tex` with shared u/v (the per-frame Qfine
    textures of the mattias preconv blur) lowers to ONE Mosaic program
    with the batch as the outermost grid dimension — the texture block
    re-DMAs only when the batch index advances — instead of jax's
    generic pallas batching rule."""
    h, w, c = tex.shape
    u = jnp.asarray(u, jnp.float32)
    v = jnp.asarray(v, jnp.float32)

    @jax.custom_batching.custom_vmap
    def run(tex_, u_, v_):
        return _warp_sample_call(
            tex_, u_, v_, filter_linear, wrap_mode, interpret, batch=None
        )

    @run.def_vmap
    def _rule(axis_size, in_batched, tex_, u_, v_):  # noqa: ANN001
        tex_b, u_b, v_b = in_batched
        if tex_b and not u_b and not v_b:
            out = _warp_sample_call(
                tex_, u_, v_, filter_linear, wrap_mode, interpret,
                batch=axis_size,
            )
            return out, True
        out = jax.lax.map(
            lambda args: run(
                args[0] if tex_b else tex_,
                args[1] if u_b else u_,
                args[2] if v_b else v_,
            ),
            (
                tex_ if tex_b else jnp.zeros((axis_size,)),
                u_ if u_b else jnp.zeros((axis_size,)),
                v_ if v_b else jnp.zeros((axis_size,)),
            ),
        )
        return out, True

    return run(tex, u, v)


def _warp_sample_call(
    tex, u, v, filter_linear, wrap_mode, interpret, batch
):
    """Build and invoke the Mosaic program. `batch=None`: tex [H, W, C]
    → [HO, WO, C]; `batch=B`: tex [B, H, W, C] → [B, HO, WO, C]."""
    if batch is None:
        h, w, c = tex.shape
    else:
        _, h, w, c = tex.shape
    ho, wo = u.shape

    hp, wp = _padded_hw(h, w)
    if batch is None:
        tex3 = jnp.transpose(tex.astype(jnp.float32), (0, 2, 1))  # [H, C, W]
        if hp != h or wp != w:
            # edge-pad: wrapped indices never exceed [0, n), so padded
            # texels get zero tap weight; padding only squares up the
            # sub-band grid.
            tex3 = jnp.pad(tex3, ((0, hp - h), (0, 0), (0, wp - w)), mode="edge")
    else:
        tex3 = jnp.transpose(tex.astype(jnp.float32), (0, 1, 3, 2))  # [B,H,C,W]
        if hp != h or wp != w:
            tex3 = jnp.pad(
                tex3, ((0, 0), (0, hp - h), (0, 0), (0, wp - w)), mode="edge"
            )

    wop = ((wo + TX - 1) // TX) * TX
    hop = ((ho + TY - 1) // TY) * TY
    if wop != wo or hop != ho:
        u = jnp.pad(u, ((0, hop - ho), (0, wop - wo)), mode="edge")
        v = jnp.pad(v, ((0, hop - ho), (0, wop - wo)), mode="edge")

    kern = _make_kernel(h, w, hp, wp, c, filter_linear, wrap_mode)
    if batch is None:
        grid = (hop // TY, wop // TX)
        uv_spec = pl.BlockSpec((TY, TX), lambda i, j: (i, j), memory_space=pltpu.VMEM)
        tex_spec = pl.BlockSpec(
            # constant index: the texture is fetched into VMEM once and
            # stays resident across every grid step
            (hp, c, wp), lambda i, j: (0, 0, 0), memory_space=pltpu.VMEM
        )
        out_spec = pl.BlockSpec((TY, TX), lambda i, j: (i, j), memory_space=pltpu.VMEM)
        out_shape = [jax.ShapeDtypeStruct((hop, wop), jnp.float32) for _ in range(c)]
    else:
        grid = (batch, hop // TY, wop // TX)
        uv_spec = pl.BlockSpec(
            (TY, TX), lambda b, i, j: (i, j), memory_space=pltpu.VMEM
        )
        tex_spec = pl.BlockSpec(
            (None, hp, c, wp), lambda b, i, j: (b, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        out_spec = pl.BlockSpec(
            (None, TY, TX), lambda b, i, j: (b, i, j), memory_space=pltpu.VMEM
        )
        out_shape = [
            jax.ShapeDtypeStruct((batch, hop, wop), jnp.float32) for _ in range(c)
        ]
    # The resident texture block can reach ~12 MB (mattias Qfine
    # pre-convolutions); with Mosaic's block double-buffering across the
    # batch grid dimension that exceeds the default 16 MB scoped-VMEM
    # budget, so raise the limit explicitly (v5e VMEM is 128 MB).
    tex_bytes = hp * wp * c * 4
    limit = min(2 * tex_bytes + 8 * 2**20, 100 * 2**20)
    params = pltpu.CompilerParams(vmem_limit_bytes=max(limit, 32 * 2**20))
    planes = pl.pallas_call(
        kern,
        out_shape=out_shape,
        grid=grid,
        in_specs=[uv_spec, uv_spec, tex_spec],
        out_specs=[out_spec for _ in range(c)],
        interpret=interpret,
        compiler_params=params,
    )(u, v, tex3)
    out = jnp.stack(planes, axis=-1)
    if wop != wo or hop != ho:
        out = out[..., :ho, :wo, :]
    return out.astype(tex.dtype)
