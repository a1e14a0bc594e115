"""Pallas TPU kernel: warped multi-group 5x5 NEAREST-tap blur.

The crt-mattias fragment (and the crt-geom blur family) evaluates many
Gaussian-weighted NEAREST texture taps around per-group warped bases:

    out_g = sum_ij W[j][i] * tex[ch_g](base_uv + group_off_g + (xo_i, yo_j))

Round 1 lowered each of the 225 taps as an independent banded sample —
278 ms/frame at 1080p (BENCH_r01). This kernel shares everything that
can be shared: the warped base grid rides in once, the texture stays
VMEM-resident for the whole grid, each (8 x 512)-pixel tile slices
per-group row bands, and each tap's texel fetch is a hardware
dynamic-gather along lanes (one instruction per 128 pixels fetches the
whole KB-row column). The 5x5 weight matrix is applied as a rank-2 SVD
(its rows are an outer product up to ~1e-4 — the residual is below the
RGBA8 quantization floor), so the y-dimension needs two weighted
one-hot blends instead of five.

Exactness: x uses two 128-aligned static bands per TX-pixel output row
(spanning at most two aligned bands whenever TX*w/wo + spread <= XB —
enforced by ``blur_groups_fits``);
y uses a per-(row, group) dynamic band of KB rows with in-band masks.
Taps are clamp_to_edge-wrapped (the preset family's wrap mode).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["blur5x5_groups", "blur_groups_fits", "BlurGroup"]

TX = 512
TY = 8
XB = 128
KB = 16
_VMEM_TEX_BYTES = 6 * 2**20


class BlurGroup:
    """One blur() call: texture channel, base uv offset, per-tap texel
    offsets (5 x, 5 y) and the 5x5 weight matrix (row-major [j][i])."""

    __slots__ = ("channel", "bx", "by", "xo", "yo", "weights")

    def __init__(self, channel, bx, by, xo, yo, weights):
        self.channel = int(channel)
        self.bx = float(bx)
        self.by = float(by)
        self.xo = tuple(float(x) for x in xo)  # uv units
        self.yo = tuple(float(y) for y in yo)
        self.weights = np.asarray(weights, np.float64)  # [5j, 5i]


def _rank2(weights):
    """Rank-2 SVD factors (a1, b1, a2, b2) with out ~ sum_m b_m ⊗ a_m;
    returns (factors, residual_max)."""
    u, s, vt = np.linalg.svd(weights)
    w2 = s[0] * np.outer(u[:, 0], vt[0]) + s[1] * np.outer(u[:, 1], vt[1])
    resid = float(np.abs(weights - w2).max())
    facs = []
    for m in range(2):
        facs.append(
            (
                (s[m] ** 0.5 * vt[m]).astype(np.float32),  # x coefs [5i]
                (s[m] ** 0.5 * u[:, m]).astype(np.float32),  # y coefs [5j]
            )
        )
    return facs, resid


def blur_groups_fits(tex_shape, out_shape, groups) -> bool:
    """Static feasibility: VMEM-resident texture, tap spread within the
    two-aligned-band x guarantee and the KB-row y band."""
    h, w, c = tex_shape
    oh, ow = out_shape
    hp = ((h + 7) // 8) * 8
    wp = ((w + XB - 1) // XB) * XB
    if hp * wp * c * 4 > _VMEM_TEX_BYTES:
        return False
    # x: a row tile's source extent + tap spread must fit two aligned
    # bands (one shared band pair per TX-pixel output row)
    xs_spread = max(
        abs(g.bx + xo) * w for g in groups for xo in g.xo
    ) * 2 + 2
    if TX * (w / ow) + xs_spread > XB:
        return False
    # y: per-(row, group) band must cover tap window + row bend; allow
    # half of KB for the (statically unknown) warp bend.
    ys_spread = max(
        (max(g.yo) - min(g.yo)) * h for g in groups
    ) + 3
    if ys_spread > KB - KB // 2:
        return False
    try:
        platform = jax.devices()[0].platform
    except Exception:  # noqa: BLE001
        return False
    return platform in ("tpu", "axon")


def blur5x5_groups(tex, u, v, groups, *, interpret: bool = False):
    """tex [H, W, C] f32 (pre-gamma'd values), u/v [HO, WO] base warp →
    list of per-group [HO, WO] f32 planes."""
    h, w, c = tex.shape
    u = jnp.asarray(u, jnp.float32)
    v = jnp.asarray(v, jnp.float32)
    ho, wo = u.shape
    ng = len(groups)

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    hp = max(((h + 7) // 8) * 8, KB)
    wp = max(((w + XB - 1) // XB) * XB, 2 * XB)
    tex3 = jnp.transpose(tex.astype(jnp.float32), (0, 2, 1))  # [H, C, W]
    if hp != h or wp != w:
        tex3 = jnp.pad(tex3, ((0, hp - h), (0, 0), (0, wp - w)), mode="edge")

    wop = ((wo + TX - 1) // TX) * TX
    hop = ((ho + TY - 1) // TY) * TY
    if wop != wo or hop != ho:
        u = jnp.pad(u, ((0, hop - ho), (0, wop - wo)), mode="edge")
        v = jnp.pad(v, ((0, hop - ho), (0, wop - wo)), mode="edge")

    # Static per-group tap constants, mirroring the evaluator's f32 op
    # order ((uv + base) + offset) * size.
    gconst = []
    for g in groups:
        facs, _ = _rank2(g.weights)
        gconst.append(
            {
                "ch": g.channel,
                "bx": np.float32(g.bx),
                "by": np.float32(g.by),
                "xo": [np.float32(x) for x in g.xo],
                "yo": [np.float32(y) for y in g.yo],
                "facs": facs,
            }
        )

    def kernel(u_ref, v_ref, tex_ref, *out_refs):
        ioty = jax.lax.broadcasted_iota(jnp.int32, (KB, TX), 0)

        def gather_x(band, li):
            """band [KB, XB=128]; li [1, TX] in [0, XB) → [KB, TX]."""
            cols = []
            for jj in range(TX // XB):
                idx = jnp.broadcast_to(li[:, jj * XB : (jj + 1) * XB], (KB, XB))
                cols.append(jnp.take_along_axis(band, idx, axis=1))
            return jnp.concatenate(cols, axis=1)

        def row_body(r, _):
            uu = u_ref[pl.ds(r, 1), :].astype(jnp.float32)
            vv = v_ref[pl.ds(r, 1), :].astype(jnp.float32)
            for gi, gc in enumerate(gconst):
                ug = uu + gc["bx"]
                vg = vv + gc["by"]
                tx = [
                    jnp.clip(
                        jnp.floor((ug + xo) * np.float32(w)).astype(jnp.int32),
                        0,
                        w - 1,
                    )
                    for xo in gc["xo"]
                ]
                ty = [
                    jnp.clip(
                        jnp.floor((vg + yo) * np.float32(h)).astype(jnp.int32),
                        0,
                        h - 1,
                    )
                    for yo in gc["yo"]
                ]
                ys = jnp.clip(jnp.min(ty[0]), 0, hp - KB)
                xmin = jnp.min(tx[0])
                xs0 = pl.multiple_of((xmin // XB) * XB, XB)
                xs1 = pl.multiple_of(jnp.minimum(xs0 + XB, wp - XB), XB)
                band0 = tex_ref[pl.ds(ys, KB), gc["ch"], pl.ds(xs0, XB)]
                band1 = tex_ref[pl.ds(ys, KB), gc["ch"], pl.ds(xs1, XB)]

                # x-resolved columns per x-tap (full KB-row window)
                z = []
                for ti in tx:
                    in0 = ti < xs0 + XB
                    g0 = gather_x(band0, jnp.clip(ti - xs0, 0, XB - 1))
                    g1 = gather_x(band1, jnp.clip(ti - xs1, 0, XB - 1))
                    z.append(jnp.where(in0, g0, g1))

                # rank-2 of the 5x5 weights: two x-combos, two weighted
                # y one-hot blends
                acc = None
                for ax, ay in gc["facs"]:
                    zx = None
                    for i in range(5):
                        t = z[i] * ax[i]
                        zx = t if zx is None else zx + t
                    oy = None
                    for j in range(5):
                        m = (ioty + ys == ty[j]).astype(jnp.float32) * ay[j]
                        oy = m if oy is None else oy + m
                    s = jnp.sum(oy * zx, axis=0, keepdims=True)
                    acc = s if acc is None else acc + s
                out_refs[gi][pl.ds(r, 1), :] = acc
            return 0

        # dynamic row loop: keeps the kernel's code size at 1 row x
        # n-groups (a fully unrolled 8x9 body took Mosaic minutes)
        jax.lax.fori_loop(0, TY, row_body, 0)

    planes = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((hop, wop), jnp.float32) for _ in range(ng)],
        grid=(hop // TY, wop // TX),
        in_specs=[
            pl.BlockSpec((TY, TX), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((TY, TX), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((hp, c, wp), lambda i, j: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TY, TX), lambda i, j: (i, j), memory_space=pltpu.VMEM)
            for _ in range(ng)
        ],
        interpret=interpret,
    )(u, v, tex3)
    if wop != wo or hop != ho:
        planes = [p[:ho, :wo] for p in planes]
    return planes
