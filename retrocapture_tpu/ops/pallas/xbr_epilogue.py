"""Pallas TPU kernel: the xbr-lv2 full-resolution epilogue.

The hand kernel (graph/kernels._xbr_lv2_kernel) reduces xbr-lv2 to a
mid-resolution [oh, w_src] tap/edge section plus a full-resolution
blend; lowered through XLA the blend's ~170 elementwise stages and the
one-hot x-upsample matmul stream >1 GB/frame of intermediates through
HBM. This kernel fuses the whole full-res section into one pass:

* per output tile, each of the 19 mid-res channels (E/H/F/B/D colors
  x255 + the packed flag codes) is NEAREST-upsampled in-register — a
  rotated 128-lane window plus one ``take_along_axis`` per channel (the
  blur_groups window trick; Mosaic gathers are single-vreg along lanes,
  so the source-column span must fit 128 lanes — true for >=2.5x
  upscales);
* the fp ramps are rebuilt from 1D phase vectors in registers;
* flags are decoded and the maximos/mix/c_df blend runs entirely in
  VMEM; HBM sees only the mid-res reads and the final RGB write.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["xbr_epilogue", "xbr_epilogue_fits"]

TX = 128
TY = 8

# vec4 line constants (xbr-lv2.glsl:182-191); XBR_SCALE = 3.0
_AO = np.array([1.0, -1.0, -1.0, 1.0], np.float32)
_BO = np.array([1.0, 1.0, -1.0, -1.0], np.float32)
_CO = np.array([1.5, 0.5, -0.5, 0.5], np.float32)
_AX = np.array([1.0, -1.0, -1.0, 1.0], np.float32)
_BX = np.array([0.5, 2.0, -0.5, -2.0], np.float32)
_CX = np.array([1.0, 1.0, -0.5, 0.0], np.float32)
_AY = np.array([1.0, -1.0, -1.0, 1.0], np.float32)
_BY = np.array([2.0, 0.5, -2.0, -0.5], np.float32)
_CY = np.array([2.0, 0.0, -1.0, 0.5], np.float32)
_D4 = np.full(4, 1.0 / 3.0, np.float32)
_DL = np.array([0.5, 1.0, 0.5, 1.0], np.float32) / 3.0
_DU = np.array([1.0, 0.5, 1.0, 0.5], np.float32) / 3.0


def xbr_epilogue_fits(w: int, ow: int, oh: int) -> bool:
    """The tile's source-column window (TX output px plus the NEAREST
    rounding slack) must fit the 128-lane rotated window."""
    span = TX * (w / ow) + 4
    if span > TX - 8:
        return False
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:  # noqa: BLE001
        return False


def xbr_epilogue(S, bx, fpx, fpy, *, interpret: bool = False):
    """S: [19, oh, w] f32 (E,H,F,B,D x255 + 4 code channels);
    bx: [ow] int source column per output column (clamped);
    fpx: [ow], fpy: [oh] f32 fract phases. Returns [oh, ow, 4] f32."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nch, oh, w = S.shape
    ow = bx.shape[0]
    owp = ((ow + TX - 1) // TX) * TX
    ohp = ((oh + TY - 1) // TY) * TY
    wp = ((w + 2 * TX - 1) // (2 * TX)) * (2 * TX)
    S = jnp.asarray(S, jnp.float32)
    if wp != w or ohp != oh:
        S = jnp.pad(S, ((0, 0), (0, ohp - oh), (0, wp - w)), mode="edge")
    bxp = np.pad(np.asarray(bx, np.int32), (0, owp - ow), mode="edge")
    fpxp = np.pad(np.asarray(fpx, np.float32), (0, owp - ow), mode="edge")
    fpyp = np.pad(np.asarray(fpy, np.float32), (0, ohp - oh), mode="edge")
    bx2 = jnp.asarray(np.broadcast_to(bxp[None, :], (8, owp)))
    fpx2 = jnp.asarray(np.broadcast_to(fpxp[None, :], (8, owp)))
    fpy2 = jnp.asarray(np.broadcast_to(fpyp[:, None], (ohp, TX)))

    def kernel(bx_ref, fpx_ref, fpy_ref, s_ref, r_ref, g_ref, b_ref, a_ref):
        xloc = bx_ref[0:1, :].astype(jnp.int32)  # [1, TX]
        xlo = jnp.min(xloc)
        xs0 = pl.multiple_of((xlo // TX) * TX, TX)
        xs1 = pl.multiple_of(jnp.minimum(xs0 + TX, wp - TX), TX)
        idx = jnp.broadcast_to(jnp.clip(xloc - xlo, 0, TX - 1), (TY, TX))

        def up(ch):
            b0 = s_ref[ch, :, pl.ds(xs0, TX)]
            b1 = s_ref[ch, :, pl.ds(xs1, TX)]
            band = pltpu.roll(
                jnp.concatenate([b0, b1], axis=1), -(xlo - xs0), 1
            )[:, :TX]
            return jnp.take_along_axis(band, idx, axis=1)

        inv = np.float32(1.0 / 255.0)
        E = [up(i) * inv for i in range(3)]
        Hc = [up(3 + i) * inv for i in range(3)]
        Fc = [up(6 + i) * inv for i in range(3)]
        Bc = [up(9 + i) * inv for i in range(3)]
        Dc = [up(12 + i) * inv for i in range(3)]

        fpxv = fpx_ref[0:1, :]  # [1, TX]
        fpyv = fpy_ref[:, 0:1]  # [TY, 1]

        def mixc(a, b, m):
            return [ac + (bc - ac) * m for ac, bc in zip(a, b)]

        maximos = []
        pxs = []
        for ci in range(4):
            code = up(15 + ci)
            edri = jnp.remainder(code, 2.0)
            rr = jnp.floor(code * 0.5)
            edr = jnp.remainder(rr, 2.0)
            rr = jnp.floor(rr * 0.5)
            edrl = jnp.remainder(rr, 2.0)
            rr = jnp.floor(rr * 0.5)
            edru = jnp.remainder(rr, 2.0)
            pxs.append(jnp.floor(rr * 0.5))

            def ramp(A, B, C, d, extra=0.0):
                x = (
                    np.float32(A[ci]) * fpyv
                    + np.float32(B[ci]) * fpxv
                    + np.float32(d[ci] - C[ci] - extra)
                ) * np.float32(1.0 / (2.0 * d[ci]))
                return jnp.clip(x, 0.0, 1.0)

            m = jnp.maximum(
                jnp.maximum(
                    edrl * ramp(_AX, _BX, _CX, _DL),
                    edru * ramp(_AY, _BY, _CY, _DU),
                ),
                jnp.maximum(
                    edr * ramp(_AO, _BO, _CO, _D4),
                    edri * ramp(_AO, _BO, _CO, _D4, extra=0.25),
                ),
            )
            maximos.append(m)

        Tx = mixc(Hc, Fc, pxs[0])
        Tz = mixc(Bc, Dc, pxs[2])
        Ty = mixc(Fc, Bc, pxs[1])
        Tw = mixc(Dc, Hc, pxs[3])
        res1 = mixc(mixc(E, Tx, maximos[0]), Tz, maximos[2])
        res2 = mixc(mixc(E, Ty, maximos[1]), Tw, maximos[3])
        cdf1 = (
            jnp.abs(E[0] - res1[0]) + jnp.abs(E[1] - res1[1]) + jnp.abs(E[2] - res1[2])
        )
        cdf2 = (
            jnp.abs(E[0] - res2[0]) + jnp.abs(E[1] - res2[1]) + jnp.abs(E[2] - res2[2])
        )
        sel = (cdf2 >= cdf1).astype(jnp.float32)
        res = mixc(res1, res2, sel)
        r_ref[:] = res[0]
        g_ref[:] = res[1]
        b_ref[:] = res[2]
        a_ref[:] = jnp.ones((TY, TX), jnp.float32)

    planes = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((ohp, owp), jnp.float32) for _ in range(4)],
        grid=(ohp // TY, owp // TX),
        in_specs=[
            pl.BlockSpec((8, TX), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, TX), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((TY, TX), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (nch, TY, wp), lambda i, j: (0, i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec((TY, TX), lambda i, j: (i, j), memory_space=pltpu.VMEM)
            for _ in range(4)
        ],
        interpret=interpret,
    )(bx2, fpx2, fpy2, S)
    out = jnp.stack(planes, axis=-1)
    if ohp != oh or owp != ow:
        out = out[:oh, :ow]
    return out
