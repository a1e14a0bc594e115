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

import os

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


def _xphase_plan(ax_np: np.ndarray, w: int, ow: int):
    """Detect the integer-upscale phase structure of a LINEAR x-axis
    resampling matrix: ow == r*w and every output column X = r*k + p
    reads source texels {k + d_p, k + d_p + 1} (post-clamp). Returns
    (r, d [r] of {-1, 0}, w0 [r, w], w1 [r, w]) with the matrix's OWN
    per-column weights (they wobble in the last ulps across k from the
    f32 u-coordinate rounding, so they ride as vectors, not scalars),
    or None when the structure doesn't hold.

    The final 1080p blit is the bandwidth/FLOP-dominant tensor of most
    chains, and its dense [w, ow] matmul costs inner-dim*ow MXU work
    for what is a 2-tap FMA per output pixel: the phase form cuts the
    x-resample from ~9 GFLOP/frame (640->1920, 3ch) to ~0.05."""
    if w < 2 or ow % w != 0:
        return None
    r = ow // w
    if r < 2:
        return None
    d = []
    w0 = np.zeros((r, w), np.float32)
    w1 = np.zeros((r, w), np.float32)
    for p in range(r):
        rows = ax_np[p::r]  # [w, w]
        # Phase tap offset from an interior row.
        ki = min(max(2, w // 2), w - 2)
        nz = np.nonzero(rows[ki])[0]
        if len(nz) == 0 or len(nz) > 2:
            return None
        dp = int(nz[0] - ki)
        if dp not in (-1, 0):
            return None
        d.append(dp)
        for k in range(w):
            j0 = min(max(k + dp, 0), w - 1)
            j1 = min(max(k + dp + 1, 0), w - 1)
            nzk = np.nonzero(rows[k])[0]
            if not set(nzk.tolist()) <= {j0, j1}:
                return None
            if j0 == j1:
                # Both taps clamp to the same texel: matrix accumulated
                # w0+w1 there; split as (sum, 0) so the kernel's
                # w0*t0 + w1*t1 reproduces the exact matrix value
                # (t0 == t1, w1 term is 0).
                w0[p, k] = rows[k][j0]
                w1[p, k] = 0.0
            else:
                w0[p, k] = rows[k][j0]
                w1[p, k] = rows[k][j1]
    return r, d, w0, w1


def _make_kernel_xphase(c: int, r: int, d, has_y: bool):
    """Fused y-matmul + phase-form x-resample + quantize. Outputs c*r
    uint8 [T, W] planes (phase-minor interleave happens in the wrapper
    reshape)."""

    def kernel(*refs):
        i = 0
        ay = None
        if has_y:
            ay = refs[0][:]  # [T, H]
            i = 1
        w0 = refs[i][:]  # [r, W]
        w1 = refs[i + 1][:]
        tex_refs = refs[i + 2 : i + 2 + c]
        out_refs = refs[i + 2 + c :]
        for ch in range(c):
            a = tex_refs[ch][:]
            if has_y:
                a = jnp.dot(
                    ay, a,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
            # Shifted views with edge clamp: am1[k] = a[k-1], ap1[k] = a[k+1].
            am1 = jnp.concatenate([a[:, :1], a[:, :-1]], axis=1)
            ap1 = jnp.concatenate([a[:, 1:], a[:, -1:]], axis=1)
            for p in range(r):
                t0, t1 = (am1, a) if d[p] == -1 else (a, ap1)
                b = t0 * w0[p : p + 1, :] + t1 * w1[p : p + 1, :]
                out_refs[ch * r + p][:] = _quant(b)

    return kernel


def _xphase_fits(tex_shape, ay, plan) -> bool:
    """VMEM working-set guard for the xphase kernel, mirroring
    resample_u8's own estimate: blit_u8 must not dispatch a geometry
    whose resident set raises an uncatchable Mosaic error instead of
    degrading to the einsum path (r4 advisor finding). ay-present keeps
    full [h, w] source planes resident; ay-None tiles the source rows."""
    h, w, c = tex_shape
    r, _, _, _ = plan
    rp = ((r + 7) // 8) * 8
    weights = 2 * rp * w * 4
    out_tiles = 2 * c * r * _TILE_ROWS * w  # u8, double-buffered
    scratch = 3 * _TILE_ROWS * w * 4  # a/am1/ap1 per live channel
    if ay is not None:
        resident = 2 * h * w * c * 4 + 2 * _TILE_ROWS * h * 4
    else:
        resident = 2 * _TILE_ROWS * w * c * 4
    return resident + weights + out_tiles + scratch <= _VMEM_LIMIT - 8 * 2**20


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


def _resample_u8_xphase(tex, ay, plan, interpret: bool = False) -> jax.Array:
    """Phase-form x-resample (integer LINEAR upscale) fused with the
    optional y-matmul and the uint8 pack. tex [H, W, C] f32 → u8
    [OH, r*W, C]."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    h, w, c = tex.shape
    r, d, w0, w1 = plan
    oh = h if ay is None else ay.shape[0]
    oh_pad = ((oh + _TILE_ROWS - 1) // _TILE_ROWS) * _TILE_ROWS
    planes = [tex[:, :, ch] for ch in range(c)]
    params = pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)
    grid = (oh_pad // _TILE_ROWS,)
    # Weight tables padded to the 8-sublane f32 tile so per-phase row
    # slices stay within a legal VMEM ref.
    rp = ((r + 7) // 8) * 8
    w0 = np.pad(w0, ((0, rp - r), (0, 0)))
    w1 = np.pad(w1, ((0, rp - r), (0, 0)))
    out_specs = [
        pl.BlockSpec((_TILE_ROWS, w), lambda i: (i, 0), memory_space=pltpu.VMEM)
        for _ in range(c * r)
    ]
    out_shape = [
        jax.ShapeDtypeStruct((oh_pad, w), jnp.uint8) for _ in range(c * r)
    ]
    wspecs = [
        pl.BlockSpec((rp, w), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((rp, w), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    if ay is not None:
        if oh_pad != oh:
            ay = jnp.pad(ay, ((0, oh_pad - oh), (0, 0)))
        kern = _make_kernel_xphase(c, r, d, True)
        in_specs = [
            pl.BlockSpec((_TILE_ROWS, h), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ] + wspecs + [
            pl.BlockSpec((h, w), lambda i: (0, 0), memory_space=pltpu.VMEM)
            for _ in range(c)
        ]
        args = (ay, jnp.asarray(w0), jnp.asarray(w1), *planes)
    else:
        if oh_pad != oh:
            planes = [jnp.pad(p, ((0, oh_pad - oh), (0, 0))) for p in planes]
        kern = _make_kernel_xphase(c, r, d, False)
        in_specs = wspecs + [
            pl.BlockSpec((_TILE_ROWS, w), lambda i: (i, 0), memory_space=pltpu.VMEM)
            for _ in range(c)
        ]
        args = (jnp.asarray(w0), jnp.asarray(w1), *planes)
    outs = pl.pallas_call(
        kern,
        out_shape=out_shape,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        compiler_params=params,
        interpret=interpret,
    )(*args)
    # Interleave: phases are the minor step of X (X = r*k + p): stack
    # phase-minor then flatten [oh, w, r] -> [oh, r*w] (contiguous), then
    # channel-minor stack.
    chans = []
    for ch in range(c):
        ph = jnp.stack(outs[ch * r : (ch + 1) * r], axis=-1)  # [ohp, w, r]
        chans.append(ph.reshape(oh_pad, w * r))
    out = jnp.stack(chans, axis=-1)
    return out[:oh] if oh_pad != oh else out


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

    # Identity-identity blit (viewport-sized last pass): the quantize is
    # pure elementwise, and routing it through a Pallas kernel makes it
    # an OPAQUE consumer — XLA must materialize the full [oh, ow, c] f32
    # chain output in HBM just to feed it (~66 MB/frame round trip at
    # 1080p). The jnp form fuses into the chain's own epilogue and the
    # program writes u8 directly. Bit-identical (same round/clip/scale
    # ops; the int32 hop in _quant is a Mosaic cast workaround only).
    if ay is None and ax is None and not force_pallas:
        return _einsum_fallback(tex, None, None)

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

    from retrocapture_tpu.ops.sampling import _axis_matrix

    h, w, _ = tex.shape
    u_row = ((np.arange(vw, dtype=np.float64) + 0.5) / np.float64(vw)).astype(
        np.float32
    )
    v_col = ((np.arange(vh, dtype=np.float64) + 0.5) / np.float64(vh)).astype(
        np.float32
    )
    ay = (
        None
        if _axis_is_identity(v_col, h, True, "clamp_to_edge")
        else _axis_matrix_device(v_col, h, True, "clamp_to_edge")
    )
    if not _axis_is_identity(u_row, w, True, "clamp_to_edge"):
        # RCTPU_XPHASE=on opts in to the phase-form kernel. Default OFF:
        # the r5 on-chip A/B measured it a 27% REGRESSION on the ntsc
        # chain (1931 fps on vs 2631 off at batch 128, 2026-08-21 —
        # the ay-present variant keeps full source planes VMEM-resident
        # and pipelines worse than the dense MXU matmul pair), and
        # neutral on feedback-ghost. The kernel stays certified
        # (tests/test_kernels_resample.py) as the documented alternative
        # for VMEM-constrained geometries the dense path rejects.
        if pallas_available() and os.environ.get("RCTPU_XPHASE", "off") == "on":
            ax_np = _axis_matrix(u_row, w, True, "clamp_to_edge")
            plan = _xphase_plan(ax_np, w, vw)
            if plan is not None and _xphase_fits(tex.shape, ay, plan):
                return _resample_u8_xphase(tex, ay, plan)
        ax = _axis_matrix_device(u_row, w, True, "clamp_to_edge")
    else:
        ax = None
    return resample_u8(tex, ay, ax)
