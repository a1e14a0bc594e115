"""Hand-written kernel-library entries for the benchmark shader families
(SURVEY.md §7 lowering tier (a)).

The generic evaluator lowers any GLSL; these entries replace specific
hot fragments with a TPU-native formulation — shared-band Pallas
multi-tap gathers + a fused jnp epilogue — while keeping the evaluator
as the semantic reference (tests compare the two).

Selection is by shader basename via ``find_kernel``; entries must check
static feasibility themselves and return None to fall back. Set
``RCTPU_KERNELS=off`` to disable, ``RCTPU_KERNELS=interpret`` to run the
Pallas pieces in interpreter mode (CPU testing).
"""

from __future__ import annotations

import os
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["find_kernel"]


def _mode() -> str:
    return os.environ.get("RCTPU_KERNELS", "on")


def _glsl_pow(x, p: float):
    """Non-integer pow exactly as the evaluator lowers it
    (frontend/builtins._b_pow): exp2(p * log2(x)); NaN for x<0 flushes
    to 0 at the RGBA8 store."""
    return jnp.exp2(np.float32(p) * jnp.log2(x))


def _rand(co_u, co_v):
    """crt-mattias.glsl rand(): precision-safe hash (crt-mattias.glsl
    rand: dt=dot(co,(12.9898,78.233)); sn=mod(dt,3.14);
    fract(sin(sn)*43758.5453))."""
    dt = co_u * np.float32(12.9898) + co_v * np.float32(78.233)
    sn = dt - np.float32(3.14) * jnp.floor(dt / np.float32(3.14))
    s = jnp.sin(sn) * np.float32(43758.5453)
    return s - jnp.floor(s)


def _mattias_curve(u, v):
    """crt-mattias.glsl curve(): barrel distortion; uv.y's factor uses
    the already-updated uv.x (statement order)."""
    x = (u - 0.5) * 2.0 * 1.1
    y = (v - 0.5) * 2.0 * 1.1
    ty = jnp.abs(y) * np.float32(1.0 / 5.0)
    x = x * (1.0 + ty * ty)
    tx = jnp.abs(x) * np.float32(1.0 / 4.0)
    y = y * (1.0 + tx * tx)
    u2 = (x * 0.5 + 0.5) * np.float32(0.92) + np.float32(0.04)
    v2 = (y * 0.5 + 0.5) * np.float32(0.92) + np.float32(0.04)
    return u2, v2


# 5x5 Gaussian-ish weights from crt-mattias.glsl blur() (rows = y offs
# -2,-1,0,+1,+2; cols = x offs -2,-1,0,+1,+2).
_MATTIAS_W = np.array(
    [
        [0.00366, 0.01465, 0.02564, 0.01465, 0.00366],
        [0.01465, 0.05861, 0.09524, 0.05861, 0.01465],
        [0.02564, 0.09524, 0.15018, 0.09524, 0.02564],
        [0.01465, 0.05861, 0.09524, 0.05861, 0.01465],
        [0.00366, 0.01465, 0.02564, 0.01465, 0.00366],
    ],
    np.float64,
)

def _mattias_max_dudv() -> float:
    """Worst-case |du/dv| of the mattias warp, at CURVATURE=1 (the
    pragma max, crt-mattias.glsl:5; the runtime parameter only
    interpolates q -> curve(q), so c=1 is the hard ceiling). Used by
    blur_groups v2's static drift gate: its tau routing anchors gathers
    to the tile's row-0 column base and covers per-row drift via a
    +-1-texel candidate margin — this bound proves the margin holds for
    every tile at any runtime CURVATURE instead of assuming it."""
    v = np.linspace(0.0, 1.0, 2049)[None, :]
    u = np.linspace(0.0, 1.0, 65)[:, None]
    # numpy transcription of _mattias_curve (keeps this pure-host).
    x = (u - 0.5) * 2.0 * 1.1 + 0.0 * v
    y = (v - 0.5) * 2.0 * 1.1 + 0.0 * u
    ty = np.abs(y) / 5.0
    x = x * (1.0 + ty * ty)
    tx = np.abs(x) / 4.0
    y = y * (1.0 + tx * tx)
    uu = (x * 0.5 + 0.5) * 0.92 + 0.04
    dudv = np.abs(np.diff(uu, axis=1)) / np.diff(v[0])[None, :]
    return float(dudv.max()) * 1.05  # 5% grid-resolution slack


_MATTIAS_MAX_DUDV = _mattias_max_dudv()


# (channel, base dx, base dy, offs, scale, post_add) per blur call,
# crt-mattias.glsl main() lines col.r/.g/.b =/+= ...
_MATTIAS_GROUPS = [
    (0, 0.0009, 0.0009, 1.2, 1.0, 0.005),
    (1, 0.0, -0.0015, 1.2, 1.0, 0.005),
    (2, -0.0015, 0.0, 1.2, 1.0, 0.005),
    (0, 0.0009, 0.0009, 2.25, 0.2, -0.005),
    (1, 0.0, -0.0015, 1.75, 0.2, -0.005),
    (2, -0.0015, 0.0, 1.25, 0.2, -0.005),
    (0, 0.75 * 0.01 + 0.001, 0.75 * -0.027 + 0.001, 7.0, 0.05 * (1.0 - 0.299), 0.0),
    (1, -0.75 * 0.022 + 0.0, 0.75 * -0.02 - 0.002, 5.0, 0.05 * (1.0 - 0.587), 0.0),
    (2, 0.75 * -0.02 - 0.002, 0.0, 3.0, 0.05 * (1.0 - 0.114), 0.0),
]


def _mattias_kernel(ctx, sh):
    """crt-mattias.glsl on the TPU kernel library: 9 shared-band Pallas
    blur groups + fused jnp epilogue. Returns None when infeasible."""
    from retrocapture_tpu.ops.pallas.blur_groups import (
        BlurGroup,
        blur5x5_groups,
        blur_groups_fits,
    )

    mode = _mode()
    interpret = mode == "interpret"
    cfg = ctx.program.preset.passes[ctx.i]
    if cfg.filter_linear or cfg.wrap_mode != "clamp_to_edge":
        return None
    tex = ctx.input_binding.tex
    h, w = tex.shape[0], tex.shape[1]
    ow, oh = ctx.out_size
    groups = []
    for ch, bx, by, offs, scale, _ in _MATTIAS_GROUPS:
        xo = [np.float32(offs * k) / np.float32(ow) for k in (-2.0, -1.0, 0.0, 1.0, 2.0)]
        yo = [np.float32(offs * k) / np.float32(oh) for k in (-2.0, -1.0, 0.0, 1.0, 2.0)]
        groups.append(BlurGroup(ch, bx, by, xo, yo, _MATTIAS_W, scale))
    if not interpret and not blur_groups_fits(
        (h, w, 3), (oh, ow), groups, max_dudv=_MATTIAS_MAX_DUDV
    ):
        return None

    curvature = jnp.float32(ctx.params.get("CURVATURE", np.float32(0.5)))
    scanspeed = jnp.float32(ctx.params.get("SCANSPEED", np.float32(1.0)))
    fc = ctx.frame_count
    t = (fc.astype(jnp.float32) if hasattr(fc, "astype") else jnp.float32(fc)) / 60.0

    # base warp (fragment main: q -> mix(q, curve(q), CURVATURE))
    xg = jax.lax.broadcasted_iota(jnp.float32, (oh, ow), 1)
    yg = jax.lax.broadcasted_iota(jnp.float32, (oh, ow), 0)
    q_u = (xg + 0.5) * np.float32(1.0 / ow)
    q_v = (yg + 0.5) * np.float32(1.0 / oh)
    cu, cv = _mattias_curve(q_u, q_v)
    uv_u = q_u + (cu - q_u) * curvature
    uv_v = q_v + (cv - q_v) * curvature

    # phosphor values are sampled through pow(rgb, 2.2)
    p = _glsl_pow(jnp.maximum(tex[..., :3], 0.0), 2.2)
    # Two lowerings of the 225-tap blur: the phase-supersampled
    # pre-convolution (one MXU contraction at source res + ONE warped
    # NEAREST sample per group — ~25x less per-pixel work) and the
    # dense shared-band mask kernel. RCTPU_MATTIAS=groups|preconv
    # forces one for A/B runs; default prefers preconv when its Qfine
    # textures fit the warp sampler's VMEM residency.
    from retrocapture_tpu.ops.pallas.preconv_blur import (
        blur_preconv,
        blur_preconv_fits,
    )

    # Default groups: on-chip A/B (2026-08-18) measured the preconv
    # reformulation at 125 ms/frame vs 10.1 ms for the shared-band
    # groups kernel — the per-tile band walk over the 6x-supersampled
    # Qfine textures dominates; preconv stays for A/B via RCTPU_MATTIAS.
    which = os.environ.get("RCTPU_MATTIAS", "groups")
    use_preconv = which != "groups" and blur_preconv_fits((h, w), groups)
    if use_preconv and interpret and which != "preconv":
        use_preconv = False  # interpret-mode default exercises groups
    if use_preconv:
        planes = blur_preconv(p, uv_u, uv_v, groups, interpret=interpret)
    else:
        planes = blur5x5_groups(
            p, uv_u, uv_v, groups, interpret=interpret,
            max_dudv=_MATTIAS_MAX_DUDV,
        )

    posts = {0: 0.0, 1: 0.0, 2: 0.0}
    for ch, _, _, _, _, post in _MATTIAS_GROUPS:
        posts[ch] += post
    cols = [planes[ch] + np.float32(posts[ch]) for ch in range(3)]

    col = jnp.stack(cols, axis=-1)
    # epilogue (crt-mattias.glsl main tail)
    col = jnp.clip(col * 0.4 + 0.6 * col * col, 0.0, 1.0)
    vig = 16.0 * uv_u * uv_v * (1.0 - uv_u) * (1.0 - uv_v)
    col = col * _glsl_pow(vig, 0.3)[..., None]
    col = col * jnp.asarray([0.95, 1.05, 0.95], jnp.float32)
    col = (col + (col * col - col) * np.float32(0.3)) * np.float32(3.8)
    scans = jnp.clip(
        0.35 + 0.15 * jnp.sin(3.5 * (t * scanspeed) + uv_v * np.float32(oh) * 1.5),
        0.0,
        1.0,
    )
    col = col * _glsl_pow(scans, 0.9)[..., None]
    col = col * (1.0 + 0.0015 * jnp.sin(np.float32(300.0) * t))
    o = 2.0 * jnp.remainder(yg + 0.5, np.float32(2.0)) * np.float32(1.0 / ow)
    fx = xg + 0.5
    comb = jnp.clip((jnp.remainder(fx + o, np.float32(2.0)) - 1.0) * 2.0, 0.0, 1.0)
    col = col * (1.0 - 0.15 * comb)[..., None]
    n0 = _rand(uv_u + 0.0001 * t, uv_v + 0.0001 * t)
    n1 = _rand(uv_u + 0.0001 * t + 0.3, uv_v + 0.0001 * t + 0.3)
    n2 = _rand(uv_u + 0.0001 * t + 0.5, uv_v + 0.0001 * t + 0.5)
    col = col * (1.0 - 0.25 * jnp.stack([n0, n1, n2], axis=-1))
    col = _glsl_pow(jnp.maximum(col, 0.0), 0.45)
    inside = (
        (uv_u >= 0.0) & (uv_u <= 1.0) & (uv_v >= 0.0) & (uv_v <= 1.0)
    )
    col = jnp.where(inside[..., None], col, 0.0)
    col = jnp.where(jnp.isnan(col), 0.0, col)
    return jnp.concatenate([col, jnp.ones((oh, ow, 1), jnp.float32)], axis=-1)


# ---------------------------------------------------------------------------
# xbr-lv2 (shaders_glsl/xbr/shaders/xbr-lv2.glsl): the whole tap + edge-
# detection section is phase-independent — every NEAREST tap index is an
# integer offset of the base source texel — so it runs at SOURCE
# resolution; only the fp-ramp blend is full-res, its ramps are 1D outer
# sums, and the handoff is ONE stacked 19-channel NEAREST upsample on the
# MXU instead of 21 per-tap full-res resamples (the generic-path cost).

_XBR_RGBW = np.array([14.352, 28.176, 5.472], np.float32)
# vec4 line constants (xbr-lv2.glsl:182-191)
_XBR_AO = np.array([1.0, -1.0, -1.0, 1.0], np.float32)
_XBR_BO = np.array([1.0, 1.0, -1.0, -1.0], np.float32)
_XBR_CO = np.array([1.5, 0.5, -0.5, 0.5], np.float32)
_XBR_AX = np.array([1.0, -1.0, -1.0, 1.0], np.float32)
_XBR_BX = np.array([0.5, 2.0, -0.5, -2.0], np.float32)
_XBR_CX = np.array([1.0, 1.0, -0.5, 0.0], np.float32)
_XBR_AY = np.array([1.0, -1.0, -1.0, 1.0], np.float32)
_XBR_BY = np.array([2.0, 0.5, -2.0, -0.5], np.float32)
_XBR_CY = np.array([2.0, 0.0, -1.0, 0.5], np.float32)
_XBR_CI = np.array([0.25, 0.25, 0.25, 0.25], np.float32)
_XBR_SCALE = np.float32(3.0)  # #define XBR_SCALE 3.0 (pragma commented out)

# (name, dx texels, dy texels) for the 21 neighbourhood taps.
_XBR_TAPS = [
    ("A1", -1, -2), ("B1", 0, -2), ("C1", 1, -2),
    ("A", -1, -1), ("B", 0, -1), ("C", 1, -1),
    ("D", -1, 0), ("E", 0, 0), ("F", 1, 0),
    ("G", -1, 1), ("H", 0, 1), ("I", 1, 1),
    ("G5", -1, 2), ("H5", 0, 2), ("I5", 1, 2),
    ("A0", -2, -1), ("D0", -2, 0), ("G0", -2, 1),
    ("C4", 2, -1), ("F4", 2, 0), ("I4", 2, 1),
]


def _xbr_axis_maps(ctx, ow: int, oh: int, w: int, h: int):
    """Concrete replication of the evaluator's coordinate math from the
    pass's rasterizer-exact varying planes (engine._plane_varyings): the
    xbr tap coordinates are the t1..t7 varyings (TEX1..TEX7 after the
    cg2glsl defines), each plane-fit from its own float32 corner values,
    and the sampler floors ``f32(f64(d)*j + f64(a0)) * f32(n)`` exactly
    like sample2d_affine. fp mirrors the fragment's f32 data math
    ``fract(texCoord * TextureSize)`` on the TEX0 plane vectors.
    Returns (bx, fpx, tx, by, fpy, ty) or None when the planes aren't
    available (traced params, renamed varyings)."""
    from retrocapture_tpu.runtime.engine import _plane_varyings

    cp = ctx.program.passes[ctx.i]
    try:
        planes, plane_cover = _plane_varyings(cp, ctx, ow, oh)
    except Exception:
        return None
    if plane_cover is not None:
        return None  # transformed quad: evaluator path handles coverage
    # TEX0 (texCoord) is a vec2 varying; t1..t7 are vec4s. Require per-name
    # component counts — the round-2 plane-exact varyings rework started
    # fitting TEX0 as its declared vec2 and the old uniform ``!= 4`` gate
    # silently disabled this kernel (xbr bench fell back to the evaluator).
    need = {"TEX0": 2, "TEX1": 4, "TEX2": 4, "TEX3": 4, "TEX4": 4,
            "TEX5": 4, "TEX6": 4, "TEX7": 4}
    for nm, ncomp in need.items():
        v = planes.get(nm)
        if v is None or v.affine is None or len(v.affine) < ncomp:
            return None

    def aff(nm, comp):
        return planes[nm].affine[comp]

    def col_idx(a, n, m):
        dadx, dady, a0 = a
        if dady != 0.0:
            return None
        row = (np.float64(dadx) * np.arange(m, dtype=np.float64) + np.float64(a0)).astype(np.float32)
        return np.floor(row * np.float32(n)).astype(np.int64)

    def row_idx(a, n, m):
        dadx, dady, a0 = a
        if dadx != 0.0:
            return None
        col = (np.float64(dady) * np.arange(m, dtype=np.float64) + np.float64(a0)).astype(np.float32)
        return np.floor(col * np.float32(n)).astype(np.int64)

    # x taps: A0/D0/G0 column = t6.x (-2dx), t1.x/.y/.z = -dx,0,+dx,
    # C4/F4/I4 column = t7.x (+2dx).
    tx = {
        -2: col_idx(aff("TEX6", 0), w, ow),
        -1: col_idx(aff("TEX1", 0), w, ow),
        0: col_idx(aff("TEX1", 1), w, ow),
        1: col_idx(aff("TEX1", 2), w, ow),
        2: col_idx(aff("TEX7", 0), w, ow),
    }
    ty = {
        -2: row_idx(aff("TEX1", 3), h, oh),
        -1: row_idx(aff("TEX2", 3), h, oh),
        0: row_idx(aff("TEX3", 3), h, oh),
        1: row_idx(aff("TEX4", 3), h, oh),
        2: row_idx(aff("TEX5", 3), h, oh),
    }
    if any(v is None for v in tx.values()) or any(v is None for v in ty.values()):
        return None

    def fp_of(a, n, m):
        dadx, dady, a0 = a
        d = dadx if dady == 0.0 else dady
        coord = (np.float64(d) * np.arange(m, dtype=np.float64) + np.float64(a0)).astype(np.float32)
        prod = coord * np.float32(n)
        return (prod - np.floor(prod)).astype(np.float32)

    ax, ay = aff("TEX0", 0), aff("TEX0", 1)
    if ax[1] != 0.0 or ay[0] != 0.0:
        return None
    fpx = fp_of(ax, w, ow)
    fpy = fp_of(ay, h, oh)
    return tx[0], fpx, tx, ty[0], fpy, ty


def _xbr_lv2_kernel(ctx, sh):
    cfg = ctx.program.preset.passes[ctx.i]
    if cfg.filter_linear or cfg.wrap_mode != "clamp_to_edge":
        return None
    params = ctx.params

    def p(name, default):
        v = params.get(name, np.float32(default))
        if not isinstance(v, (int, float, np.generic)):
            return None  # traced parameter: fall back to the evaluator
        return np.float32(v)

    eq_thr = p("XBR_EQ_THRESHOLD", 15.0)
    lv2_cf = p("XBR_LV2_COEFFICIENT", 2.0)
    small = p("small_details", 0.0)
    y_weight = p("XBR_Y_WEIGHT", 48.0)
    if None in (eq_thr, lv2_cf, small, y_weight):
        return None

    tex = ctx.input_binding.tex
    h, w = int(tex.shape[0]), int(tex.shape[1])
    ow, oh = ctx.out_size
    maps = _xbr_axis_maps(ctx, ow, oh, w, h)
    if maps is None:
        return None
    bx, fpx, tx, by, fpy, ty = maps
    # x-exactness gate: every x-tap's f32-floored index must equal
    # clamp(base + k) everywhere (true whenever ow/w is an integer ratio,
    # e.g. 320->1920), so x offsets factor to source-column shifts. The
    # y-axis needs no such property: each of the 5 y offsets gets its own
    # exact one-hot row gather below, so y f32 boundary flips (e.g.
    # 240->1080 flips ~20 rows per offset) are reproduced bit-for-bit.
    for k, arr in tx.items():
        if not np.array_equal(np.clip(arr, 0, w - 1), np.clip(bx + k, 0, w - 1)):
            return None

    # Colors ride as exact small integers (RGBA8 levels x255) so every
    # one-hot matmul runs at DEFAULT bf16 precision losslessly.
    tex255 = tex[..., :3].astype(jnp.float32) * 255.0
    iw_h = jnp.arange(h, dtype=jnp.int32)[None, :]
    ytex = {}
    for k in (-2, -1, 0, 1, 2):
        idx = jax.lax.optimization_barrier(
            jnp.asarray(np.clip(ty[k], 0, h - 1).astype(np.int32))
        )
        My = (iw_h == idx[:, None]).astype(jnp.float32)  # [oh, h]
        ytex[k] = jnp.einsum(
            "Hs,swc->Hwc", My, tex255, preferred_element_type=jnp.float32
        )  # [oh, w, 3] exact ints

    inv255 = np.float32(1.0 / 255.0)
    pads = {
        k: jnp.pad(v, ((0, 0), (2, 2), (0, 0)), mode="edge") for k, v in ytex.items()
    }

    def tap(dx, dy):  # [oh, w, 3] plane: exact y map, x source-shift
        return jax.lax.slice(
            pads[dy], (0, 2 + dx, 0), (oh, 2 + dx + w, 3)
        ) * inv255

    t = {name: tap(dx, dy) for name, dx, dy in _XBR_TAPS}
    rgbw = jnp.asarray(_XBR_RGBW)

    def lum(x):
        return x[..., 0] * rgbw[0] + x[..., 1] * rgbw[1] + x[..., 2] * rgbw[2]

    L = {name: lum(v) for name, v in t.items()}

    def v4(*names):
        return jnp.stack([L[n] for n in names], axis=-1)

    b4 = v4("B", "D", "H", "F")
    c4 = v4("C", "A", "G", "I")
    d4 = v4("D", "H", "F", "B")
    e4 = jnp.stack([L["E"]] * 4, axis=-1)
    f4_ = v4("F", "B", "D", "H")
    g4 = v4("G", "I", "C", "A")
    h4 = v4("H", "F", "B", "D")
    i4_ = v4("I", "C", "A", "G")
    if small < 0.5:
        i4 = v4("I4", "C1", "A0", "G5")
        i5 = v4("I5", "C4", "A1", "G0")
        h5 = v4("H5", "F4", "B1", "D0")
    else:
        # mul(mat4x3(A,B,C,D), y_weight*Y): rows are dot(tap, y_weight*Y)
        Y = jnp.asarray(np.array([0.2126, 0.7152, 0.0722], np.float32)) * jnp.float32(y_weight)

        def lumY(x):
            return x[..., 0] * Y[0] + x[..., 1] * Y[1] + x[..., 2] * Y[2]

        i4 = jnp.stack([lumY(t[n]) for n in ("I4", "C1", "A0", "G5")], axis=-1)
        i5 = jnp.stack([lumY(t[n]) for n in ("I5", "C4", "A1", "G0")], axis=-1)
        h5 = jnp.stack([lumY(t[n]) for n in ("H5", "F4", "B1", "D0")], axis=-1)
    f44 = jnp.zeros_like(i4)  # `vec4 f4` is never assigned (zero-init)

    def df(a, b):
        return jnp.abs(a - b)

    def diff(a, b):
        return (a != b).astype(jnp.float32)

    def eq(a, b):
        return (df(a, b) <= eq_thr).astype(jnp.float32)

    def neq(a, b):
        return np.float32(1.0) - eq(a, b)

    irlv0 = diff(e4, f4_) * diff(e4, h4)
    # CORNER_C (the compiled-in variant, xbr-lv2.glsl:41,307-309)
    irlv1 = irlv0 * (
        neq(f4_, b4) * neq(f4_, c4)
        + neq(h4, d4) * neq(h4, g4)
        + eq(e4, i4_) * (neq(f4_, f44) * neq(f4_, i4) + neq(h4, h5) * neq(h4, i5))
        + eq(e4, g4)
        + eq(e4, c4)
    )
    irlv2l = diff(e4, g4) * diff(d4, g4)
    irlv2u = diff(e4, c4) * diff(b4, c4)

    if small < 0.5:
        wd1 = df(e4, c4) + df(e4, g4) + df(i4_, h5) + df(i4_, f44) + 4.0 * df(h4, f4_)
        wd2 = df(h4, d4) + df(h4, i5) + df(f4_, i4) + df(f4_, b4) + 4.0 * df(e4, i4_)
    else:
        wd1 = (
            df(e4, c4) + df(e4, g4) + df(i4_, f44) + df(i4_, h5)
            + df(b4, d4) + df(i4, i5) + 2.0 * df(h4, f4_)
        )
        wd2 = (
            df(h4, d4) + df(h4, i5) + df(f4_, b4) + df(f4_, i4)
            + df(g4, h5) + df(c4, f44) + 2.0 * df(e4, i4_)
        )

    edri = (wd2 >= wd1).astype(jnp.float32) * irlv0
    edr = (wd2 >= wd1 + np.float32(0.1)).astype(jnp.float32) * (
        irlv1 >= np.float32(0.5)
    ).astype(jnp.float32)
    edr_l = (df(h4, c4) >= lv2_cf * df(f4_, g4)).astype(jnp.float32) * irlv2l * edr
    edr_u = (df(f4_, g4) >= lv2_cf * df(h4, c4)).astype(jnp.float32) * irlv2u * edr
    px = (df(e4, h4) >= df(e4, f4_)).astype(jnp.float32)

    # Pack the five binary vec4 flags into 4 integer-code channels
    # (0..31, exact in f32) so the upsample moves 4 planes, not 20.
    code = edri + 2.0 * edr + 4.0 * edr_l + 8.0 * edr_u + 16.0 * px

    # Handoff to full width: stack the 19 per-[oh, w] planes
    # channel-major and contract the x axis with a one-hot column-select
    # matrix — einsum("chs,Ws->chW") lands directly in [19, oh, ow]
    # layout with NO full-res transpose. Colors are ints x255 and codes
    # <= 31, exact in DEFAULT bf16.
    def tap_raw(dx, dy):  # [oh, w, 3] plane, exact x255 integers
        return jax.lax.slice(pads[dy], (0, 2 + dx, 0), (oh, 2 + dx + w, 3))

    E255, H255, F255, B255, D255 = (
        ytex[0], ytex[1], tap_raw(1, 0), ytex[-1], tap_raw(-1, 0)
    )
    planes = [
        E255[..., 0], E255[..., 1], E255[..., 2],
        H255[..., 0], H255[..., 1], H255[..., 2],
        F255[..., 0], F255[..., 1], F255[..., 2],
        B255[..., 0], B255[..., 1], B255[..., 2],
        D255[..., 0], D255[..., 1], D255[..., 2],
        code[..., 0], code[..., 1], code[..., 2], code[..., 3],
    ]
    S = jnp.stack(planes, axis=0)  # [19, oh, w]

    # Fused Pallas epilogue: in-register x-upsample + decode + ramp
    # blend in one HBM pass. Measured SLOWER than the einsum + fused
    # elementwise XLA path below on TPU (260 vs 386 fps at the bench
    # operating point — per-tile fixed overheads dominate at these
    # sizes), so it is opt-in via RCTPU_KERNELS=epilogue; interpret mode
    # still exercises it as the Pallas correctness reference.
    mode = _mode()
    from retrocapture_tpu.ops.pallas.xbr_epilogue import (
        xbr_epilogue,
        xbr_epilogue_fits,
    )

    if mode == "interpret" or (
        mode == "epilogue" and xbr_epilogue_fits(w, ow, oh)
    ):
        try:
            return xbr_epilogue(
                S,
                np.clip(bx, 0, w - 1).astype(np.int32),
                fpx,
                fpy,
                interpret=mode == "interpret",
            )
        except Exception:  # noqa: BLE001 - fall back to the XLA path
            if mode == "interpret":
                raise

    bxi = jax.lax.optimization_barrier(
        jnp.asarray(np.clip(bx, 0, w - 1).astype(np.int32))
    )
    Ax = (jnp.arange(w, dtype=jnp.int32)[None, :] == bxi[:, None]).astype(
        jnp.float32
    )  # [ow, w]
    up = jnp.einsum("chs,Ws->chW", S, Ax, preferred_element_type=jnp.float32)

    inv = np.float32(1.0 / 255.0)
    E = [up[i] * inv for i in range(3)]
    Hc = [up[3 + i] * inv for i in range(3)]
    Fc = [up[6 + i] * inv for i in range(3)]
    Bc = [up[9 + i] * inv for i in range(3)]
    Dc = [up[12 + i] * inv for i in range(3)]
    ucode = [up[15 + i] for i in range(4)]
    edri_f, edr_f, edrl_f, edru_f, px_f = [], [], [], [], []
    for ci in range(4):
        r = ucode[ci]
        edri_f.append(jnp.remainder(r, 2.0))
        r = jnp.floor(r * 0.5)
        edr_f.append(jnp.remainder(r, 2.0))
        r = jnp.floor(r * 0.5)
        edrl_f.append(jnp.remainder(r, 2.0))
        r = jnp.floor(r * 0.5)
        edru_f.append(jnp.remainder(r, 2.0))
        px_f.append(jnp.floor(r * 0.5))

    # fp ramps: separable 1D outer sums, clamped (fx45/fx30/fx60/fx45i).
    fpyj = jnp.asarray(fpy)[:, None]
    fpxj = jnp.asarray(fpx)[None, :]
    delta = np.float32(1.0) / _XBR_SCALE
    delta_l = np.array([0.5, 1.0, 0.5, 1.0], np.float32) / _XBR_SCALE
    delta_u = np.array([1.0, 0.5, 1.0, 0.5], np.float32) / _XBR_SCALE
    d4v = np.full(4, delta, np.float32)

    def ramp(A, B, C, d, ci, extra=0.0):
        x = (
            A[ci] * fpyj + B[ci] * fpxj + np.float32(d[ci] - C[ci] - extra)
        ) * np.float32(1.0 / (2.0 * d[ci]))
        return jnp.clip(x, 0.0, 1.0)

    maximos = []
    for ci in range(4):
        m = jnp.maximum(
            jnp.maximum(
                edrl_f[ci] * ramp(_XBR_AX, _XBR_BX, _XBR_CX, delta_l, ci),
                edru_f[ci] * ramp(_XBR_AY, _XBR_BY, _XBR_CY, delta_u, ci),
            ),
            jnp.maximum(
                edr_f[ci] * ramp(_XBR_AO, _XBR_BO, _XBR_CO, d4v, ci),
                edri_f[ci] * ramp(_XBR_AO, _XBR_BO, _XBR_CO, d4v, ci, extra=0.25),
            ),
        )
        maximos.append(m)

    def mixc(a, b, m):  # per-channel-plane mix
        return [ac + (bc - ac) * m for ac, bc in zip(a, b)]

    Tx = mixc(Hc, Fc, px_f[0])
    Tz = mixc(Bc, Dc, px_f[2])
    Ty = mixc(Fc, Bc, px_f[1])
    Tw = mixc(Dc, Hc, px_f[3])
    res1 = mixc(mixc(E, Tx, maximos[0]), Tz, maximos[2])
    res2 = mixc(mixc(E, Ty, maximos[1]), Tw, maximos[3])

    def c_df(c1, c2):
        return (
            jnp.abs(c1[0] - c2[0]) + jnp.abs(c1[1] - c2[1]) + jnp.abs(c1[2] - c2[2])
        )

    sel = (c_df(E, res2) >= c_df(E, res1)).astype(jnp.float32)
    res = mixc(res1, res2, sel)
    return jnp.stack(res + [jnp.ones((oh, ow), jnp.float32)], axis=-1)


_REGISTRY = {
    "crt-mattias.glsl": _mattias_kernel,
    "xbr-lv2.glsl": _xbr_lv2_kernel,
}


def find_kernel(shader_path: str):
    """Hand kernel for a pass, or None. Gated off outside TPU unless
    interpret mode is forced."""
    mode = _mode()
    if mode == "off":
        return None
    fn = _REGISTRY.get(Path(shader_path).name)
    if fn is None:
        return None
    if mode != "interpret":
        try:
            if jax.devices()[0].platform not in ("tpu", "axon"):
                return None
        except Exception:  # noqa: BLE001
            return None
    return fn
