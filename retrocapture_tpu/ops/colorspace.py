"""Color-space and framebuffer-format transforms.

Covers the reference's FBO formats (ShaderEngine::createFramebuffer,
ShaderEngine.cpp:2872-2923 — RGBA8 / RGBA32F / SRGB8_ALPHA8) and the
CPU pixel-format converters (utils/PixelFormatConverter, BT.601) that the
first pass fuses in (SURVEY.md §7 step 6).

GL sRGB filtering linearizes each texel *before* bilinear blending, so
storing ``decode(quantize(encode(x)))`` as linear float and filtering
normally is bit-equivalent to sampling an SRGB8 texture.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = [
    "srgb_encode",
    "srgb_decode",
    "quantize_rgba8",
    "framebuffer_store",
    "yuyv_to_rgb",
    "nv12_to_rgb",
    "uyvy_to_rgb",
    "rgb_to_unit_float",
]


# llvmpipe float->sRGB8 store thresholds, probed from the GL oracle
# (Mesa llvmpipe) 2026-08-18 by parallel bracket scan: _SRGB_ENC_T[k] is
# the smallest f32 whose stored code is k+1 in mixed-value contexts.
# The driver's conversion (lp_bld_format_srgb.c) is a piecewise-linear
# fixed-point approximation of IEC 61966-2-1 and is even locally
# NON-monotone in ~1e-4-wide bands at code boundaries, so a threshold
# table reproduces it to ~99.6%% of random inputs (residue is the
# in-band jitter); the exact IEC formula the engine previously used
# disagreed on ~7%% of stored pixels (one code), which dominated
# crt-royale's chain parity (srgb_framebuffer on most passes).
_SRGB_ENC_T = np.array([
    0.00015176351, 0.000455290457, 0.000758817478, 0.00106234441, 0.00136587152, 0.00166939839,
    0.00197292562, 0.00227645226, 0.0025799796, 0.00288350624, 0.00323728775, 0.00355475675,
    0.00389194675, 0.00424473314, 0.00461733481, 0.00500685675, 0.00541602867, 0.00584496744,
    0.00628944673, 0.00676129479, 0.00725119049, 0.00776066212, 0.00828682259, 0.00883908104,
    0.00940257963, 0.010000539, 0.0106097572, 0.011249288, 0.0119054159, 0.0125833349,
    0.0132811107, 0.0140044633, 0.0147519056, 0.0155277299, 0.0163191017, 0.0171306469,
    0.0179700162, 0.0188379306, 0.0197276119, 0.0206417497, 0.0215806328, 0.0225461312,
    0.0235201027, 0.0245460961, 0.0255712382, 0.026625663, 0.0277204216, 0.0288280603,
    0.0299664568, 0.0311340038, 0.0323314853, 0.0335522704, 0.0347861573, 0.0360576212,
    0.0373493172, 0.0386595242, 0.0400349721, 0.0414081886, 0.0428063832, 0.044248566,
    0.0457090139, 0.0471954234, 0.0487428904, 0.0502599701, 0.0518641584, 0.0534338653,
    0.0550692752, 0.0567470305, 0.0584505759, 0.0601582266, 0.0618762076, 0.0636989251,
    0.0654704794, 0.0673382357, 0.0691505373, 0.0710896552, 0.0730160475, 0.0749709457,
    0.0769463554, 0.0789634138, 0.0810274854, 0.0831042752, 0.0852389634, 0.0873812437,
    0.0895496756, 0.0917297676, 0.0940124318, 0.0962214023, 0.098549746, 0.100876145,
    0.10324046, 0.105627514, 0.108125634, 0.110511072, 0.113024756, 0.115554482,
    0.118107952, 0.120714225, 0.123336494, 0.125949278, 0.128635198, 0.13140662,
    0.134131432, 0.136899337, 0.139746606, 0.142657727, 0.145462096, 0.148380071,
    0.15139167, 0.154277459, 0.15732348, 0.160446882, 0.16351974, 0.166691586,
    0.169864342, 0.173026651, 0.176323026, 0.179500461, 0.182836056, 0.186177909,
    0.189625278, 0.192900568, 0.196312279, 0.199868977, 0.203346074, 0.206893206,
    0.210472882, 0.214072704, 0.217760623, 0.221490189, 0.225284681, 0.228963017,
    0.232768968, 0.236638173, 0.240450859, 0.244445786, 0.248242781, 0.252410501,
    0.25646922, 0.260407895, 0.26452902, 0.268694818, 0.272830635, 0.27695784,
    0.281236291, 0.285555124, 0.289943635, 0.294146061, 0.298522562, 0.302925855,
    0.307502866, 0.312140793, 0.316705376, 0.321262747, 0.325863928, 0.330443621,
    0.335134953, 0.339981169, 0.344843298, 0.349501491, 0.354348928, 0.359315574,
    0.364226013, 0.36922884, 0.374333411, 0.379115939, 0.384375453, 0.389356554,
    0.394720674, 0.399813622, 0.405095756, 0.410381317, 0.415730357, 0.421014607,
    0.426459402, 0.431992441, 0.437436968, 0.443052024, 0.448673904, 0.454222262,
    0.459808499, 0.465498537, 0.471127182, 0.47700876, 0.482782423, 0.488607407,
    0.494499505, 0.500388384, 0.506299317, 0.512369514, 0.518424809, 0.52472049,
    0.530707181, 0.536957026, 0.543286443, 0.549305618, 0.555771947, 0.562218666,
    0.568567991, 0.574994206, 0.581419945, 0.588060737, 0.594433308, 0.601178944,
    0.60765326, 0.614549756, 0.621338725, 0.627851367, 0.634911716, 0.641414285,
    0.648662388, 0.655537367, 0.662347734, 0.669192076, 0.676199734, 0.683809519,
    0.690615177, 0.697888792, 0.704856813, 0.712286413, 0.720101655, 0.727333307,
    0.734638155, 0.742009699, 0.749847829, 0.757092357, 0.764915049, 0.772294343,
    0.78003329, 0.787495911, 0.795512259, 0.803078771, 0.811363876, 0.819038749,
    0.826944113, 0.834912598, 0.842972755, 0.850712001, 0.859088182, 0.867394567,
    0.87578094, 0.883603752, 0.891906619, 0.900519907, 0.909038007, 0.916931391,
    0.926073849, 0.933846951, 0.943126559, 0.951553285, 0.959849298, 0.968509495,
    0.977300823, 0.986047804, 0.994996011
], np.float32)

# Exact IEC decode of each code, computed in f64 once — bit-identical
# to the oracle harness's readback decode (parity/oracle.py decodes the
# f32 readback k/255 promoted to f64, so quantize to f32 first).
_k = (np.arange(256, dtype=np.float64) / 255.0).astype(np.float32).astype(np.float64)
_SRGB_DEC = np.where(
    _k <= 0.04045, _k / 12.92, ((_k + 0.055) / 1.055) ** 2.4
).astype(np.float32)
del _k


def srgb_encode(x):
    x = jnp.clip(x, 0.0, 1.0)
    return jnp.where(
        x <= 0.0031308, x * 12.92, 1.055 * jnp.power(x, 1.0 / 2.4) - 0.055
    )


def srgb_decode(x):
    return jnp.where(
        x <= 0.04045, x / 12.92, jnp.power((x + 0.055) / 1.055, 2.4)
    )


def quantize_rgba8(x):
    """Clamp to [0,1] and quantize to 8-bit levels (RGBA8 FBO round
    trip). NaN flushes to 0 like a GL UNORM store."""
    x = jnp.where(jnp.isnan(x), 0.0, x)
    return jnp.round(jnp.clip(x, 0.0, 1.0) * 255.0) * (1.0 / 255.0)


def srgb_store_rgb(x):
    """Linear RGB -> the linear value a later pass samples after an
    SRGB8 framebuffer store, matching the llvmpipe driver's quantizer:
    code = #{k: _SRGB_ENC_T[k] <= x} via the exact-formula code +-1
    correction (two tiny-table gathers instead of a searchsorted), then
    the exact IEC decode shared with the GL oracle. NaN stores 0 like a
    GL UNORM store."""
    x = jnp.where(jnp.isnan(x), 0.0, jnp.clip(x, 0.0, 1.0))
    t = jnp.asarray(_SRGB_ENC_T)
    code0 = jnp.round(srgb_encode(x) * 255.0).astype(jnp.int32)
    hi = jnp.take(t, jnp.clip(code0, 0, 254))
    lo = jnp.take(t, jnp.clip(code0 - 1, 0, 254))
    code = (
        code0
        + ((x >= hi) & (code0 < 255)).astype(jnp.int32)
        - ((x < lo) & (code0 > 0)).astype(jnp.int32)
    )
    return jnp.take(jnp.asarray(_SRGB_DEC), code)


def framebuffer_store(x, *, float_framebuffer: bool, srgb_framebuffer: bool):
    """Apply the pass-output framebuffer format to a linear [H,W,4] tensor,
    returning what a later pass would observe when sampling the FBO."""
    if float_framebuffer:
        return x
    if srgb_framebuffer:
        rgb = srgb_store_rgb(x[..., :3])
        a = quantize_rgba8(x[..., 3:4])
        return jnp.concatenate([rgb, a], axis=-1)
    return quantize_rgba8(x)


# ---------------------------------------------------------------------------
# BT.601 YUV → RGB (limited range), matching utils/PixelFormatConverter.

_BT601 = np.array(
    [
        [1.164, 0.0, 1.596],
        [1.164, -0.392, -0.813],
        [1.164, 2.017, 0.0],
    ],
    np.float32,
)


def _ycbcr_to_rgb(y, cb, cr):
    y = y - 16.0
    cb = cb - 128.0
    cr = cr - 128.0
    m = _BT601
    r = m[0, 0] * y + m[0, 2] * cr
    g = m[1, 0] * y + m[1, 1] * cb + m[1, 2] * cr
    b = m[2, 0] * y + m[2, 1] * cb
    rgb = jnp.stack([r, g, b], axis=-1)
    return jnp.clip(rgb * (1.0 / 255.0), 0.0, 1.0)


def yuyv_to_rgb(raw, width: int, height: int):
    """raw: uint8 [..., H, W*2] YUYV interleaved rows (Y0 U Y1 V) →
    float32 [..., H, W, 3]."""
    raw = raw.reshape(raw.shape[:-2] + (height, width // 2, 4)).astype(jnp.float32)
    y0 = raw[..., 0]
    u = raw[..., 1]
    y1 = raw[..., 2]
    v = raw[..., 3]
    y = jnp.stack([y0, y1], axis=-1).reshape(raw.shape[:-2] + (width,))
    u2 = jnp.repeat(u, 2, axis=-1)
    v2 = jnp.repeat(v, 2, axis=-1)
    return _ycbcr_to_rgb(y, u2, v2)


def uyvy_to_rgb(raw, width: int, height: int):
    """raw: uint8 [..., H, W*2] UYVY interleaved → float32 [..., H, W, 3]."""
    raw = raw.reshape(raw.shape[:-2] + (height, width // 2, 4)).astype(jnp.float32)
    u = raw[..., 0]
    y0 = raw[..., 1]
    v = raw[..., 2]
    y1 = raw[..., 3]
    y = jnp.stack([y0, y1], axis=-1).reshape(raw.shape[:-2] + (width,))
    u2 = jnp.repeat(u, 2, axis=-1)
    v2 = jnp.repeat(v, 2, axis=-1)
    return _ycbcr_to_rgb(y, u2, v2)


def nv12_to_rgb(y_plane, uv_plane, width: int, height: int):
    """y: uint8 [..., H, W]; uv: uint8 [..., H//2, W] interleaved U,V →
    float32 [..., H, W, 3]."""
    y = y_plane.astype(jnp.float32)
    uv = uv_plane.reshape(uv_plane.shape[:-2] + (height // 2, width // 2, 2)).astype(
        jnp.float32
    )
    u = jnp.repeat(jnp.repeat(uv[..., 0], 2, axis=-1), 2, axis=-2)
    v = jnp.repeat(jnp.repeat(uv[..., 1], 2, axis=-1), 2, axis=-2)
    return _ycbcr_to_rgb(y, u, v)


def rgb_to_unit_float(frame):
    """uint8 [..., 3] → float32 [..., 3] in [0, 1]."""
    return frame.astype(jnp.float32) * (1.0 / 255.0)
