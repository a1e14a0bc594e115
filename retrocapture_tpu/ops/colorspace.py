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


def framebuffer_store(x, *, float_framebuffer: bool, srgb_framebuffer: bool):
    """Apply the pass-output framebuffer format to a linear [H,W,4] tensor,
    returning what a later pass would observe when sampling the FBO."""
    if float_framebuffer:
        return x
    if srgb_framebuffer:
        rgb = srgb_decode(quantize_rgba8(srgb_encode(x[..., :3])))
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
