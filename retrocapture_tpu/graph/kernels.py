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
    if not interpret and not blur_groups_fits((h, w, 3), (oh, ow), groups):
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
    planes = blur5x5_groups(p, uv_u, uv_v, groups, interpret=interpret)

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


_REGISTRY = {
    "crt-mattias.glsl": _mattias_kernel,
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
