"""GL-faithful texture sampling on TPU.

Implements the sampling semantics the reference gets from the GL driver
(per-pass ``filter_linear#`` / ``wrap_mode#`` applied in
ShaderEngine::renderMultipassPass, ShaderEngine.cpp:1004-1036):

* texel centers at ``(i + 0.5) / N`` (GL convention);
* NEAREST: texel ``floor(u * N)``; LINEAR: taps at ``u*N - 0.5`` with
  fractional lerp weights;
* wrap modes clamp_to_edge / repeat / mirrored_repeat applied per tap,
  clamp_to_border masking taps outside [0,N) to the GL default border
  color (0,0,0,0).

Textures are ``[H, W, C]`` float32 arrays in texture space: row 0 is
``v = 0`` (the first uploaded row, matching glTexSubImage2D order), so no
Y flips appear anywhere in the chain — exactly like the reference's FBO
chain, which only flips at the final window blit.

Gathers are expressed as flat ``jnp.take`` so XLA lowers them to a single
gather op; the Pallas fast paths in ``ops/pallas`` specialize the common
affine-grid cases.
"""

from __future__ import annotations


import contextlib
import contextvars
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "sample2d",
    "sample2d_affine",
    "sample2d_affine_mip",
    "sample2d_lod",
    "sample2d_separable",
    "WRAP_MODES",
]

WRAP_MODES = ("clamp_to_edge", "clamp_to_border", "repeat", "mirrored_repeat")


def _ifloor32(x):
    """float32 → int32 texel-index conversion with x86 semantics for
    non-finite inputs: cvtps2dq yields INT_MIN ("integer indefinite")
    for NaN/±inf, which clamp_to_edge then pins to texel 0. llvmpipe
    (and numpy's C casts on the concrete paths) behave this way; XLA's
    convert instead saturates +inf to INT32_MAX → texel n-1. Broken
    presets that divide by an unset size uniform (e.g.
    2xBR-lv1-multipass's OrigTextureSize, never bound by
    ShaderEngine.cpp) sample at inf and the two conventions pick
    opposite corners."""
    f = jnp.floor(x)
    return jnp.where(
        jnp.isfinite(f), f, jnp.float32(-2147483648.0)
    ).astype(jnp.int32)


def _wrap_index(idx, n: int, mode: str):
    """Wrap integer texel indices into [0, n). Returns (indices, valid)
    where valid is None unless mode == clamp_to_border."""
    if mode == "clamp_to_edge":
        return jnp.clip(idx, 0, n - 1), None
    if mode == "repeat":
        return jnp.remainder(idx, n), None
    if mode == "mirrored_repeat":
        # GL MIRRORED_REPEAT: period 2n, reflect the second half.
        m = jnp.remainder(idx, 2 * n)
        return jnp.where(m < n, m, 2 * n - 1 - m), None
    if mode == "clamp_to_border":
        valid = (idx >= 0) & (idx < n)
        return jnp.clip(idx, 0, n - 1), valid
    raise ValueError(f"unknown wrap mode {mode!r}")


def _gather(tex: jax.Array, iy, ix, valid_y, valid_x):
    """tex: [H, W, C]; iy/ix: integer index arrays of identical shape S.
    Returns [*S, C]."""
    h, w, c = tex.shape
    flat = tex.reshape(h * w, c)
    out = jnp.take(flat, iy * w + ix, axis=0)
    if valid_y is not None or valid_x is not None:
        valid = None
        for v in (valid_y, valid_x):
            if v is not None:
                valid = v if valid is None else (valid & v)
        # GL border color default is (0,0,0,0).
        out = jnp.where(valid[..., None], out, jnp.zeros((), tex.dtype))
    return out


def _wrap_index_np(idx: np.ndarray, n: int, mode: str):
    if mode == "clamp_to_edge":
        return np.clip(idx, 0, n - 1), None
    if mode == "repeat":
        return np.remainder(idx, n), None
    if mode == "mirrored_repeat":
        m = np.remainder(idx, 2 * n)
        return np.where(m < n, m, 2 * n - 1 - m), None
    if mode == "clamp_to_border":
        valid = (idx >= 0) & (idx < n)
        return np.clip(idx, 0, n - 1), valid
    raise ValueError(mode)


def _axis_matrix(coord: np.ndarray, n: int, filter_linear: bool, wrap: str) -> np.ndarray:
    """Build the [n_out, n] resampling matrix for one axis: one-hot rows
    for NEAREST, two-hot lerp rows for LINEAR, zero rows for border taps.
    Sampling then becomes a dense matmul — the MXU-native formulation of a
    separable gather."""
    n_out = coord.shape[0]
    a = np.zeros((n_out, n), np.float32)
    rows = np.arange(n_out)
    if not filter_linear:
        idx = np.floor(coord * n).astype(np.int64)
        idx, valid = _wrap_index_np(idx, n, wrap)
        w = np.ones(n_out, np.float32) if valid is None else valid.astype(np.float32)
        np.add.at(a, (rows, idx), w)
        return a
    x = coord * n - 0.5
    x0 = np.floor(x).astype(np.int64)
    fx = (x - x0).astype(np.float32)
    i0, v0 = _wrap_index_np(x0, n, wrap)
    i1, v1 = _wrap_index_np(x0 + 1, n, wrap)
    w0 = 1.0 - fx
    w1 = fx
    if v0 is not None:
        w0 = w0 * v0
    if v1 is not None:
        w1 = w1 * v1
    np.add.at(a, (rows, i0), w0)
    np.add.at(a, (rows, i1), w1)
    return a


def _axis_matrix_device(coord_np, n: int, filter_linear: bool, wrap: str):
    """Axis resampling matrix built ON DEVICE from a small concrete
    coordinate vector. Embedding the [n_out, n] matrix as an HLO literal
    makes XLA constant-fold transposes/elementwise of it at compile time
    — single-threaded O(n_out*n) per instruction, observed >2 s each and
    minutes per chain (the round-1 155 s scanline compile). The
    optimization_barrier pins the small vector as runtime data so only
    cheap on-device iota-compares build the matrix."""
    coord = jax.lax.optimization_barrier(jnp.asarray(coord_np, jnp.float32))
    return _axis_matrix_traced(coord, n, filter_linear, wrap)


def _separable_rows(u: np.ndarray, v: np.ndarray):
    """If u varies only along columns and v only along rows of a 2D grid,
    return (u_row, v_col); else None."""
    if u.ndim != 2 or v.ndim != 2 or u.shape != v.shape:
        return None
    if not np.all(u == u[:1, :]):
        return None
    if not np.all(v == v[:, :1]):
        return None
    return u[0, :], v[:, 0]


def _box_downsample(tex: jax.Array) -> jax.Array:
    """One mip level down: 2x2 box average (glGenerateMipmap's filter),
    truncating odd trailing rows/cols like GL's floor(n/2) level sizing."""
    h, w, _ = tex.shape
    h2, w2 = max(h // 2, 1), max(w // 2, 1)
    t = tex[: h2 * 2, : w2 * 2]
    if h >= 2:
        t = (t[0::2] + t[1::2]) * 0.5
    if w >= 2:
        t = (t[:, 0::2] + t[:, 1::2]) * 0.5
    return t


def sample2d_affine_mip(
    tex: jax.Array,
    u_aff: tuple,
    v_aff: tuple,
    oh: int,
    ow: int,
    *,
    filter_linear: bool,
    wrap_mode: str = "clamp_to_edge",
) -> jax.Array:
    """GL_LINEAR_MIPMAP_LINEAR sampling for an affine output grid: the
    texel footprint (and therefore the LOD) is a trace-time constant, so
    trilinear filtering lowers to at most two separable-matmul samples of
    box-pyramid levels blended by the LOD fraction — this is how
    ``mipmap_input#`` passes (e.g. crt-hyllian-glow's 0.25x glow blur)
    stay on the MXU."""
    h, w, _ = tex.shape
    # rho: max texels stepped per output pixel (GL LOD rule).
    rho = max(abs(u_aff[0]) * w, abs(v_aff[1]) * h, 1e-12)
    lod = float(np.log2(rho))
    if lod <= 0.0 or not filter_linear:
        return sample2d_affine(
            tex, u_aff, v_aff, oh, ow, filter_linear=filter_linear, wrap_mode=wrap_mode
        )
    max_lod = int(np.floor(np.log2(max(min(h, w), 1))))
    l0 = min(int(np.floor(lod)), max_lod)
    l1 = min(l0 + 1, max_lod)
    frac = min(max(lod - l0, 0.0), 1.0) if l1 > l0 else 0.0
    level = tex
    levels = [tex]
    for _ in range(l1):
        level = _box_downsample(level)
        levels.append(level)
    s0 = sample2d_affine(
        levels[l0], u_aff, v_aff, oh, ow, filter_linear=True, wrap_mode=wrap_mode
    )
    if frac == 0.0:
        return s0
    s1 = sample2d_affine(
        levels[l1], u_aff, v_aff, oh, ow, filter_linear=True, wrap_mode=wrap_mode
    )
    return s0 + (s1 - s0) * jnp.float32(frac)


def sample2d_warped_mip(
    tex: jax.Array,
    u,
    v,
    *,
    filter_linear: bool,
    wrap_mode: str = "clamp_to_edge",
) -> jax.Array:
    """Mipmapped sampling for WARPED 2D grids (``mipmap_input#`` passes
    whose taps are data-dependent — the case the reference's GL driver
    handles in hardware, ShaderEngine.cpp:1004-1036): per-pixel LOD from
    screen-space finite differences (the quad-derivative analog), then
    per-pixel trilinear across the box pyramid. Every reachable level is
    sampled with the warped sampler and blended by its per-pixel weight;
    cost is (levels) warped samples, paid only by warped mip taps."""
    h, w, _ = tex.shape
    u = jnp.asarray(u, jnp.float32)
    v = jnp.asarray(v, jnp.float32)

    def ddiff(a, axis):
        d = jnp.diff(a, axis=axis)
        last = jax.lax.slice_in_dim(d, d.shape[axis] - 1, d.shape[axis], axis=axis)
        return jnp.concatenate([d, last], axis=axis)

    dx = jnp.maximum(jnp.abs(ddiff(u, 1)) * w, jnp.abs(ddiff(v, 1)) * h)
    dy = jnp.maximum(jnp.abs(ddiff(u, 0)) * w, jnp.abs(ddiff(v, 0)) * h)
    rho = jnp.maximum(jnp.maximum(dx, dy), 1e-12)
    max_lod = int(np.floor(np.log2(max(min(h, w), 1))))
    lod = jnp.clip(jnp.log2(rho), 0.0, float(max_lod))
    if not filter_linear:
        lod = jnp.zeros_like(lod)  # NEAREST min filter: base level
    l0 = jnp.floor(lod)
    frac = lod - l0

    level = tex
    out = None
    for lev in range(max_lod + 1):
        wt = jnp.where(l0 == lev, 1.0 - frac, 0.0) + jnp.where(
            l0 == lev - 1, frac, 0.0
        )
        s = sample2d(
            level, u, v, filter_linear=filter_linear, wrap_mode=wrap_mode
        )
        term = s * wt[..., None]
        out = term if out is None else out + term
        if lev < max_lod:
            level = _box_downsample(level)
    return out


def sample2d_lod(
    tex: jax.Array,
    u,
    v,
    lod: float,
    *,
    filter_linear: bool,
    wrap_mode: str = "clamp_to_edge",
) -> jax.Array:
    """Explicit-LOD sampling (textureLod with a trace-time-constant LOD)
    over a box pyramid: trilinear between the two adjacent levels."""
    h, w, _ = tex.shape
    max_lod = int(np.floor(np.log2(max(min(h, w), 1))))
    lod = min(max(lod, 0.0), float(max_lod))
    l0 = int(np.floor(lod))
    l1 = min(l0 + 1, max_lod)
    frac = lod - l0 if l1 > l0 else 0.0
    level = tex
    levels = [tex]
    for _ in range(l1):
        level = _box_downsample(level)
        levels.append(level)
    s0 = sample2d(levels[l0], u, v, filter_linear=filter_linear, wrap_mode=wrap_mode)
    if frac == 0.0:
        return s0
    s1 = sample2d(levels[l1], u, v, filter_linear=filter_linear, wrap_mode=wrap_mode)
    return s0 + (s1 - s0) * jnp.float32(frac)


def _axis_stride(coord_f32: np.ndarray, n: int):
    """(idx0, stride) when the pre-wrap NEAREST indices for one axis
    advance with an exact constant integer stride >= 1, else None.
    Mirrors _axis_matrix exactly: indices are floor(coord * n) in
    float32 arithmetic."""
    idx = np.floor(coord_f32 * np.float32(n)).astype(np.int64)
    if idx.shape[0] <= 1:
        return (int(idx[0]), 1) if idx.shape[0] else (0, 1)
    d = np.diff(idx)
    s = int(d[0])
    if s < 1 or s > 64 or not np.all(d == s):
        return None
    return int(idx[0]), s


def _rational_pattern(idx: np.ndarray, max_den: int = 1):
    """Small integers (a, b, c) and per-element deltas in {0, 1} with
    ``idx[j] == (a*j + c) // b + delta[j]`` for every j, or None, up to
    the sparse ±1 flips float32 coordinate rounding introduces at texel
    boundaries (the sampler floors f32 products, so e.g. (2j+1)/9
    sequences flip at j≡4 mod 9).

    max_den=1 by default: only integer-stride progressions (identity,
    FIR offsets, integer decimation) lower to slices — measured on the
    chip, b>1 phase-interleaved slices (concat) and repeat+slice both
    LOSE to the MXU one-hot matmul for upscales (1.10 / 0.54 vs 0.33
    ms/frame for a 240p->1080p LINEAR resample; pure-write floor 0.16),
    so upscales stay on the matmul path."""
    m = idx.shape[0]
    if m < 2:
        return None
    j = np.arange(m, dtype=np.int64)
    span = float(idx[-1] - idx[0])
    for b in range(1, max_den + 1):
        a = int(round(span * b / (m - 1)))
        if a < 1:
            continue
        t = b * idx - a * j
        span_t = int(t.max()) - int(t.min())
        if span_t <= b - 1:
            # exact fit: delta identically zero
            c = int(t.max())
            return a, b, c, np.zeros(m, np.int64)
        if span_t <= 2 * b - 1:
            c = int(t.max()) - b
            delta = idx - (a * j + c) // b
            return a, b, c, delta
    return None


_PAD_MODE = {
    "clamp_to_edge": "edge",
    "repeat": "wrap",
    "mirrored_repeat": "symmetric",
    # GL border color is (0,0,0,0): a zero pad IS the border contribution
    # for both NEAREST (tap reads 0) and LINEAR (0-valued tap x lerp
    # weight), so no valid-mask weighting is needed on this path.
    "clamp_to_border": "constant",
}


def _phase_sliced_take(tex, pat, m: int, axis: int):
    """``out[j] = take(tex, (a*j + c) // b, axis)`` for j in [0, m) via
    b strided slices interleaved back together — gather-free and exact.
    ``tex`` must already be padded so every index is in range."""
    a, b, c = pat
    nd = tex.ndim
    if b == 1:
        start = [0] * nd
        limit = list(tex.shape)
        stride = [1] * nd
        start[axis] = c
        limit[axis] = c + a * (m - 1) + 1
        stride[axis] = a
        return jax.lax.slice(tex, start, limit, stride)
    # b > 1: out[b*k + r] = tex[a*k + (a*r + c)//b] — per-phase strided
    # slices stacked on a new minor axis and reshaped back (the reshape
    # is contiguity-preserving, so no transpose).
    mq = (m + b - 1) // b
    parts = []
    for r in range(b):
        s = (a * r + c) // b
        start = [0] * nd
        limit = list(tex.shape)
        stride = [1] * nd
        start[axis] = s
        limit[axis] = s + a * (mq - 1) + 1
        stride[axis] = a
        parts.append(jax.lax.slice(tex, start, limit, stride))
    out = jnp.stack(parts, axis=axis + 1)
    out = out.reshape(parts[0].shape[:axis] + (mq * b,) + parts[0].shape[axis + 1 :])
    if mq * b != m:
        out = jax.lax.slice_in_dim(out, 0, m, axis=axis)
    return out


def _axis_slice_plan(coord_f32: np.ndarray, n: int, filter_linear: bool, wrap: str):
    """Per-axis tap plan for the slice path: a list of
    ``(pattern, weight_or_None)`` taps plus the (pad_lo, pad_hi) the
    texture axis needs, or None when the index progression has no small
    rational pattern. Index/weight math mirrors _axis_matrix bit-for-bit
    (same float32 ops), so results are exact."""
    m = coord_f32.shape[0]
    if m < 2:
        return None
    if not filter_linear:
        idx = np.floor(coord_f32 * np.float32(n)).astype(np.int64)
        pat = _rational_pattern(idx)
        if pat is None:
            return None
        a, b, c, delta = pat
        if not delta.any():
            taps = [((a, b, c), None)]
        else:
            m0 = (delta == 0).astype(np.float32)
            taps = [((a, b, c), m0), ((a, b, c + b), np.float32(1.0) - m0)]
        lo, hi = int(idx.min()), int(idx.max())
    else:
        x = coord_f32 * np.float32(n) - np.float32(0.5)
        x0 = np.floor(x).astype(np.int64)
        fx = (x - x0).astype(np.float32)
        pat = _rational_pattern(x0)
        if pat is None:
            return None
        a, b, c, delta = pat
        w0 = np.float32(1.0) - fx
        # Tap pair (x0, x0+1) relative to base+delta: combine the shared
        # delta masks into per-offset weight vectors (<=3 slice takes).
        m0 = (delta == 0).astype(np.float32)
        m1 = np.float32(1.0) - m0
        cand = [
            (c, w0 * m0),
            (c + b, w0 * m1 + fx * m0),
            (c + 2 * b, fx * m1),
        ]
        taps = [((a, b, cc), wv) for cc, wv in cand if np.any(wv != 0.0)]
        if not taps:
            taps = [((a, b, c), w0)]
        lo, hi = int(x0.min()), int(x0.max()) + 1
    # The base pattern can sit one below the real index range (delta=1
    # positions); phase starts floor-divide, so cover the pattern's own
    # minimum too.
    lo = min(lo, taps[0][0][2] // taps[0][0][1])
    pad_lo = max(0, -lo)
    # Ragged-phase slices read up to ceil(m/b) elements per phase: cover
    # the padded tail too.
    a, b, c = taps[-1][0]
    mq = (m + b - 1) // b
    max_read = max((a * r + c) // b + a * (mq - 1) for r in range(b))
    pad_hi = max(0, hi - (n - 1), max_read - (n - 1))
    if pad_lo > 2 * n + 64 or pad_hi > 2 * n + 64:
        return None
    return taps, pad_lo, pad_hi


def _axis_block_plan(
    coord_f32: np.ndarray, n: int, filter_linear: bool, wrap: str, max_den: int = 24
):
    """Block-periodic axis plan for rational-ratio progressions (texel
    index advances a/b per output with b > 1 — every non-integer upscale,
    e.g. 240->1080 is 2/9 per output). The output axis reshapes into
    (blocks, b phases); each block's taps live in a window of t<=8
    consecutive strided slices of the source, combined per-phase with
    tiny concrete weights as pure elementwise ops — so XLA fuses the tap
    straight into the consuming fragment math. The dense [m, n]
    resampling matmul this replaces pays m*n MACs per channel (a
    240p->1080p NEAREST tap = ~6 GFLOP; xbr-lv2's 21 taps = ~125 GFLOP
    of multiply-by-zero per frame); this form pays m*t FMAs and fuses.

    Index/weight math mirrors _axis_matrix bit-for-bit. Returns
    (a, D, sel, W, pad_lo, pad_hi, mq, b, m) or None.

    Default OFF (RCTPU_BLOCK_RESAMPLE=1 enables): measured on the chip,
    the strided window slices lower to Mosaic relayout copies that
    materialize per-tap, and the bench regressed where the one-hot
    matmul rides the MXU (xbr-lv2 229 -> 156 fps, scanline 1664 -> 883;
    same story as the concat formulation in _rational_pattern)."""
    if os.environ.get("RCTPU_BLOCK_RESAMPLE", "0") != "1":
        return None
    m = coord_f32.shape[0]
    if m < 4:
        return None
    if not filter_linear:
        idx = np.floor(coord_f32 * np.float32(n)).astype(np.int64)
        taps = [(idx, None)]
        base = idx
    else:
        x = coord_f32 * np.float32(n) - np.float32(0.5)
        x0 = np.floor(x).astype(np.int64)
        fx = (x - x0).astype(np.float32)
        taps = [(x0, np.float32(1.0) - fx), (x0 + 1, fx)]
        base = x0
    pat = _rational_pattern(base, max_den=max_den)
    if pat is None or pat[1] == 1:
        return None  # b == 1 is the (cheaper still) pure-slice path
    a, b, _, _ = pat
    mq = (m + b - 1) // b
    blk = np.arange(m, dtype=np.int64) // b

    def pad_tail(arr):
        if mq * b == m:
            return arr
        return np.concatenate([arr, np.repeat(arr[-1:], mq * b - m, axis=0)])

    offs = [pad_tail(ix - a * blk) for ix, _ in taps]
    D = np.unique(np.concatenate(offs))
    t = D.shape[0]
    if t > 8:
        return None
    pad_lo = max(0, -int(D.min()))
    pad_hi = max(0, int(a * (mq - 1) + D.max()) - (n - 1))
    if pad_lo > 2 * n + 64 or pad_hi > 2 * n + 64:
        return None
    if not filter_linear:
        sel = np.searchsorted(D, offs[0]).reshape(mq, b)
        return (a, D, sel, None, pad_lo, pad_hi, mq, b, m)
    W = np.zeros((mq * b, t), np.float32)
    rows = np.arange(mq * b)
    for (ix, wv), off in zip(taps, offs):
        np.add.at(W, (rows, np.searchsorted(D, off)), pad_tail(wv))
    return (a, D, None, W.reshape(mq, b, t), pad_lo, pad_hi, mq, b, m)


def _axis_block_take(src, plan, axis: int, wrap: str):
    """Apply a _axis_block_plan along ``axis``: t strided window slices,
    per-phase where-select (NEAREST) or FMA (LINEAR), reshape (blocks,
    phases) back into the output axis. All elementwise — fuses."""
    a, D, sel, W, pad_lo, pad_hi, mq, b, m = plan
    nd = src.ndim
    if pad_lo or pad_hi:
        widths = [(0, 0)] * nd
        widths[axis] = (pad_lo, pad_hi)
        src = jnp.pad(src, widths, mode=_PAD_MODE[wrap])
    parts = []
    for d in D:
        start = [0] * nd
        limit = list(src.shape)
        stride = [1] * nd
        s0 = pad_lo + int(d)
        start[axis] = s0
        limit[axis] = s0 + a * (mq - 1) + 1
        stride[axis] = a
        parts.append(jnp.expand_dims(jax.lax.slice(src, start, limit, stride), axis + 1))

    def bcast(arr2d):
        shape = [1] * (nd + 1)
        shape[axis] = mq
        shape[axis + 1] = b
        return jnp.asarray(arr2d).reshape(shape)

    if sel is not None:  # NEAREST: select, never 0*NaN-hazardous weighting
        out = parts[0]
        for i in range(1, len(parts)):
            out = jnp.where(bcast(sel == i), parts[i], out)
        target = list(out.shape)
        target[axis + 1] = b
        out = jnp.broadcast_to(out, target)
    else:
        out = None
        for i in range(len(parts)):
            term = parts[i] * bcast(W[:, :, i])
            out = term if out is None else out + term
    shape = list(out.shape)
    merged = shape[:axis] + [mq * b] + shape[axis + 2 :]
    out = out.reshape(merged)
    if mq * b != m:
        out = jax.lax.slice_in_dim(out, 0, m, axis=axis)
    return out


def _separable_slices(tex, u_row: np.ndarray, v_col: np.ndarray, filter_linear: bool, wrap_mode: str):
    """Separable sample via phase-interleaved strided slices + 1D weight
    FMAs — the MXU-free lowering for affine taps with rational texel
    progressions (NEAREST and LINEAR). Exact float32 (no bf16 matmul
    rounding). Integer-stride axes take pure slices; rational-ratio axes
    (b > 1) take the block-periodic elementwise form (_axis_block_plan).
    Returns [oh, ow, C] or None when not applicable."""
    h, w, _ = tex.shape
    xplan = _axis_slice_plan(u_row, w, filter_linear, wrap_mode)
    xblock = None
    if xplan is None:
        xblock = _axis_block_plan(u_row, w, filter_linear, wrap_mode)
        if xblock is None:
            return None
    yplan = _axis_slice_plan(v_col, h, filter_linear, wrap_mode)
    yblock = None
    if yplan is None:
        yblock = _axis_block_plan(v_col, h, filter_linear, wrap_mode)
        if yblock is None:
            return None
    ow, oh = u_row.shape[0], v_col.shape[0]
    if xblock is not None or yblock is not None:
        # Per-axis padding: axis takes commute with pads on the other
        # axis (pads copy whole rows/columns), so sequential per-axis
        # handling is exact.
        def one_axis(src, plan, block, m, axis):
            if block is not None:
                return _axis_block_take(src, block, axis, wrap_mode)
            taps, lo, hi = plan
            if lo or hi:
                widths = [(0, 0), (0, 0), (0, 0)]
                widths[axis] = (lo, hi)
                src = jnp.pad(src, widths, mode=_PAD_MODE[wrap_mode])
            return _slice_axis_take(src, taps, lo, m, axis, filter_linear)

        rows = one_axis(tex, yplan, yblock, oh, 0)
        return one_axis(rows, xplan, xblock, ow, 1)
    xtaps, xlo, xhi = xplan
    ytaps, ylo, yhi = yplan
    if any((xlo, xhi, ylo, yhi)):
        mode = _PAD_MODE[wrap_mode]
        tex = jnp.pad(tex, ((ylo, yhi), (xlo, xhi), (0, 0)), mode=mode)
    rows = _slice_axis_take(tex, ytaps, ylo, oh, 0, filter_linear)
    return _slice_axis_take(rows, xtaps, xlo, ow, 1, filter_linear)


def _slice_axis_take(src, taps, pad, m, axis, filter_linear):
    """Apply a _axis_slice_plan tap list along ``axis`` (src already
    padded by ``pad`` on the low side)."""
    # NEAREST delta pair: a pure row select (0/1 complementary
    # masks) — where-select rather than 0*NaN-hazardous weighting.
    if not filter_linear and len(taps) == 2 and taps[0][1] is not None:
        (p0, w0), (p1, _) = taps
        t0 = _phase_sliced_take(src, (p0[0], p0[1], p0[2] + p0[1] * pad), m, axis)
        t1 = _phase_sliced_take(src, (p1[0], p1[1], p1[2] + p1[1] * pad), m, axis)
        shape = [1, 1, 1]
        shape[axis] = m
        mk = jnp.asarray(w0 == 1.0).reshape(shape)
        return jnp.where(mk, t0, t1)
    acc = None
    for (a, b, c), wv in taps:
        t = _phase_sliced_take(src, (a, b, c + b * pad), m, axis)
        if wv is not None:
            shape = [1, 1, 1]
            shape[axis] = m
            t = t * jnp.asarray(wv).reshape(shape)
        acc = t if acc is None else acc + t
    return acc


def _nearest_stride_slice(tex, u_row, v_col, wrap_mode: str):
    """NEAREST separable tap whose per-axis texel indices advance with a
    constant integer stride (identity taps, integer-offset FIR taps,
    integer decimation): lower to an edge-padded strided slice instead of
    one-hot resampling matmuls. This is what the reference's GL texture
    unit does for the ntsc-pass2 65-tap FIR family
    (shaders_glsl/ntsc/shaders/ntsc-pass2-*.glsl fetch_offset) — on TPU
    the slices fuse into the consuming FIR arithmetic, so the taps cost
    no FLOPs and no HBM round-trips at all."""
    h, w, _ = tex.shape
    rx = _axis_stride(u_row, w)
    ry = _axis_stride(v_col, h)
    if rx is None or ry is None:
        return None
    x0, sx = rx
    y0, sy = ry
    ow, oh = u_row.shape[0], v_col.shape[0]
    x1 = x0 + sx * (ow - 1)
    y1 = y0 + sy * (oh - 1)
    pad_lo = (max(0, -y0), max(0, -x0), 0)
    pad_hi = (max(0, y1 - (h - 1)), max(0, x1 - (w - 1)), 0)
    if max(pad_lo) > 4 * h + 64 or max(pad_hi) > 4 * w + 64:
        return None  # degenerate maps: fall back to the matrix path
    if any(pad_lo) or any(pad_hi):
        mode = {
            "clamp_to_edge": "edge",
            "repeat": "wrap",
            "mirrored_repeat": "symmetric",
        }.get(wrap_mode)
        if mode is None:  # clamp_to_border: GL border color is 0
            tex = jnp.pad(tex, tuple(zip(pad_lo, pad_hi)), mode="constant")
        else:
            tex = jnp.pad(tex, tuple(zip(pad_lo, pad_hi)), mode=mode)
    ys = y0 + pad_lo[0]
    xs = x0 + pad_lo[1]
    return jax.lax.slice(
        tex,
        (ys, xs, 0),
        (ys + sy * (oh - 1) + 1, xs + sx * (ow - 1) + 1, tex.shape[2]),
        (sy, sx, 1),
    )


def sample2d_affine(
    tex: jax.Array,
    u_aff: tuple,
    v_aff: tuple,
    oh: int,
    ow: int,
    *,
    filter_linear: bool,
    wrap_mode: str = "clamp_to_edge",
) -> jax.Array:
    """Sample ``tex [H, W, C]`` over an output grid whose coordinates are
    affine in the pixel indices: ``u = u_aff[0]*X + u_aff[2]`` (column X),
    ``v = v_aff[1]*Y + v_aff[2]`` (row Y). Separable by construction, so
    the sample lowers to two small dense resampling matmuls on the MXU —
    the coordinate tensors never exist. Returns ``[oh, ow, C]``.

    This is the hot path the GLSL evaluator proves via affine metadata
    (frontend/values.py): every non-warping shader tap, every scale pass,
    every NTSC convolution tap lands here."""
    if wrap_mode not in WRAP_MODES:
        wrap_mode = "clamp_to_edge"
    h, w, _ = tex.shape
    u_row = (
        np.float64(u_aff[0]) * np.arange(ow, dtype=np.float64) + np.float64(u_aff[2])
    ).astype(np.float32)
    v_col = (
        np.float64(v_aff[1]) * np.arange(oh, dtype=np.float64) + np.float64(v_aff[2])
    ).astype(np.float32)
    if not filter_linear:
        out = _nearest_stride_slice(tex, u_row, v_col, wrap_mode)
        if out is not None:
            return out
    out = _separable_slices(tex, u_row, v_col, filter_linear, wrap_mode)
    if out is not None:
        return out.astype(tex.dtype)
    # Identity axes skip their matmul entirely: a same-size LINEAR blit
    # axis has exact weights {1, 0} on the diagonal, and the dense
    # [n, n] einsum it would build is pure waste (the ntsc final blit
    # paid a 1080x1080 y-matmul — 8.9 GFLOP/frame of multiply-by-one).
    out = tex
    if not _axis_is_identity(v_col, h, filter_linear, wrap_mode):
        ay = _axis_matrix_device(v_col, h, filter_linear, wrap_mode)
        out = jnp.einsum(
            "hs,swc->hwc", ay, out,
            preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGH,
        )
    if not _axis_is_identity(u_row, w, filter_linear, wrap_mode):
        ax = _axis_matrix_device(u_row, w, filter_linear, wrap_mode)
        out = jnp.einsum(
            "ws,hsc->hwc", ax, out,
            preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGH,
        )
    return out.astype(tex.dtype)


def _axis_is_identity(coord_f32: np.ndarray, n: int, filter_linear: bool, wrap: str) -> bool:
    """True when this axis's resampling matrix would be the exact [n, n]
    identity (same size, texel-centered coords): NEAREST hits texel j
    with weight 1, LINEAR's lerp fraction is exactly 0 on texel centers.
    Mirrors _axis_matrix's float32 index math bit-for-bit."""
    m = coord_f32.shape[0]
    if m != n or wrap == "clamp_to_border":
        return False
    if filter_linear:
        x = coord_f32 * np.float32(n) - np.float32(0.5)
        x0 = np.floor(x)
        return bool(np.all(x == x0) and np.array_equal(x0, np.arange(n)))
    idx = np.floor(coord_f32 * np.float32(n))
    return bool(np.array_equal(idx, np.arange(n)))


def _axis_matrix_traced(coord, n: int, filter_linear: bool, wrap: str):
    """On-device [m, n] resampling matrix for one axis from a *traced*
    coordinate vector: one-hot rows (NEAREST) or two-hot lerp rows
    (LINEAR), border taps zeroed. The device build is a few VPU compares
    over m*n elements — microseconds — and the sample becomes two MXU
    matmuls, so shaders whose per-axis texel math is non-affine
    (floor/fract/clamp sharpening) still avoid the 2-D warp path."""
    coord = jnp.asarray(coord, jnp.float32)
    iw = jnp.arange(n, dtype=jnp.int32)[None, :]
    if not filter_linear:
        idx = _ifloor32(coord * n)
        idx, valid = _wrap_index(idx, n, wrap)
        a = (iw == idx[:, None]).astype(jnp.float32)
        if valid is not None:
            a = a * valid[:, None]
        return a
    x = coord * n - 0.5
    x0f = jnp.floor(x)
    fx = (x - x0f).astype(jnp.float32)
    x0 = jnp.where(jnp.isfinite(x0f), x0f, jnp.float32(-2147483648.0)).astype(jnp.int32)
    i0, v0 = _wrap_index(x0, n, wrap)
    i1, v1 = _wrap_index(x0 + 1, n, wrap)
    w0 = 1.0 - fx
    w1 = fx
    if v0 is not None:
        w0 = w0 * v0
    if v1 is not None:
        w1 = w1 * v1
    return (iw == i0[:, None]) * w0[:, None] + (iw == i1[:, None]) * w1[:, None]


def sample2d_separable(
    tex: jax.Array,
    u_row,
    v_col,
    *,
    filter_linear: bool,
    wrap_mode: str = "clamp_to_edge",
) -> jax.Array:
    """Sample ``tex [H, W, C]`` over a separable output grid given as
    per-axis coordinate vectors ``u_row [ow]`` / ``v_col [oh]`` (traced or
    concrete). Lowers to two resampling matmuls on the MXU — the traced
    analog of ``sample2d_affine``; all four wrap modes are exact (a
    mirrored/repeat boundary where both taps wrap to the same texel sums
    the lerp weights, which is what GL samples too)."""
    if wrap_mode not in WRAP_MODES:
        wrap_mode = "clamp_to_edge"
    h, w, _ = tex.shape
    if isinstance(u_row, np.ndarray) and isinstance(v_col, np.ndarray):
        # Concrete per-axis coordinates (plane-exact varyings folded
        # through the shader's texel math at trace time): rational tap
        # progressions lower to repeat+strided-slices, which XLA fuses
        # into the consuming arithmetic — no matrices, no matmuls.
        out = _separable_slices(
            tex,
            np.asarray(u_row, np.float32),
            np.asarray(v_col, np.float32),
            filter_linear,
            wrap_mode,
        )
        if out is not None:
            return out.astype(tex.dtype)
    ax = _axis_matrix_traced(u_row, w, filter_linear, wrap_mode)
    ay = _axis_matrix_traced(v_col, h, filter_linear, wrap_mode)
    th = jnp.einsum("hs,swc->hwc", ay, tex, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGH)
    return jnp.einsum(
        "ws,hsc->hwc", ax, th, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGH
    ).astype(tex.dtype)


_BAND_CHUNK_ROWS = 8


def _wrap_taps(x0, fx, n: int, mode: str, dtype):
    """Taps (idx0, w0), (idx1, w1) for one axis of a [possibly traced]
    coordinate: wrapped integer indices in [0, n) and lerp weights (border
    taps weighted 0). For NEAREST callers pass fx=None → single tap."""
    if fx is None:
        i0, v0 = _wrap_index(x0, n, mode)
        w0 = jnp.ones(x0.shape, jnp.float32)
        if v0 is not None:
            w0 = w0 * v0
        return ((i0, w0),)
    i0, v0 = _wrap_index(x0, n, mode)
    i1, v1 = _wrap_index(x0 + 1, n, mode)
    w0 = (1.0 - fx).astype(dtype)
    w1 = fx.astype(dtype)
    if v0 is not None:
        w0 = w0 * v0
    if v1 is not None:
        w1 = w1 * v1
    return ((i0, w0), (i1, w1))


def _sample2d_banded(
    tex: jax.Array,
    u,
    v,
    *,
    filter_linear: bool,
    wrap_mode: str,
) -> jax.Array:
    """Warped sampling over a 2D output grid WITHOUT gathers — exact for
    ALL wrap modes and arbitrary warps.

    TPU gathers run at ~10⁸ elements/s (a 1080p bilinear sample costs
    ~47 ms); this formulation is gather-free: output rows are processed
    in chunks; each chunk walks the row range its (wrapped) y-taps
    actually need in KB-row sub-bands via a dynamic while loop — smooth
    warps take exactly one iteration, violent ones take more but stay
    correct (each tap contributes once, gated by an in-band mask). The
    x-taps become a 2-hot weight matrix contracted on the MXU, the
    y-taps a KB-row one-hot blend.

    u, v: [HO, WO] (traced or concrete). Returns [HO, WO, C].
    """
    h, w, c = tex.shape
    ho, wo = u.shape
    r = _BAND_CHUNK_ROWS
    hop = ((ho + r - 1) // r) * r
    # Sub-band height: chunk descent + a small margin. The while loop
    # covers any additional spread exactly, so the margin is purely a
    # fast-path size knob: rowsamp traffic scales with kb (the round-1
    # margin of max(8, h//16) tripled every warped tap's HBM cost).
    kb = min(h, int(np.ceil(r * h / max(ho, 1))) + 4)

    u = jnp.asarray(u, jnp.float32)
    v = jnp.asarray(v, jnp.float32)
    if hop != ho:
        u = jnp.pad(u, ((0, hop - ho), (0, 0)), mode="edge")
        v = jnp.pad(v, ((0, hop - ho), (0, 0)), mode="edge")

    if filter_linear:
        xx = u * w - 0.5
        x0f = jnp.floor(xx)
        fx = xx - x0f
        x0 = jnp.where(jnp.isfinite(x0f), x0f, jnp.float32(-2147483648.0)).astype(jnp.int32)
        yy = v * h - 0.5
        y0f = jnp.floor(yy)
        fy = yy - y0f
        y0 = jnp.where(jnp.isfinite(y0f), y0f, jnp.float32(-2147483648.0)).astype(jnp.int32)
    else:
        x0 = _ifloor32(u * w)
        y0 = _ifloor32(v * h)
        fx = fy = None

    iw = jnp.arange(w)[None, None, :]

    def chunk(ci):
        sl = lambda a: (  # noqa: E731
            None if a is None else jax.lax.dynamic_slice_in_dim(a, ci * r, r, 0)
        )
        xtaps = _wrap_taps(sl(x0), sl(fx), w, wrap_mode, tex.dtype)
        ytaps = _wrap_taps(sl(y0), sl(fy), h, wrap_mode, tex.dtype)

        xw = jnp.zeros((r, wo, w), tex.dtype)
        for ti, twt in xtaps:
            xw = xw + (iw == ti[..., None]) * twt[..., None]
        rowsamp_fn = lambda band: jnp.einsum(  # noqa: E731
            "rxw,kwc->rxkc", xw, band, preferred_element_type=jnp.float32
        )

        ylo = jnp.minimum(*(jnp.min(t) for t, _ in ytaps)) if len(ytaps) > 1 else jnp.min(ytaps[0][0])
        yhi = jnp.maximum(*(jnp.max(t) for t, _ in ytaps)) if len(ytaps) > 1 else jnp.max(ytaps[0][0])
        n_sub = (yhi - ylo + kb) // kb  # ceil((yhi - ylo + 1) / kb)

        def body(carry):
            i, acc = carry
            lo = ylo + i * kb
            start = jnp.clip(lo, 0, max(h - kb, 0))
            band = jax.lax.dynamic_slice(tex, (start, 0, 0), (kb, w, c))
            rowsamp = rowsamp_fn(band)
            for ti, twt in ytaps:
                # in-band mask: each tap row contributes exactly once
                inb = (ti >= lo) & (ti < lo + kb)
                ly = jnp.clip(ti - start, 0, kb - 1)
                oh = jax.nn.one_hot(ly, kb, dtype=tex.dtype) * (
                    twt * inb
                )[..., None]
                acc = acc + jnp.einsum(
                    "rxk,rxkc->rxc", oh, rowsamp,
                    precision=jax.lax.Precision.HIGH,
                )
            return (i + 1, acc)

        acc0 = jnp.zeros((r, wo, c), jnp.float32)
        _, acc = jax.lax.while_loop(
            lambda carry: carry[0] < n_sub, body, (jnp.int32(0), acc0)
        )
        return acc.astype(tex.dtype)

    outs = jax.lax.map(chunk, jnp.arange(hop // r))
    outs = outs.reshape(hop, wo, c)
    return outs[:ho] if hop != ho else outs


# ---------------------------------------------------------------------------
# Cross-tap dedup for NEAREST one-hot matmul taps.
#
# Neighborhood shaders (xbr's 21-tap edge rules, FIR crosses) sample the
# SAME texture at coords differing by integer texel offsets. Each tap
# lowered independently pays its own pair of resampling matmuls — and the
# x-matmul (source W → viewport W at output height) dominates: 21 taps of
# a 240p→1080p NEAREST upscale is ~42 GMAC/frame of one-hot contraction
# re-selecting the same texels. Within one chain execution
# (``tap_dedup_scope``, entered by runtime._run_chain) taps share work:
#
#   * y stage: taps whose v-texel index vectors match bit-for-bit share
#     one ``ay @ tex`` product (xbr: 21 → 5 distinct dy rows);
#   * x stage: when the x-texel index progression is output-periodic
#     (exact integer output columns per source texel — every integer
#     upscale, e.g. 320→1920 advances 1 texel per 6 columns), ONE
#     extended matmul with ±margin texels of extra columns serves every
#     integer-shifted tap as a contiguous slice (21 x-matmuls → 5).
#
# Index math mirrors _axis_matrix_traced bit-for-bit (host float32 mul +
# floor against the device build); one-hot rows select, so equal indices
# give identical matmul results and the dedup is exact.

# Per-chain dedup scope. A ContextVar (not a module global) so two engine
# traces on different threads each see their own dict — a shared global
# could hand one trace another trace's tracers (advisor round-2 finding).
_TAP_DEDUP_VAR: "contextvars.ContextVar[Optional[dict]]" = contextvars.ContextVar(
    "rctpu_tap_dedup", default=None
)
_DEDUP_MARGIN = 4  # texels of x-shift covered each side of the base tap


def _tap_dedup() -> "Optional[dict]":
    return _TAP_DEDUP_VAR.get()


@contextlib.contextmanager
def tap_dedup_scope():
    """Scope within which NEAREST matmul taps share y-products and
    extended x-planes. Entered once per chain execution; nesting-safe
    (saves/restores), thread-/context-local, and the dict only lives for
    the trace so no tracers leak across jit boundaries."""
    token = _TAP_DEDUP_VAR.set({})
    try:
        yield
    finally:
        _TAP_DEDUP_VAR.reset(token)


def _host_floor_idx(coord_f32: np.ndarray, n: int):
    """Raw (pre-wrap) NEAREST texel indices via the exact float32 ops the
    device matrix builder uses (_ifloor32(coord * n)), or None when any
    coordinate is non-finite or too large for safe int math."""
    x = coord_f32.astype(np.float32) * np.float32(n)
    if not np.all(np.isfinite(x)) or np.any(np.abs(x) >= np.float32(2**30)):
        return None
    return np.floor(x).astype(np.int64)


def _output_period(raw: np.ndarray, max_t: int = 32):
    """Smallest t with raw[j+t] == raw[j] + 1 for all j — the exact
    output-column period of a 1-texel source step — or None."""
    m = raw.shape[0]
    for t in range(1, min(max_t, m - 1) + 1):
        if np.array_equal(raw[t:], raw[: m - t] + 1):
            return t
    return None


def _onehot_from_idx(raw_idx: np.ndarray, n: int, wrap: str):
    """[m, n] one-hot float32 resampling matrix from raw integer texel
    indices, built on device from a barriered index vector (same
    HLO-literal-avoidance rationale as _axis_matrix_device)."""
    idx, valid = _wrap_index_np(raw_idx, n, wrap)
    iw = jnp.arange(n, dtype=jnp.int32)[None, :]
    dev = jax.lax.optimization_barrier(jnp.asarray(idx, jnp.int32))
    a = (iw == dev[:, None]).astype(jnp.float32)
    if valid is not None:
        vm = jax.lax.optimization_barrier(jnp.asarray(valid, jnp.float32))
        a = a * vm[:, None]
    return a


def _dedup_nearest_matmul(tex, u_row, v_col, wrap: str, requant: bool):
    """Shared-work lowering of one NEAREST separable matmul tap inside a
    tap_dedup_scope. Returns [oh, ow, C] float32 or None (caller falls
    back to the plain per-tap matmul pair)."""
    dedup = _tap_dedup()
    if dedup is None:
        return None
    h, w, _ = tex.shape
    ry = _host_floor_idx(np.asarray(v_col, np.float32), h)
    rx = _host_floor_idx(np.asarray(u_row, np.float32), w)
    if ry is None or rx is None:
        return None
    ow = rx.shape[0]

    # --- y stage: share ay @ tex across taps with equal v-index vectors.
    th_key = ("th", id(tex), wrap, requant, ry.tobytes())
    hit = dedup.get(th_key)
    if hit is None:
        ay = _onehot_from_idx(ry, h, wrap)
        th = jnp.einsum("hs,swc->hwc", ay, tex, preferred_element_type=jnp.float32)
        if requant:
            th = _requant_u8(th)
        dedup[th_key] = (tex, th)  # hold tex so id() stays unique
        th = dedup[th_key][1]
    else:
        th = hit[1]

    # --- x stage: extended plane shared across integer-shifted taps.
    t = _output_period(rx)
    mt = _DEDUP_MARGIN
    if t is None or 2 * mt * t > max(ow // 8, 2 * t):
        # No usable period (or margin overhead too large): plain x matmul,
        # still profiting from the shared th.
        ax = _onehot_from_idx(rx, w, wrap)
        out = jnp.einsum("ws,hsc->hwc", ax, th, preferred_element_type=jnp.float32)
        return _requant_u8(out) if requant else out

    fam_key = ("ext", id(tex), wrap, requant, ry.tobytes(), t)
    entry = dedup.get(fam_key)
    dx = None
    if entry is not None:
        # Same period + same texture can still mean different output
        # widths (two passes sampling one texture at the same scale but
        # different crop widths): treat a shape mismatch like the
        # non-constant-shift case and rebase (advisor round-2 finding).
        if rx.shape != entry["rx_base"].shape:
            entry = None
        else:
            d = rx - entry["rx_base"]
            if d.min() == d.max() and abs(int(d[0])) <= mt:
                dx = int(d[0])
            else:
                entry = None
    if entry is None:
        # Build the extended plane around THIS tap as the family base:
        # columns m in [0, ow + 2*mt*t) carry raw index
        # rx[r] + q  where  m - mt*t = q*t + r,  r in [0, t).
        j = np.arange(-mt * t, ow + mt * t, dtype=np.int64)
        ext_raw = rx[np.remainder(j, t)] + np.floor_divide(j, t)
        # Consistency: the center window must reproduce rx exactly.
        if not np.array_equal(ext_raw[mt * t : mt * t + ow], rx):
            ax = _onehot_from_idx(rx, w, wrap)
            out = jnp.einsum(
                "ws,hsc->hwc", ax, th, preferred_element_type=jnp.float32
            )
            return _requant_u8(out) if requant else out
        ax_ext = _onehot_from_idx(ext_raw, w, wrap)
        ext = jnp.einsum(
            "ws,hsc->hwc", ax_ext, th, preferred_element_type=jnp.float32
        )
        if requant:
            ext = _requant_u8(ext)
        entry = {"rx_base": rx, "ext": ext, "tex": tex}
        dedup[fam_key] = entry
        dx = 0
    s = mt * t + dx * t
    return jax.lax.slice_in_dim(entry["ext"], s, s + ow, axis=1)


def _requant_u8(out):
    """Round-trip a NEAREST-selected sample of RGBA8-quantized texels
    through uint8 on its way to HBM. Exact: every selected value is
    f32(k/255) up to the matmul's bf16 operand rounding, whose absolute
    error (<= 2^-9 relative, <= 0.00195 at 1.0) stays under the 0.5/255
    recovery threshold, so round(x*255) returns k for every k — this
    both QUARTERS the materialized tap-plane traffic (xbr-lv2's 21
    one-hot matmul planes were 24 MB f32 each) and restores bit-exact
    f32 values after the MXU's bf16 conversion. On f32 backends (CPU
    parity oracle) the transform is the identity."""
    q = jnp.round(out * np.float32(255.0)).astype(jnp.uint8)
    return q.astype(jnp.float32) * np.float32(1.0 / 255.0)


def sample2d(
    tex: jax.Array,
    u: jax.Array,
    v: jax.Array,
    *,
    filter_linear: bool,
    wrap_mode: str = "clamp_to_edge",
    prefer_banded: bool = False,
    quantized_u8: bool = False,
) -> jax.Array:
    """Sample ``tex [H, W, C]`` at normalized coords ``u, v`` (any common
    shape S) with GL semantics. Returns ``[*S, C]`` in ``tex.dtype``.

    Fast path: when u/v are trace-time constants forming a separable grid
    (u a function of the column, v of the row — true for every
    non-warping shader and all scale/blit resampling), the gather lowers
    to two small dense matmuls on the MXU instead of an HBM gather."""
    if wrap_mode not in WRAP_MODES:
        wrap_mode = "clamp_to_edge"
    h, w, _ = tex.shape
    if isinstance(u, np.ndarray) and isinstance(v, np.ndarray):
        sep = _separable_rows(np.asarray(u, np.float32), np.asarray(v, np.float32))
        if sep is not None:
            u_row, v_col = sep
            if not filter_linear:
                out = _nearest_stride_slice(tex, u_row, v_col, wrap_mode)
                if out is not None:
                    return out
            out = _separable_slices(tex, u_row, v_col, filter_linear, wrap_mode)
            if out is not None:
                return out.astype(tex.dtype)
            requant = quantized_u8 and not filter_linear
            if not filter_linear and _tap_dedup() is not None:
                out = _dedup_nearest_matmul(tex, u_row, v_col, wrap_mode, requant)
                if out is not None:
                    return out.astype(tex.dtype)
            ax = _axis_matrix_device(u_row, w, filter_linear, wrap_mode)
            ay = _axis_matrix_device(v_col, h, filter_linear, wrap_mode)
            th = jnp.einsum(
                "hs,swc->hwc", ay, tex, preferred_element_type=jnp.float32
            )
            if requant:
                th = _requant_u8(th)
            out = jnp.einsum(
                "ws,hsc->hwc", ax, th, preferred_element_type=jnp.float32
            )
            if requant:
                out = _requant_u8(out)
            return out.astype(tex.dtype)
    # Warped 2D grids: gather-free paths on TPU (its gathers are ~40x
    # slower than the MXU contractions; both paths are exact for every
    # wrap mode and arbitrary warps). The Pallas kernel keeps the tap
    # weights in VMEM; big textures take the XLA banded formulation.
    # CPU keeps the plain XLA gather below — natively fast there.
    if np.ndim(u) == 2 and np.shape(u) == np.shape(v) and tex.ndim == 3:
        try:
            on_tpu = jax.devices()[0].platform in ("tpu", "axon")
        except Exception:  # noqa: BLE001
            on_tpu = False
        if on_tpu:
            from retrocapture_tpu.ops.pallas.warp_sample import (
                warp_sample_available,
                warp_sample_pallas,
            )

            if not prefer_banded and warp_sample_available(tex, np.shape(u)):
                return warp_sample_pallas(
                    tex, u, v, filter_linear=filter_linear, wrap_mode=wrap_mode
                )
            return _sample2d_banded(
                tex, u, v, filter_linear=filter_linear, wrap_mode=wrap_mode
            )

    u = jnp.asarray(u, jnp.float32)
    v = jnp.asarray(v, jnp.float32)

    if not filter_linear:
        ix = _ifloor32(u * w)
        iy = _ifloor32(v * h)
        ix, vx = _wrap_index(ix, w, wrap_mode)
        iy, vy = _wrap_index(iy, h, wrap_mode)
        return _gather(tex, iy, ix, vy, vx)

    x = u * w - 0.5
    y = v * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0).astype(tex.dtype)
    fy = (y - y0).astype(tex.dtype)
    x0 = jnp.where(jnp.isfinite(x0), x0, jnp.float32(-2147483648.0)).astype(jnp.int32)
    y0 = jnp.where(jnp.isfinite(y0), y0, jnp.float32(-2147483648.0)).astype(jnp.int32)

    x0w, vx0 = _wrap_index(x0, w, wrap_mode)
    x1w, vx1 = _wrap_index(x0 + 1, w, wrap_mode)
    y0w, vy0 = _wrap_index(y0, h, wrap_mode)
    y1w, vy1 = _wrap_index(y0 + 1, h, wrap_mode)

    t00 = _gather(tex, y0w, x0w, vy0, vx0)
    t01 = _gather(tex, y0w, x1w, vy0, vx1)
    t10 = _gather(tex, y1w, x0w, vy1, vx0)
    t11 = _gather(tex, y1w, x1w, vy1, vx1)

    fx = fx[..., None]
    fy = fy[..., None]
    top = t00 + (t01 - t00) * fx
    bot = t10 + (t11 - t10) * fx
    return top + (bot - top) * fy


def reference_sample2d_numpy(
    tex: np.ndarray, u: np.ndarray, v: np.ndarray, *, filter_linear: bool, wrap_mode: str
) -> np.ndarray:
    """Slow, obviously-correct NumPy oracle for fuzzing sample2d (per the
    test strategy of SURVEY.md §4: fuzz against a CPU GL-reference)."""

    h, w, c = tex.shape

    def wrap(i, n):
        if wrap_mode == "clamp_to_edge":
            return np.clip(i, 0, n - 1), np.ones_like(i, bool)
        if wrap_mode == "repeat":
            return np.remainder(i, n), np.ones_like(i, bool)
        if wrap_mode == "mirrored_repeat":
            m = np.remainder(i, 2 * n)
            return np.where(m < n, m, 2 * n - 1 - m), np.ones_like(i, bool)
        if wrap_mode == "clamp_to_border":
            return np.clip(i, 0, n - 1), (i >= 0) & (i < n)
        raise ValueError(wrap_mode)

    def fetch(iy, ix):
        jy, oky = wrap(iy, h)
        jx, okx = wrap(ix, w)
        val = tex[jy, jx]
        val = np.where((oky & okx)[..., None], val, 0.0)
        return val

    if not filter_linear:
        return fetch(np.floor(v * h).astype(np.int64), np.floor(u * w).astype(np.int64))

    x = u * w - 0.5
    y = v * h - 0.5
    x0 = np.floor(x).astype(np.int64)
    y0 = np.floor(y).astype(np.int64)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    t00 = fetch(y0, x0)
    t01 = fetch(y0, x0 + 1)
    t10 = fetch(y0 + 1, x0)
    t11 = fetch(y0 + 1, x0 + 1)
    top = t00 + (t01 - t00) * fx
    bot = t10 + (t11 - t10) * fx
    return top + (bot - top) * fy
