"""preconv_blur: the phase-supersampled reformulation of the warped
multi-tap blur must reproduce the naive per-tap evaluation exactly
(modulo f32 rounding-order knife edges, which must be rare and small)."""

import numpy as np
import pytest

from retrocapture_tpu.graph.kernels import _MATTIAS_GROUPS, _MATTIAS_W
from retrocapture_tpu.ops.pallas.blur_groups import BlurGroup
from retrocapture_tpu.ops.pallas.preconv_blur import (
    blur_preconv,
    plan_group,
    preconv_texture,
    subcell_coords,
)


def _mk_groups(ow, oh):
    groups = []
    for ch, bx, by, offs, scale, _ in _MATTIAS_GROUPS:
        xo = [np.float32(offs * k) / np.float32(ow) for k in (-2, -1, 0, 1, 2)]
        yo = [np.float32(offs * k) / np.float32(oh) for k in (-2, -1, 0, 1, 2)]
        groups.append(BlurGroup(ch, bx, by, xo, yo, _MATTIAS_W, scale))
    return groups


def _naive(tex, u, v, groups):
    """Evaluator float order: col = floor(((u + bx) + xo) * W)."""
    h, w = tex.shape[:2]
    out = {}
    for g in groups:
        acc = np.zeros(u.shape, np.float64)
        wts = np.asarray(g.weights, np.float64) * g.scale
        ug = (u + np.float32(g.bx)).astype(np.float32)
        vg = (v + np.float32(g.by)).astype(np.float32)
        for j, yo in enumerate(g.yo):
            rows = np.clip(
                np.floor((vg + np.float32(yo)) * np.float32(h)).astype(np.int64),
                0, h - 1,
            )
            for i, xo in enumerate(g.xo):
                cols = np.clip(
                    np.floor((ug + np.float32(xo)) * np.float32(w)).astype(np.int64),
                    0, w - 1,
                )
                acc += wts[j, i] * tex[rows, cols, g.channel]
        out[g.channel] = out.get(g.channel, 0.0) + acc
    return out


def _warp_grids(oh, ow, curv=0.5):
    x = (np.arange(ow, dtype=np.float32) + 0.5) / ow
    y = (np.arange(oh, dtype=np.float32) + 0.5) / oh
    u, v = np.meshgrid(x, y)
    cu = (u - 0.5) * 2.2
    cv = (v - 0.5) * 2.2
    cu = cu * (1.0 + (np.abs(cv) / 5.0) ** 2)
    cv = cv * (1.0 + (np.abs(cu) / 4.0) ** 2)
    cu = (cu / 2.0 + 0.5) * 0.92 + 0.04
    cv = (cv / 2.0 + 0.5) * 0.92 + 0.04
    return (
        (u + (cu - u) * curv).astype(np.float32),
        (v + (cv - v) * curv).astype(np.float32),
    )


def test_plan_tables_partition_of_weights():
    groups = _mk_groups(128, 96)
    for g in groups:
        gp = plan_group(g, 32, 24)
        want = float(np.sum(np.asarray(g.weights, np.float64) * g.scale))
        # every subcell's weights must sum to the full kernel sum
        sums = gp.table.sum(axis=-1)
        np.testing.assert_allclose(sums, want, rtol=1e-5)


def test_preconv_matches_naive_taps():
    rng = np.random.default_rng(7)
    h, w, oh, ow = 24, 32, 96, 128
    tex = rng.random((h, w, 3), np.float32)
    u, v = _warp_grids(oh, ow)
    groups = _mk_groups(ow, oh)
    want = _naive(tex, u, v, groups)
    got = blur_preconv(tex, u, v, groups)  # CPU: XLA gather path
    for ch in want:
        a = np.asarray(got[ch], np.float64)
        b = want[ch]
        # knife-edge f32 rounding-order flips allowed on a tiny fraction
        diff = np.abs(a - b)
        bad = diff > 1e-4
        assert bad.mean() < 0.005, (ch, bad.mean(), diff.max())
        assert np.median(diff) < 1e-6, (ch, np.median(diff))


def test_preconv_out_of_range_coords_exact():
    """Coords far outside [0,1] (curvature corners), and non-finite:
    every tap clamps to the edge texel — the padded first/last subcell."""
    rng = np.random.default_rng(3)
    h, w = 16, 20
    tex = rng.random((h, w, 3), np.float32)
    groups = _mk_groups(80, 64)
    u = np.asarray(
        [[-3.0, -0.01, 0.5, 1.01, 4.0, np.nan]], np.float32
    )
    v = np.full_like(u, 0.5)
    want = _naive(tex, np.where(np.isnan(u), np.float32(np.nan), u), v, groups)
    got = blur_preconv(tex, u, v, groups)
    for ch in want:
        a = np.asarray(got[ch], np.float64)
        b = want[ch]
        # NaN column: evaluator floors to INT_MIN -> clamp 0 (GL
        # cvtps2dq); naive numpy floor(NaN) cast is platform-defined, so
        # compare only the finite columns there.
        np.testing.assert_allclose(a[:, :5], b[:, :5], atol=1e-5)


def test_preconv_pallas_interpret_matches_xla():
    """The Pallas warp-sampler path (interpret mode) must agree with the
    XLA gather path bit-for-bit — same Qfine, same indices."""
    rng = np.random.default_rng(11)
    h, w, oh, ow = 16, 24, 40, 64
    tex = rng.random((h, w, 3), np.float32)
    u, v = _warp_grids(oh, ow)
    groups = _mk_groups(ow, oh)[:3]
    import jax

    a = blur_preconv(tex, u, v, groups)
    b = blur_preconv(tex, u, v, groups, interpret=True)
    for ch in a:
        np.testing.assert_array_equal(
            np.asarray(a[ch]), np.asarray(b[ch]), err_msg=str(ch)
        )


def test_engine_mattias_preconv_matches_groups(monkeypatch):
    """Whole-chain A/B through the engine (interpret-mode Pallas): the
    preconv lowering must match the shared-band groups kernel within
    knife-edge tolerance."""
    from retrocapture_tpu.runtime.engine import Engine

    rng = np.random.default_rng(2)
    frame = (rng.random((24, 32, 3)) * 255).astype(np.uint8)
    preset = "/root/reference/shaders/shaders_glsl/crt/crt-mattias.glslp"
    outs = {}
    monkeypatch.setenv("RCTPU_KERNELS", "interpret")
    for which in ("groups", "preconv"):
        monkeypatch.setenv("RCTPU_MATTIAS", which)
        e = Engine(viewport=(96, 72))
        assert e.load_preset(preset), e.last_error
        outs[which] = np.asarray(e.apply(frame), np.float64)
        assert e.shader_active
    diff = np.abs(outs["preconv"] - outs["groups"])
    assert np.median(diff) < 1e-6, np.median(diff)
    assert (diff > 2e-2).mean() < 0.005, (diff.max(), (diff > 2e-2).mean())


def test_subcell_coords_roundtrip():
    """floor(u2 * qw) must recover the clamped subcell index exactly."""
    rng = np.random.default_rng(5)
    h, w = 24, 32
    groups = _mk_groups(128, 96)
    gp = plan_group(groups[0], w, h)
    qh, qw = gp.q_shape(h, w)
    u = rng.uniform(-2, 3, (64, 64)).astype(np.float32)
    v = rng.uniform(-2, 3, (64, 64)).astype(np.float32)
    u2, v2 = subcell_coords(u, v, gp, w, h)
    ix = np.floor(np.asarray(u2, np.float64) * qw)
    assert (ix == np.floor(np.asarray(u2) * np.float32(qw))).all()
    assert (ix >= 0).all() and (ix < qw).all()
