"""Certify the phase-form final-blit kernel (`_resample_u8_xphase`)
against the einsum fallback it replaces.

The xphase kernel rewires the last numeric stage of EVERY chain whose
final blit is an integer LINEAR x-upscale (blit_u8 dispatches on plan
match when on-TPU), but it only engages on the chip — the CPU parity
sweeps exercise the einsum fallback by construction. These tests run the
Pallas kernel in interpreter mode and assert it reproduces
`_einsum_fallback` over all bench blit geometries, the clamp columns,
odd heights, and both has_y arms; plus the plan/VMEM gates.

Reference semantics: the final viewport blit is OpenGLRenderer::
renderTexture's LINEAR stretch + RGBA8 readback
(/root/reference/src/renderer/OpenGLRenderer.cpp:389-463,
PBOManager.cpp:86-170).
"""

import numpy as np
import pytest

from retrocapture_tpu.ops.pallas.resample import (
    _einsum_fallback,
    _resample_u8_xphase,
    _xphase_fits,
    _xphase_plan,
)
from retrocapture_tpu.ops.sampling import _axis_matrix


def _blit_axes(src, dst):
    """The exact axis coordinates blit_u8 builds (LINEAR, clamp_to_edge)."""
    coord = ((np.arange(dst, dtype=np.float64) + 0.5) / np.float64(dst)).astype(
        np.float32
    )
    return _axis_matrix(coord, src, True, "clamp_to_edge")


def _mk_tex(rng, h, w, c=3):
    # Include exact-knife-edge values: u8-grid points land exactly on
    # n/255 so a 1-ulp resample difference flips the rounded output.
    t = rng.random((h, w, c)).astype(np.float32)
    grid = (rng.integers(0, 256, size=(h, w, c)) / 255.0).astype(np.float32)
    pick = rng.random((h, w, c)) < 0.5
    return np.where(pick, grid, t).astype(np.float32)


# (src_w, dst_w, src_h or None, dst_h) — the bench blit geometries:
# 320->1920 is r=6 (scanline/xbr/mattias/ntsc final blits at a 1080p
# viewport), 640->1920 is r=3 (ntsc-320px doubles x in pass 0), plus an
# odd-height case (oh not a multiple of the 128-row tile) and a y-identity
# (has_y False) arm.
GEOMETRIES = [
    pytest.param(320, 1920, 240, 1080, id="r6-with-y"),
    pytest.param(640, 1920, 240, 1080, id="r3-with-y"),
    pytest.param(320, 1920, None, 240, id="r6-y-identity"),
    pytest.param(640, 1920, None, 333, id="r3-y-identity-odd"),
    pytest.param(320, 1920, 240, 1077, id="r6-odd-oh"),
    pytest.param(128, 256, 96, 192, id="r2-small"),
]


@pytest.mark.parametrize("w,ow,h,oh", GEOMETRIES)
def test_xphase_matches_einsum(w, ow, h, oh):
    rng = np.random.default_rng(w * 7 + ow)
    ax = _blit_axes(w, ow)
    plan = _xphase_plan(ax, w, ow)
    assert plan is not None, "bench geometry must take the xphase path"
    r, d, w0, w1 = plan
    assert r == ow // w
    # Clamp columns exist: at least one phase with d==-1 puts k=0's
    # left tap onto the clamped texel (j0 == j1 == 0).
    if any(dp == -1 for dp in d):
        p = d.index(-1)
        assert w1[p, 0] == 0.0  # collapsed clamp weights split as (sum, 0)

    if h is None:
        ay = None
        tex = _mk_tex(rng, oh, w)
    else:
        ay_np = _blit_axes(h, oh)
        ay = np.asarray(ay_np, np.float32)
        tex = _mk_tex(rng, h, w)

    got = np.asarray(_resample_u8_xphase(tex, ay, plan, interpret=True))
    want = np.asarray(
        _einsum_fallback(tex, None if ay is None else ay, ax)
    )
    assert got.shape == want.shape == (oh, ow, 3)

    # Justified tolerance (measured, see docstring below): both paths
    # are 1-ulp-product implementations of the same real-valued blit —
    # XLA fuses mul+add into FMA differently in the dense contraction vs
    # the phase-form FMA chain, so they disagree ONLY where the exact
    # value lies within an ulp of a u8 rounding boundary. Certify
    # against a float64 ground truth: every pixel within 1 step of the
    # f64 quantization, bit-equal wherever the f64 pre-quantization
    # value is not on a knife edge (>1e-4 u8-steps from the .5
    # boundary). A weight-table transcription bug (wrong tap, wrong
    # phase, off-by-one column) moves pixels by whole steps at non-edge
    # pixels and fails both assertions.
    tex64 = tex.astype(np.float64)
    if ay is not None:
        tex64 = np.einsum("os,shc->ohc", ay.astype(np.float64), tex64)
    exact = np.einsum("pt,otc->opc", ax.astype(np.float64), tex64)
    scaled = np.clip(exact, 0.0, 1.0) * 255.0
    q64 = np.round(scaled).astype(np.int32)
    edge = np.abs(scaled - np.floor(scaled) - 0.5) < 1e-4

    for label, out in (("xphase", got), ("einsum", want)):
        diff = np.abs(out.astype(np.int32) - q64)
        assert diff.max() <= 1, f"{label}: {diff.max()} steps from f64 truth"
        off_grid = diff[~edge]
        assert (off_grid == 0).all(), (
            f"{label}: {int((off_grid != 0).sum())} non-knife-edge pixels "
            "differ from the f64 ground truth"
        )
    # And the two implementations agree except on knife edges.
    d = np.abs(got.astype(np.int32) - want.astype(np.int32))
    assert d.max() <= 1 and (d[~edge] == 0).all()
    # (The fraction is loose by design — the test tex is 50% exact
    # u8-grid values, which pile onto knife edges under identity-y; the
    # load-bearing claims are the f64-truth assertions above.)
    assert (d != 0).mean() < 1e-2, f"{(d != 0).mean():.2e} pixels differ"


def test_xphase_plan_rejects_non_integer_and_downscale():
    # 320 -> 1080 is not an integer ratio: dense path.
    assert _xphase_plan(_blit_axes(320, 1080), 320, 1080) is None
    # identity ratio r=1 is rejected (identity axes never reach here).
    assert _xphase_plan(_blit_axes(320, 320), 320, 320) is None
    # downscale: ow % w != 0 arm.
    assert _xphase_plan(_blit_axes(640, 320), 640, 320) is None


def test_xphase_plan_weights_match_matrix():
    # The plan must carry the matrix's OWN per-column weights (they
    # wobble in the last ulps across k), not idealized phase constants.
    w, ow = 320, 1920
    ax = _blit_axes(w, ow)
    r, d, w0, w1 = _xphase_plan(ax, w, ow)
    for p in range(r):
        rows = ax[p::r]
        for k in (0, 1, w // 2, w - 2, w - 1):
            j0 = min(max(k + d[p], 0), w - 1)
            j1 = min(max(k + d[p] + 1, 0), w - 1)
            if j0 == j1:
                assert w0[p, k] == rows[k][j0] and w1[p, k] == 0.0
            else:
                assert w0[p, k] == rows[k][j0]
                assert w1[p, k] == rows[k][j1]


def test_xphase_fits_gate():
    # Bench geometry fits comfortably.
    plan = _xphase_plan(_blit_axes(320, 1920), 320, 1920)
    ay = np.zeros((1080, 240), np.float32)
    assert _xphase_fits((240, 320, 3), ay, plan)
    # A resident source far beyond VMEM (ay-present keeps full [h, w]
    # planes resident) must be rejected so blit_u8 degrades to the
    # einsum path instead of raising through Mosaic (r4 advisor).
    big_plan = _xphase_plan(_blit_axes(1920, 3840), 1920, 3840)
    assert big_plan is not None
    ay_big = np.zeros((2160, 1920), np.float32)
    assert not _xphase_fits((1920, 1920, 3), ay_big, big_plan)


def test_blit_u8_off_tpu_falls_back():
    # On CPU the public entry must produce identical results through the
    # einsum path (pallas_available() False ⇒ xphase never dispatches).
    from retrocapture_tpu.ops.pallas.resample import blit_u8, pallas_available

    assert not pallas_available()
    rng = np.random.default_rng(3)
    tex = _mk_tex(rng, 240, 320)
    out = np.asarray(blit_u8(tex, 1920, 1080))
    ax = _blit_axes(320, 1920)
    ay = _blit_axes(240, 1080)
    want = np.asarray(_einsum_fallback(tex, ay, ax))
    assert (out == want).all()
