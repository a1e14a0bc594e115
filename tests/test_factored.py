"""Phase-factored pass evaluation (graph/factored.py) must be
bit-identical to the plain [OH, OW] grid: the factorization is a pure
re-enumeration of output pixels, every tap/index computation reuses the
samplers' float32 math, and the final row/column select is exact."""

import os

import numpy as np
import pytest

SHADERS = "/root/reference/shaders/shaders_glsl"


def _run(preset, mode, frame, viewport):
    from retrocapture_tpu.runtime.engine import Engine

    os.environ["RCTPU_FACTORED"] = mode
    try:
        e = Engine(viewport=viewport)
        assert e.load_preset(preset), e.last_error
        return np.asarray(e.apply(frame)).astype(np.float64), e.shader_active
    finally:
        os.environ.pop("RCTPU_FACTORED", None)


@pytest.mark.parametrize(
    "preset",
    [
        f"{SHADERS}/xbr/xbr-lv2.glslp",
        f"{SHADERS}/ntsc/ntsc-320px.glslp",
    ],
)
def test_factored_matches_plain(preset):
    # (512, 270): x ~1.3x (runs of 1-2), y ~2.8x -> ry*rx within the
    # phase-volume budget so the factored path actually engages.
    frame = (np.random.default_rng(7).random((96, 128, 3)) * 255).astype(
        np.uint8
    )
    on, act_on = _run(preset, "on", frame, (192, 270))
    off, act_off = _run(preset, "off", frame, (192, 270))
    assert act_on and act_off
    assert np.array_equal(on, off)
    assert on.std() > 0.01  # non-flat


def test_plan_factorization_geometry():
    from retrocapture_tpu.graph.factored import (
        Factorization,
        _axis_runs,
        plan_factorization,
    )

    # Full 2-D upscales exceed the phase-volume budget by policy.
    assert plan_factorization(1080, 1920, 240, 320) is None
    f = Factorization(
        1080, 1920, *_axis_runs(1080, 240, 1920, "y"), *_axis_runs(1920, 320, 1080, "x")
    )
    assert f.my == 240 and f.mx == 320
    assert f.ry == 5 and f.rx == 6  # 4.5x runs pad to 5; 6x exact
    # Row/col selects must enumerate every output pixel exactly once.
    yidx = f.yidx.reshape(-1)[f.rowsel]
    assert np.array_equal(yidx, np.arange(1080))
    xidx = f.xidx.reshape(-1)[f.colsel]
    assert np.array_equal(xidx, np.arange(1920))
    # Downscale x with upscale y (the ntsc pass-2 geometry) still plans.
    f2 = plan_factorization(1080, 640, 240, 1280)
    assert f2 is not None and f2.ry == 5 and f2.rx == 1
    f2b = plan_factorization(1080, 640, 240, 1280)
    assert f2b is not None


def test_no_factorization_when_nothing_repeats():
    from retrocapture_tpu.graph.factored import plan_factorization

    assert plan_factorization(240, 320, 240, 320) is None  # identity
    assert plan_factorization(120, 160, 240, 320) is None  # pure downscale


def test_factored_affine_tap_nearest_exact():
    import jax.numpy as jnp

    from retrocapture_tpu.graph.factored import (
        Factorization,
        _axis_runs,
        factored_affine_tap,
    )
    from retrocapture_tpu.ops import sampling as S

    rng = np.random.default_rng(3)
    h, w, oh, ow = 96, 128, 384, 512
    texn = rng.random((h, w, 4)).astype(np.float32)
    fac = Factorization(oh, ow, *_axis_runs(oh, h, ow, "y"), *_axis_runs(ow, w, oh, "x"))

    class Samp:
        tex = jnp.asarray(texn)
        filter_linear = False
        wrap_mode = "clamp_to_edge"
        mipmap = False

    for k in (-3, 0, 2):
        aff = (
            (1.0 / ow, 0.0, (0.5 + k * (ow / w) * 0) / ow + k / w),
            (0.0, 1.0 / oh, 0.5 / oh - 2.0 / h),
        )
        out = np.asarray(fac.flatten(factored_affine_tap(fac, Samp, aff, oh, ow)))
        u_row = (
            np.float64(aff[0][0]) * np.arange(ow, dtype=np.float64)
            + np.float64(aff[0][2])
        ).astype(np.float32)
        v_col = (
            np.float64(aff[1][1]) * np.arange(oh, dtype=np.float64)
            + np.float64(aff[1][2])
        ).astype(np.float32)
        ix = np.clip(np.floor(u_row * np.float32(w)).astype(np.int64), 0, w - 1)
        iy = np.clip(np.floor(v_col * np.float32(h)).astype(np.int64), 0, h - 1)
        ref = texn[np.ix_(iy, ix)]
        assert np.array_equal(out, ref), f"offset {k}"


def test_factored_affine_tap_linear_matches_matrix():
    import jax.numpy as jnp

    from retrocapture_tpu.graph.factored import (
        Factorization,
        _axis_runs,
        factored_affine_tap,
    )
    from retrocapture_tpu.ops import sampling as S

    rng = np.random.default_rng(4)
    h, w, oh, ow = 96, 128, 384, 512
    texn = rng.random((h, w, 4)).astype(np.float32)
    fac = Factorization(oh, ow, *_axis_runs(oh, h, ow, "y"), *_axis_runs(ow, w, oh, "x"))

    class Samp:
        tex = jnp.asarray(texn)
        filter_linear = True
        wrap_mode = "clamp_to_edge"
        mipmap = False

    aff = ((1.0 / ow, 0.0, 0.5 / ow), (0.0, 1.0 / oh, 0.5 / oh))
    out = np.asarray(fac.flatten(factored_affine_tap(fac, Samp, aff, oh, ow)))
    ref = np.asarray(
        S.sample2d_affine(
            jnp.asarray(texn), aff[0], aff[1], oh, ow,
            filter_linear=True, wrap_mode="clamp_to_edge",
        )
    )
    assert np.abs(out - ref).max() < 1e-6
