"""Fuzz sample2d against the NumPy GL-reference oracle (SURVEY.md §7
step 4: "this gates everything")."""

import numpy as np
import pytest

from retrocapture_tpu.ops.sampling import (
    WRAP_MODES,
    reference_sample2d_numpy,
    sample2d,
)


@pytest.mark.parametrize("wrap", WRAP_MODES)
@pytest.mark.parametrize("linear", [False, True])
def test_fuzz_vs_oracle(wrap, linear):
    rng = np.random.default_rng(hash((wrap, linear)) % 2**32)
    tex = rng.random((13, 17, 4), np.float32)
    # Include exact texel centers/edges and far out-of-range coords.
    u = np.concatenate(
        [
            rng.uniform(-2.0, 3.0, 500),
            np.linspace(0, 1, 18),  # edges
            (np.arange(17) + 0.5) / 17,  # centers
        ]
    ).astype(np.float32)
    v = np.concatenate(
        [
            rng.uniform(-2.0, 3.0, 500),
            np.linspace(0, 1, 18),
            (np.arange(17) + 0.5)[:1].repeat(18) / 13,
        ]
    ).astype(np.float32)
    n = min(len(u), len(v))
    u, v = u[:n], v[:n]
    got = np.asarray(sample2d(tex, u, v, filter_linear=linear, wrap_mode=wrap))
    want = reference_sample2d_numpy(tex, u, v, filter_linear=linear, wrap_mode=wrap)
    np.testing.assert_allclose(got, want, atol=2e-6)


def test_nearest_exact_center_hits_texel():
    tex = np.arange(12, dtype=np.float32).reshape(3, 4, 1)
    u = (np.arange(4) + 0.5) / 4.0
    v = np.full(4, 0.5 / 3.0, np.float32)
    got = np.asarray(sample2d(tex, u, v, filter_linear=False))
    np.testing.assert_array_equal(got[:, 0], [0, 1, 2, 3])


def test_bilinear_at_center_is_exact():
    rng = np.random.default_rng(0)
    tex = rng.random((8, 8, 3), np.float32)
    u = (np.arange(8) + 0.5) / 8.0
    v = np.full(8, (2 + 0.5) / 8.0, np.float32)
    got = np.asarray(sample2d(tex, u, v, filter_linear=True))
    np.testing.assert_allclose(got, tex[2], atol=1e-6)


def test_bilinear_midpoint_average():
    tex = np.zeros((1, 2, 1), np.float32)
    tex[0, 0, 0] = 0.0
    tex[0, 1, 0] = 1.0
    got = np.asarray(sample2d(tex, np.float32(0.5), np.float32(0.5), filter_linear=True))
    np.testing.assert_allclose(got, [0.5], atol=1e-6)


def test_border_returns_zero():
    tex = np.ones((4, 4, 4), np.float32)
    got = np.asarray(
        sample2d(
            tex,
            np.float32(-0.5),
            np.float32(0.5),
            filter_linear=False,
            wrap_mode="clamp_to_border",
        )
    )
    np.testing.assert_array_equal(got, [0, 0, 0, 0])


def test_repeat_tiles():
    tex = np.arange(4, dtype=np.float32).reshape(1, 4, 1)
    got = np.asarray(
        sample2d(
            tex,
            np.float32(1.0 + 0.5 / 4),
            np.float32(0.5),
            filter_linear=False,
            wrap_mode="repeat",
        )
    )
    np.testing.assert_array_equal(got, [0.0])


def test_grid_shaped_coords():
    rng = np.random.default_rng(1)
    tex = rng.random((6, 5, 4), np.float32)
    u = rng.random((7, 9), np.float32)
    v = rng.random((7, 9), np.float32)
    got = np.asarray(sample2d(tex, u, v, filter_linear=True))
    assert got.shape == (7, 9, 4)
    want = reference_sample2d_numpy(
        tex, u, v, filter_linear=True, wrap_mode="clamp_to_edge"
    )
    np.testing.assert_allclose(got, want, atol=2e-6)


def test_pallas_resample_u8_fallback_matches_einsum():
    """resample_u8 (einsum fallback on CPU) matches quantized two-einsum."""
    import jax.numpy as jnp

    from retrocapture_tpu.ops.pallas.resample import _einsum_fallback, resample_u8
    from retrocapture_tpu.ops.sampling import _axis_matrix

    rng = np.random.default_rng(3)
    tex = jnp.asarray(rng.random((24, 32, 3)).astype(np.float32))
    u = ((np.arange(64) + 0.5) / 64).astype(np.float32)
    v = ((np.arange(48) + 0.5) / 48).astype(np.float32)
    ax = _axis_matrix(u, 32, True, "clamp_to_edge")
    ay = _axis_matrix(v, 24, True, "clamp_to_edge")
    a = np.asarray(resample_u8(tex, ay, ax))
    b = np.asarray(_einsum_fallback(tex, jnp.asarray(ay), jnp.asarray(ax)))
    assert a.dtype == np.uint8
    np.testing.assert_array_equal(a, b)
