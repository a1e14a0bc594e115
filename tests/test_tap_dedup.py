"""Cross-tap dedup for NEAREST matmul taps (ops/sampling.tap_dedup_scope).

Neighborhood shaders (xbr's edge rules) sample one texture at coords
differing by integer texel offsets; inside a dedup scope those taps must
share y-products and extended x-planes while staying BIT-IDENTICAL to
the plain per-tap lowering (the one-hot selection makes equal indices
give equal values, so any mismatch is a real indexing bug)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from retrocapture_tpu.ops import sampling
from retrocapture_tpu.ops.sampling import sample2d, tap_dedup_scope

H, W = 48, 64  # source
OH, OW = 216, 384  # viewport: x period 6 (like 320->1920), y ratio 4.5


def _tap_coords(dx: int, dy: int):
    """Shader-style f32 tap coords: pixel-center grid + texel offsets."""
    u = (np.arange(OW, dtype=np.float32) + np.float32(0.5)) / np.float32(OW)
    v = (np.arange(OH, dtype=np.float32) + np.float32(0.5)) / np.float32(OH)
    u = u + np.float32(dx) / np.float32(W)
    v = v + np.float32(dy) / np.float32(H)
    uu = np.broadcast_to(u[None, :], (OH, OW)).copy()
    vv = np.broadcast_to(v[:, None], (OH, OW)).copy()
    return uu, vv


XBR_CROSS = [
    (dx, dy)
    for dx in (-2, -1, 0, 1, 2)
    for dy in (-2, -1, 0, 1, 2)
    if abs(dx) + abs(dy) <= 3
]


@pytest.mark.parametrize(
    "wrap", ["clamp_to_edge", "repeat", "mirrored_repeat", "clamp_to_border"]
)
@pytest.mark.parametrize("quant", [False, True])
def test_dedup_bit_identical(wrap, quant):
    rng = np.random.default_rng(7)
    if quant:
        tex = (rng.integers(0, 256, (H, W, 3)).astype(np.float32)) / np.float32(255.0)
    else:
        tex = rng.random((H, W, 3), dtype=np.float32)
    tex = jnp.asarray(tex)

    plain, shared = [], []
    for dx, dy in XBR_CROSS:
        u, v = _tap_coords(dx, dy)
        plain.append(
            np.asarray(
                sample2d(
                    tex, u, v, filter_linear=False, wrap_mode=wrap, quantized_u8=quant
                )
            )
        )
    with tap_dedup_scope():
        for dx, dy in XBR_CROSS:
            u, v = _tap_coords(dx, dy)
            shared.append(
                np.asarray(
                    sample2d(
                        tex,
                        u,
                        v,
                        filter_linear=False,
                        wrap_mode=wrap,
                        quantized_u8=quant,
                    )
                )
            )
    for (dx, dy), a, b in zip(XBR_CROSS, plain, shared):
        assert np.array_equal(a, b), f"tap ({dx},{dy}) diverged under dedup"


def test_dedup_shares_x_matmuls():
    """Inside one traced chain the x-matmul count must collapse to the
    distinct dy count (xbr cross: 5), not the tap count (19)."""
    tex0 = np.random.default_rng(0).random((H, W, 3), dtype=np.float32)

    def taps(tex):
        outs = []
        with tap_dedup_scope():
            for dx, dy in XBR_CROSS:
                u, v = _tap_coords(dx, dy)
                outs.append(
                    sample2d(tex, u, v, filter_linear=False, wrap_mode="clamp_to_edge")
                )
        return sum(outs)

    jaxpr = jax.make_jaxpr(taps)(tex0)
    dots = str(jaxpr).count("dot_general")
    n_dy = len({dy for _, dy in XBR_CROSS})
    # y-matmuls: one per distinct dy; x-matmuls: one extended plane per
    # distinct dy. Anything at tap-count scale means dedup didn't engage.
    assert dots <= 2 * n_dy, f"{dots} dot_generals for {len(XBR_CROSS)} taps"


def test_dedup_scope_restores_global():
    assert sampling._tap_dedup() is None
    with tap_dedup_scope():
        assert sampling._tap_dedup() == {}
        with tap_dedup_scope():
            assert sampling._tap_dedup() == {}
        assert sampling._tap_dedup() == {}
    assert sampling._tap_dedup() is None


def test_dedup_scope_is_context_local():
    """Two threads tracing concurrently must not share a dedup dict
    (advisor round-2 finding): each thread entering the scope sees its
    own dict, and a thread that never entered sees None."""
    import threading

    results = {}

    def worker(name, enter):
        if enter:
            with tap_dedup_scope():
                sampling._tap_dedup()["k"] = name
                import time

                time.sleep(0.05)
                results[name] = sampling._tap_dedup().get("k")
        else:
            results[name] = sampling._tap_dedup()

    ts = [
        threading.Thread(target=worker, args=("a", True)),
        threading.Thread(target=worker, args=("b", True)),
        threading.Thread(target=worker, args=("out", False)),
    ]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert results == {"a": "a", "b": "b", "out": None}


def test_dedup_nonperiodic_falls_back():
    """Warped/non-periodic concrete grids must still produce exact
    results (falls back to plain matmuls inside the scope)."""
    rng = np.random.default_rng(3)
    tex = jnp.asarray(rng.random((H, W, 3), dtype=np.float32))
    u = (np.arange(OW, dtype=np.float32) ** 1.3 / OW**1.3).astype(np.float32)
    v = (np.arange(OH, dtype=np.float32) + 0.5) / np.float32(OH)
    uu = np.broadcast_to(u[None, :], (OH, OW)).copy()
    vv = np.broadcast_to(v[:, None], (OH, OW)).copy()
    a = np.asarray(sample2d(tex, uu, vv, filter_linear=False))
    with tap_dedup_scope():
        b = np.asarray(sample2d(tex, uu, vv, filter_linear=False))
    assert np.array_equal(a, b)
