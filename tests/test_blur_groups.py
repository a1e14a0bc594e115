"""The warped multi-group blur kernel (ops/pallas/blur_groups.py) vs a
float64 NumPy reference using the same rank-2 weight factorization.
Runs the Pallas kernel in interpreter mode on CPU with small shapes;
the chip path is exercised by bench.py and the TPU golden tests."""

import numpy as np
import pytest

pytest.importorskip("jax.experimental.pallas")


def _mattias_groups(ow, oh):
    from retrocapture_tpu.graph.kernels import _MATTIAS_GROUPS, _MATTIAS_W
    from retrocapture_tpu.ops.pallas.blur_groups import BlurGroup

    groups = []
    for ch, bx, by, offs, scale, _ in _MATTIAS_GROUPS:
        xo = [np.float32(offs * k) / np.float32(ow) for k in (-2.0, -1.0, 0.0, 1.0, 2.0)]
        yo = [np.float32(offs * k) / np.float32(oh) for k in (-2.0, -1.0, 0.0, 1.0, 2.0)]
        groups.append(BlurGroup(ch, bx, by, xo, yo, _MATTIAS_W, scale))
    return groups


def _ref_planes(texn, uv_u, uv_v, groups, h, w, *, rank2: bool):
    """NumPy float64 reference. rank2=True mirrors the v1 kernel's SVD
    weight factorization; rank2=False uses the exact 5x5 weights (v2)."""
    from retrocapture_tpu.ops.pallas.blur_groups import _rank2

    out = {}
    for g in groups:
        if rank2:
            facs, _ = _rank2(g.weights * g.scale)
            w2 = sum(np.outer(ay, ax) for ax, ay in facs)
        else:
            w2 = (g.weights * g.scale).astype(np.float32)
        ug = (uv_u + np.float32(g.bx)).astype(np.float32)
        vg = (uv_v + np.float32(g.by)).astype(np.float32)
        acc = out.setdefault(g.channel, np.zeros(uv_u.shape, np.float64))
        for j, yo in enumerate(g.yo):
            iy = np.clip(
                np.floor((vg + np.float32(yo)) * np.float32(h)).astype(np.int64),
                0, h - 1,
            )
            for i, xo in enumerate(g.xo):
                ix = np.clip(
                    np.floor((ug + np.float32(xo)) * np.float32(w)).astype(np.int64),
                    0, w - 1,
                )
                acc += w2[j, i] * texn[iy, ix, g.channel]
    return out


@pytest.mark.parametrize("formulation", ["v1", "v2"])
def test_blur_groups_matches_reference_interpret(formulation, monkeypatch):
    import jax.numpy as jnp

    from retrocapture_tpu.graph.kernels import _mattias_curve
    from retrocapture_tpu.ops.pallas.blur_groups import blur5x5_groups

    monkeypatch.setenv("RCTPU_BLUR", formulation)
    h, w = 60, 80
    oh, ow = 128, 256  # small but still multi-tile
    rng = np.random.default_rng(11)
    texn = rng.random((h, w, 3)).astype(np.float32)
    xg, yg = np.meshgrid(
        (np.arange(ow) + 0.5) / ow, (np.arange(oh) + 0.5) / oh
    )
    cu, cv = _mattias_curve(xg.astype(np.float32), yg.astype(np.float32))
    uv_u = (xg + (np.asarray(cu) - xg) * 0.5).astype(np.float32)
    uv_v = (yg + (np.asarray(cv) - yg) * 0.5).astype(np.float32)

    groups = _mattias_groups(ow, oh)
    planes = blur5x5_groups(
        jnp.asarray(texn), jnp.asarray(uv_u), jnp.asarray(uv_v), groups,
        interpret=True,
    )
    ref = _ref_planes(
        texn, uv_u, uv_v, groups, h, w, rank2=formulation == "v1"
    )
    for ch in (0, 1, 2):
        d = np.abs(np.asarray(planes[ch]).astype(np.float64) - ref[ch])
        # Sub-ULP tap-coordinate boundaries ((u+offset)*W landing exactly
        # on an integer) may floor differently between the NumPy
        # reference and the backend — a one-texel difference on isolated
        # pixels, the same variability real GL rasterizers exhibit.
        # Require exactness away from boundaries and rarity at them.
        bad = (d > 1e-5).mean()
        assert bad < 5e-4, f"{formulation} channel {ch}: {bad:.2%} pixels differ"


def test_blur_groups_fits_static_checks():
    from retrocapture_tpu.ops.pallas.blur_groups import blur_groups_fits

    groups = _mattias_groups(1920, 1080)
    # Geometry checks only (device check last): a 240p source at 1080p
    # passes the window constraints; an enormous source fails VMEM.
    import jax

    expect = jax.devices()[0].platform in ("tpu", "axon")
    assert blur_groups_fits((240, 320, 3), (1080, 1920), groups) == expect
    assert not blur_groups_fits((2000, 2000, 3), (1080, 1920), groups)
