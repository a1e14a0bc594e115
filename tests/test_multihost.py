"""Multi-host helpers (parallel/multihost.py) on the single-process
virtual mesh: init() no-ops, the media-plane batch assembly shards over
'data', and the control-plane broadcast round-trips."""

import numpy as np


def test_init_single_host_noop():
    from retrocapture_tpu.parallel import multihost

    # no coordinator configured -> single-host path, never raises
    assert multihost.is_distributed() is False


def test_global_frame_batch_shards_over_data():
    import jax

    from retrocapture_tpu.parallel import multihost
    from retrocapture_tpu.parallel.mesh import DATA_AXIS, make_mesh

    mesh = make_mesh(4, 2, devices=jax.devices()[:8])
    frames = (np.random.default_rng(0).random((8, 16, 24, 3)) * 255).astype(
        np.uint8
    )
    out = multihost.global_frame_batch(frames, mesh)
    assert out.shape == frames.shape
    spec = out.sharding.spec
    assert spec[0] == DATA_AXIS
    np.testing.assert_array_equal(np.asarray(out), frames)


def test_broadcast_meta_single_host():
    from retrocapture_tpu.parallel import multihost

    meta = {"preset": "crt/crt-mattias.glslp", "parameters": {"CURVATURE": 0.3}}
    assert multihost.broadcast_meta(meta) == meta
