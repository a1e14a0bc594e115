"""io layer tests: frame queue/readback, test pattern, native framehost."""

import numpy as np
import pytest

from retrocapture_tpu.io.queue import DeviceReadback, FrameQueue, stream
from retrocapture_tpu.io.testpattern import TestPatternSource


def test_frame_queue_drop_oldest():
    q = FrameQueue(maxlen=3)
    for i in range(5):
        q.push(np.full((2, 2), i, np.uint8))
    assert len(q) == 3
    assert q.dropped == 2
    assert q.pop()[0, 0] == 2  # oldest two dropped


def test_frame_queue_batch():
    q = FrameQueue(maxlen=10)
    for i in range(4):
        q.push(np.full((2, 2), i, np.uint8))
    b = q.pop_batch(4, timeout=0.1)
    assert b.shape == (4, 2, 2)
    assert list(b[:, 0, 0]) == [0, 1, 2, 3]


def test_device_readback_one_frame_latency():
    rb = DeviceReadback()
    import jax.numpy as jnp

    assert rb.submit(jnp.ones((2, 2))) is None  # PBOManager.cpp:137
    out = rb.submit(jnp.zeros((2, 2)))
    assert out is not None and out[0, 0] == 1.0
    tail = rb.flush()
    assert tail[0, 0] == 0.0


def test_stream_pipeline():
    frames = [np.full((2, 2), i, np.uint8) for i in range(10)]
    outs = list(stream(iter(frames), lambda b: b.astype(np.float32), batch=4))
    assert len(outs) == 10
    assert outs[0][0, 0] == 0.0 and outs[9][0, 0] == 9.0


def test_testpattern_content():
    """The smoke-test content assertions (tools/smoke-test.sh:168-215)."""
    src = TestPatternSource(320, 240)
    f0 = src.capture_frame().astype(np.float32)
    f1 = src.capture_frame().astype(np.float32)
    assert f0.max() >= 180  # brightness
    assert f0.std() >= 20  # spatial structure
    # >= 5 distinct bar colors
    colors = {tuple(f0[10, x].astype(int)) for x in range(0, 320, 40)}
    assert len(colors) >= 5
    # temporal change (moving marker)
    assert np.abs(f1 - f0).mean() > 0.0


def test_native_framehost():
    native = pytest.importorskip("retrocapture_tpu.io.native")
    if not native.native_available():
        pytest.skip("libframehost.so not built")
    r = native.NativeRing(4, (2, 2, 3))
    for i in range(6):
        r.push(np.full((2, 2, 3), i, np.uint8))
    f, discarded = r.pop_latest()
    assert f[0, 0, 0] == 5 and discarded == 3
    assert r.stats["dropped"] == 2
    assert r.pop_latest() is None

    tp = native.testpattern(64, 48, 0)
    assert tp.shape == (48, 64, 3)
    assert tp[0, 0].tolist() == [255, 255, 255]

    # BT.601 parity with the device converter (fixed-point rounding only)
    import jax.numpy as jnp

    from retrocapture_tpu.ops.colorspace import yuyv_to_rgb

    raw = np.random.default_rng(0).integers(0, 256, (16, 64), np.uint8)
    a = native.yuyv_to_rgb24(raw, 32, 16).astype(np.float32) / 255.0
    b = np.asarray(yuyv_to_rgb(jnp.asarray(raw), 32, 16))
    assert np.abs(a - b).max() < 0.01
