"""FramePipeline + max-resolution clamp + thumbnail tests."""

import numpy as np
import pytest

from retrocapture_tpu import Engine
from retrocapture_tpu.runtime.pipeline import FramePipeline, ImageSettings

SH = "/root/reference/shaders/shaders_glsl/"


def frame(h=48, w=64, value=128):
    return np.full((h, w, 3), value, np.uint8)


def test_logical_resolution_downscale():
    e = Engine()
    p = FramePipeline(e, logical_resolution=(32, 24))
    out = np.asarray(p.process(frame()))
    # passthrough engine keeps logical size
    assert out.shape == (24, 32, 3)


def test_overscan_crops_border():
    f = frame()
    f[:4, :, :] = 255  # bright top border
    e = Engine()
    p = FramePipeline(e, overscan_percent=(10.0, 10.0))
    out = np.asarray(p.process(f))
    assert out.shape == (48, 64, 3)
    # top border cropped away: no 255s remain
    assert out.max() < 0.99


def test_brightness_contrast_flip():
    f = frame(value=100)
    f[0, :, :] = 200  # marker row at top
    e = Engine()
    p = FramePipeline(
        e, image=ImageSettings(brightness=1.5, contrast=1.0, flip_y=True)
    )
    out = np.asarray(p.process(f))
    base = 100 / 255 * 1.5
    assert abs(float(out[5, 5, 0]) - base) < 0.02
    # flipped: the marker row is now at the bottom
    assert out[-1].mean() > out[0].mean()


def test_maintain_aspect_letterbox():
    e = Engine()
    p = FramePipeline(
        e,
        window=(128, 48),  # much wider than 64x48 source -> pillarbox
        image=ImageSettings(maintain_aspect=True),
    )
    out = np.asarray(p.process(frame(value=200)))
    assert out.shape == (48, 128, 3)
    assert out[:, 0].max() == 0.0  # black bars left
    assert out[:, -1].max() == 0.0  # and right
    assert out[:, 64].mean() > 0.5  # content in the middle


def test_max_shader_resolution_clamp():
    from retrocapture_tpu.io.testpattern import TestPatternSource

    src = TestPatternSource(128, 96).capture_frame()
    e = Engine(viewport=(64, 48))
    assert e.load_preset(SH + "crt/crt-mattias.glslp"), e.last_error
    e.set_max_shader_resolution(32, 24)
    out = np.asarray(e.apply(src))
    assert out.shape == (48, 64, 3)
    assert np.isfinite(out).all()
    # and produces a different (lower-res-sourced) image than unclamped
    e2 = Engine(viewport=(64, 48))
    assert e2.load_preset(SH + "crt/crt-mattias.glslp")
    out2 = np.asarray(e2.apply(src))
    assert np.abs(out - out2).mean() > 1e-5


def test_thumbnail_generation(tmp_path):
    from retrocapture_tpu.utils.thumbnails import generate_preset_thumbnail

    dest = tmp_path / "thumb.png"
    ok = generate_preset_thumbnail(
        SH + "crt/crt-mattias.glslp", dest, size=(64, 48)
    )
    assert ok and dest.is_file()
    from PIL import Image

    with Image.open(dest) as im:
        assert im.size == (64, 48)
    # failing preset -> no thumbnail
    assert not generate_preset_thumbnail("/nonexistent.glslp", tmp_path / "x.png")
