"""Paths / scanner / config-model tests."""

import json

import numpy as np
import pytest


def test_paths_respect_xdg(tmp_path, monkeypatch):
    monkeypatch.setenv("XDG_CONFIG_HOME", str(tmp_path / "cfg"))
    monkeypatch.setenv("XDG_DATA_HOME", str(tmp_path / "data"))
    monkeypatch.setenv("XDG_CACHE_HOME", str(tmp_path / "cache"))
    from retrocapture_tpu.utils import paths

    assert str(paths.config_dir()).startswith(str(tmp_path / "cfg"))
    assert str(paths.data_dir()).startswith(str(tmp_path / "data"))
    assert str(paths.log_file()).startswith(str(tmp_path / "cache"))


def test_scanner_finds_presets(shader_root):
    from retrocapture_tpu.utils.scanner import scan_presets

    found = list(scan_presets(shader_root))
    assert len(found) == 489
    assert all(p.suffix == ".glslp" for p in found)


def test_scanner_env_override(tmp_path, monkeypatch):
    (tmp_path / "sub").mkdir()
    (tmp_path / "sub" / "a.glslp").write_text("shaders = 0\n")
    monkeypatch.setenv("RETROCAPTURE_SHADER_PATH", str(tmp_path))
    from retrocapture_tpu.utils.scanner import default_shader_root, scan_presets

    assert default_shader_root() == tmp_path
    assert [p.name for p in scan_presets()] == ["a.glslp"]


def test_config_roundtrip(tmp_path, monkeypatch):
    monkeypatch.setenv("XDG_CONFIG_HOME", str(tmp_path))
    from retrocapture_tpu.runtime.config import CoreConfig

    cfg = CoreConfig(preset="x.glslp", parameters={"A": 1.5}, brightness=1.2)
    cfg.save()
    loaded = CoreConfig.load()
    assert loaded.preset == "x.glslp"
    assert loaded.parameters == {"A": 1.5}
    assert loaded.brightness == 1.2
    # corrupt file degrades to defaults
    CoreConfig.path().write_text("{not json")
    assert CoreConfig.load().preset == ""


def test_profile_manager(tmp_path, monkeypatch):
    monkeypatch.setenv("XDG_DATA_HOME", str(tmp_path))
    from retrocapture_tpu.runtime.config import CoreConfig, ProfileManager

    pm = ProfileManager()
    pm.save("crt", CoreConfig(preset="crt.glslp"))
    pm.save("ntsc", CoreConfig(preset="ntsc.glslp"))
    assert pm.list() == ["crt", "ntsc"]
    assert pm.load("crt").preset == "crt.glslp"
    assert pm.load("nope") is None
    assert pm.delete("crt")
    assert pm.list() == ["ntsc"]


def test_config_applies_to_engine(tmp_path, monkeypatch, shader_root):
    monkeypatch.setenv("XDG_CONFIG_HOME", str(tmp_path))
    from retrocapture_tpu import Engine
    from retrocapture_tpu.runtime.config import CoreConfig

    cfg = CoreConfig(
        preset=str(shader_root / "crt/crt-mattias.glslp"),
        parameters={"CURVATURE": 0.25},
        viewport=[64, 48],
    )
    e = Engine()
    cfg.apply_to(e)
    assert e.shader_active
    assert e.get_parameter("CURVATURE") == 0.25
    out = np.asarray(e.apply(np.zeros((24, 32, 3), np.uint8)))
    assert out.shape == (48, 64, 3)


def test_frame_stats():
    import time

    from retrocapture_tpu.utils.metrics import FrameStats, Timer

    s = FrameStats()
    with Timer(s, n_frames=4):
        time.sleep(0.01)
    s.tick(4, latency_s=0.02)
    snap = s.snapshot()
    assert snap["frames"] == 8
    assert snap["batches"] == 2
    assert snap["latency_p50_ms"] >= 10.0
    assert snap["fps_ema"] > 0
