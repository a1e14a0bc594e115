"""Test configuration: force an 8-device virtual CPU mesh so multi-chip
sharding paths are exercised without TPU hardware (the driver separately
dry-runs the multi-chip path; bench.py runs on the real chip)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pathlib

import pytest

REFERENCE = pathlib.Path("/root/reference")
SHADERS = REFERENCE / "shaders" / "shaders_glsl"


@pytest.fixture(scope="session")
def shader_root() -> pathlib.Path:
    if not SHADERS.is_dir():
        pytest.skip("reference shader tree not available")
    return SHADERS


@pytest.fixture(scope="session")
def reference_root() -> pathlib.Path:
    if not REFERENCE.is_dir():
        pytest.skip("reference tree not available")
    return REFERENCE
