"""Test configuration: force an 8-device virtual CPU mesh so multi-chip
sharding paths are exercised without TPU hardware (the driver separately
dry-runs the multi-chip path; bench.py runs on the real chip)."""

import os

# The image's sitecustomize force-registers the `axon` TPU-tunnel PJRT
# backend in every interpreter and JAX_PLATFORMS=cpu from the env is NOT
# honored once it registers; eager ops through the tunnel cost ~1s each.
# jax.config.update IS honored — tests must run on host CPU with a virtual
# 8-device mesh for sharding coverage.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

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
