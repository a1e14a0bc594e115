"""Round-3: bisect WHERE the minutes-long TPU cold compiles go.

The CPU backend compiles the same engine programs in <1 s from ~0.2 MB
of StableHLO (tools/profile_compile.py), so the blowup is TPU-backend
XLA passes / Mosaic, not trace size. This probe times trace (.lower)
and TPU .compile() for one bench config under feature kill-switches so
the costly component is identified by ablation, with the persistent
compile cache DISABLED so every timing is a true cold compile.

Usage: python tools/profile_compile_tpu.py <config> [flag=0 ...]
e.g.   python tools/profile_compile_tpu.py scanline-320 RCTPU_KERNELS=0
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

# Must be set before importing retrocapture_tpu (it installs the cache).
os.environ["RETROCAPTURE_COMPILE_CACHE"] = "off"
for arg in sys.argv[2:]:
    k, _, v = arg.partition("=")
    os.environ[k] = v

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import retrocapture_tpu  # noqa: F401
import jax
import jax.numpy as jnp

from retrocapture_tpu.runtime.engine import Engine

SHADERS = Path("/root/reference/shaders/shaders_glsl")

CONFIGS = {
    "scanline-320": (SHADERS / "interpolation/sharp-bilinear-scanlines.glslp", (240, 320), 128, "rgb"),
    "xbr-lv2-1080p": (SHADERS / "xbr/xbr-lv2.glslp", (240, 320), 32, "rgb"),
    "crt-mattias-1080p": (SHADERS / "crt/crt-mattias.glslp", (240, 320), 32, "rgb"),
    "ntsc-320px": (SHADERS / "ntsc/ntsc-320px.glslp", (240, 320), 128, "rgb"),
    "feedback-ghost-nv12": (REPO / "assets/presets/feedback-ghost.glslp", (240, 320), 128, "nv12"),
}


def main():
    name = sys.argv[1]
    preset, (h, w), batch, fmt = CONFIGS[name]
    dev = jax.devices()[0]
    print(f"device: {dev} platform={dev.platform} flags={sys.argv[2:]}", flush=True)

    e = Engine(viewport=(1920, 1080))
    assert e.load_preset(str(preset)), e.last_error
    e.set_input_format(fmt)
    rng = np.random.default_rng(0)
    if fmt == "nv12":
        raw = jnp.asarray((rng.random((batch, h + h // 2, w)) * 255).astype(np.uint8))
    else:
        raw = jnp.asarray((rng.random((batch, h, w, 3)) * 255).astype(np.uint8))

    t0 = time.time()
    out = e.apply(raw, output="u8")
    jax.block_until_ready(out)
    print(f"{name}: first apply (trace+compile+run) = {time.time() - t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
