"""Profile where cold-compile time goes for the BASELINE bench configs.

For each config: trace (jax .lower) the exact batched program bench.py
runs, then compile it on the local CPU backend. Reports trace seconds,
StableHLO text size (a proxy for program size XLA has to chew), and
CPU-backend compile seconds. Run with JAX_PLATFORMS=cpu.

Usage: JAX_PLATFORMS=cpu python tools/profile_compile.py [config ...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

SHADERS = Path("/root/reference/shaders/shaders_glsl")

CONFIGS = {
    "scanline-320": (SHADERS / "interpolation/sharp-bilinear-scanlines.glslp", (240, 320), 128, "rgb"),
    "xbr-lv2-1080p": (SHADERS / "xbr/xbr-lv2.glslp", (240, 320), 32, "rgb"),
    "crt-mattias-1080p": (SHADERS / "crt/crt-mattias.glslp", (240, 320), 32, "rgb"),
    "ntsc-320px": (SHADERS / "ntsc/ntsc-320px.glslp", (240, 320), 128, "rgb"),
    "feedback-ghost-nv12": (REPO / "assets/presets/feedback-ghost.glslp", (240, 320), 128, "nv12"),
}


def profile(name: str, compile_too: bool = True) -> dict:
    import jax
    import jax.numpy as jnp

    from retrocapture_tpu.runtime.engine import Engine

    preset, (h, w), batch, fmt = CONFIGS[name]
    e = Engine(viewport=(1920, 1080))
    assert e.load_preset(str(preset)), e.last_error
    e.set_input_format(fmt)
    rng = np.random.default_rng(0)
    if fmt == "nv12":
        raw = jnp.asarray((rng.random((batch, h + h // 2, w)) * 255).astype(np.uint8))
    else:
        raw = jnp.asarray((rng.random((batch, h, w, 3)) * 255).astype(np.uint8))

    key = (h, w, 1920, 1080)
    state = e._get_state(key, jnp.float32)
    fn = e._get_jit(key, u8=True)

    t0 = time.time()
    lowered = fn.lower(raw, state)
    t_trace = time.time() - t0

    t0 = time.time()
    txt = lowered.as_text()
    t_text = time.time() - t0
    n_lines = txt.count("\n")

    r = {
        "name": name,
        "trace_s": round(t_trace, 1),
        "stablehlo_mb": round(len(txt) / 1e6, 1),
        "stablehlo_lines": n_lines,
        "text_s": round(t_text, 1),
    }
    if compile_too:
        t0 = time.time()
        compiled = lowered.compile()
        r["compile_s"] = round(time.time() - t0, 1)
        try:
            r["exec_bytes_mb"] = round(
                compiled.memory_analysis().serialized_size_in_bytes / 1e6, 1
            )
        except Exception:
            pass
    print(r, flush=True)
    return r


if __name__ == "__main__":
    names = sys.argv[1:] or list(CONFIGS)
    for n in names:
        profile(n)
