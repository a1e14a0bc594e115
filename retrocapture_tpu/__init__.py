"""retrocapture_tpu — a TPU-native retro-shader video-processing framework.

A from-scratch reimplementation of the frame-processing core of
geldoronie/RetroCapture (reference: /root/reference/src/{shader,processing,
renderer}) designed TPU-first: RetroArch ``.glslp`` presets are parsed,
their GLSL passes are lowered to JAX/XLA (with Pallas kernels on the hot
paths), and multi-pass chains execute as fused, jit-compiled programs over
batched ``[B, H, W, 3]`` frame tensors.

Public API (mirrors the reference's ShaderEngine contract,
src/shader/ShaderEngine.h:54-93):

    from retrocapture_tpu import Engine
    eng = Engine()
    eng.load_preset("crt/crt-mattias.glslp")
    eng.set_parameter("CURVATURE", 0.3)
    out = eng.apply(frames)          # frames: uint8/float32 [H,W,3] or [B,H,W,3]
"""

__version__ = "0.1.0"


def _enable_compile_cache() -> None:
    """Persistent XLA compilation cache (shape-specialized chains retrace
    per (source, viewport) pair; without a disk cache every process pays
    the compile-server round trip again — measured 17.6 s -> 0.4 s for an
    identical program across processes on the TPU tunnel). Opt out with
    ``RETROCAPTURE_COMPILE_CACHE=off``; override the location with
    ``RETROCAPTURE_COMPILE_CACHE=<dir>``."""
    import os

    loc = os.environ.get("RETROCAPTURE_COMPILE_CACHE", "")
    if loc == "off":
        return
    try:
        import jax

        if not loc:
            from retrocapture_tpu.utils.paths import cache_dir

            loc = str(cache_dir() / "xla")
        os.makedirs(loc, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", loc)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # noqa: BLE001 - cache is an optimization only
        pass


_enable_compile_cache()

from retrocapture_tpu.presets.glslp import Preset, PassConfig, TextureConfig
from retrocapture_tpu.runtime.engine import Engine

__all__ = [
    "Engine",
    "Preset",
    "PassConfig",
    "TextureConfig",
    "__version__",
]
