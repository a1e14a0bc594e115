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

from retrocapture_tpu.presets.glslp import Preset, PassConfig, TextureConfig
from retrocapture_tpu.runtime.engine import Engine

__all__ = [
    "Engine",
    "Preset",
    "PassConfig",
    "TextureConfig",
    "__version__",
]
