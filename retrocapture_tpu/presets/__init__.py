from retrocapture_tpu.presets.glslp import Preset, PassConfig, TextureConfig

__all__ = ["Preset", "PassConfig", "TextureConfig"]
