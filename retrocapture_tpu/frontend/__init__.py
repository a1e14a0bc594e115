from retrocapture_tpu.frontend.cpp import Preprocessor, PragmaParameter, preprocess

__all__ = ["Preprocessor", "PragmaParameter", "preprocess"]
