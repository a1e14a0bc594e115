from retrocapture_tpu.parity.oracle import GLOracle, OracleEngine, psnr

__all__ = ["GLOracle", "OracleEngine", "psnr"]
