"""The xbr-lv2 hand kernel (graph/kernels._xbr_lv2_kernel) vs the
generic GLSL evaluator, end-to-end through the Engine on CPU.

The kernel factors the tap + edge-detection section to an
[out_h, src_w] grid (exact per-offset y one-hot gathers reproduce the
f32 boundary flips of the affine sampler) and hands off to full width
through one channel-major one-hot matmul; agreement with the evaluator
must stay within one RGBA8 quantization level on every geometry,
including non-integer y ratios (4.5x) where f32 flips occur."""

import os

import numpy as np
import pytest


GEOMETRIES = [
    (48, 64, 256, 144),   # integer ratios, no flips
    (60, 80, 480, 270),   # y ratio 4.5: f32 boundary flips
    (48, 64, 384, 216),   # y ratio 4.5 at another size
    (30, 40, 240, 135),
]

PRESET = "/root/reference/shaders/shaders_glsl/xbr/xbr-lv2.glslp"


def _run(viewport, frame, kernels):
    from retrocapture_tpu.runtime.engine import Engine

    old = os.environ.get("RCTPU_KERNELS")
    os.environ["RCTPU_KERNELS"] = kernels
    try:
        e = Engine(viewport=viewport)
        assert e.load_preset(PRESET), e.last_error
        return np.asarray(e.apply(frame))
    finally:
        if old is None:
            os.environ.pop("RCTPU_KERNELS", None)
        else:
            os.environ["RCTPU_KERNELS"] = old


@pytest.mark.parametrize("h,w,vw,vh", GEOMETRIES)
def test_xbr_kernel_matches_evaluator(h, w, vw, vh):
    rng = np.random.default_rng(7)
    frame = (rng.random((h, w, 3)) * 255).astype(np.uint8)
    out_k = _run((vw, vh), frame, "interpret")
    out_e = _run((vw, vh), frame, "off")
    assert out_k.shape == out_e.shape == (vh, vw, 3)
    err = np.abs(out_k - out_e).max()
    # one RGBA8 quantization level: boundary rounding only
    assert err <= 1.5 / 255.0, err


def test_xbr_kernel_small_details_branch():
    """small_details=1 uses the weighted_distance/Y-luma variant whose
    step() comparisons sit on exact ties for random input — f32
    summation-order differences between the kernel and the evaluator
    legitimately flip sparse edge decisions (real GL flips its own set:
    both implementations measure ~20 dB vs llvmpipe on noise, and are
    bit-exact on structured frames). Assert agreement at PSNR level."""
    rng = np.random.default_rng(9)
    frame = (rng.random((48, 64, 3)) * 255).astype(np.uint8)
    from retrocapture_tpu.runtime.engine import Engine

    outs = []
    for kernels in ("interpret", "off"):
        os.environ["RCTPU_KERNELS"] = kernels
        try:
            e = Engine(viewport=(256, 144))
            assert e.load_preset(PRESET)
            e.set_parameter("small_details", 1.0)
            outs.append(np.asarray(e.apply(frame)))
        finally:
            os.environ.pop("RCTPU_KERNELS", None)
    mse = float(((outs[0] - outs[1]) ** 2).mean())
    psnr = 10.0 * np.log10(1.0 / mse) if mse else float("inf")
    assert psnr >= 40.0, psnr
