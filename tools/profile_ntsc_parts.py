"""Round-3: honest per-pass itemization of ntsc-320px on the chip.

Ablation-times the bench config (batch 128, u8 output, lagged fences,
value-varying inputs) against a pass0-only variant of the preset, so
the pass1 (65-tap FIR) + blit delta is measured rather than inferred.
The earlier "pass1 = 1.02 ms/f (77%)" figure predates the hoisted-fence
fix and is revalidated here.

Usage: python tools/profile_ntsc_parts.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import retrocapture_tpu  # noqa: F401 - persistent compile cache
import jax
import jax.numpy as jnp

from retrocapture_tpu.runtime.engine import Engine

B, H, W = 128, 240, 320
SH = Path("/root/reference/shaders/shaders_glsl")

P0_ONLY = """shaders = 1
shader0 = {root}/ntsc/shaders/ntsc-pass1-composite-2phase.glsl
filter_linear0 = false
scale_type_x0 = absolute
scale_type_y0 = source
scale_x0 = 1280
scale_y0 = 1.0
frame_count_mod0 = 2
float_framebuffer0 = true
"""

_fence = jax.jit(lambda t: jnp.sum(t[..., ::64, ::64, :].astype(jnp.float32)))


def bench_engine(preset_path, label):
    e = Engine(viewport=(1920, 1080))
    assert e.load_preset(str(preset_path)), e.last_error
    rng = np.random.default_rng(0)
    raw = jnp.asarray((rng.random((B, H, W, 3)) * 255).astype(np.uint8))
    vary = jax.jit(lambda f, k: f ^ k)
    counter = [0]

    def produce():
        counter[0] += 1
        return vary(raw, jnp.uint8(counter[0] % 251))

    t0 = time.time()
    out = e.apply(produce(), output="u8")
    float(_fence(out))
    compile_s = time.time() - t0
    lag, stride = 2, 4
    best = None
    for _ in range(3):
        fences = []
        t0 = time.time()
        iters = 12
        for i in range(iters):
            out = e.apply(produce(), output="u8")
            fences.append(_fence(out))
            if i % stride == stride - 1 and i >= lag:
                float(fences[i - lag])
        float(_fence(out))
        dt = (time.time() - t0) / iters
        best = dt if best is None else min(best, dt)
    print(
        f"{label}: {best * 1e3:.2f} ms/call {best / B * 1e3:.4f} ms/f "
        f"compile={compile_s:.1f}s",
        flush=True,
    )
    return best / B * 1e3


def main():
    dev = jax.devices()[0]
    print(f"device: {dev} platform={dev.platform}", flush=True)
    p0 = Path("/tmp/ntsc_p0_only.glslp")
    p0.write_text(P0_ONLY.format(root=SH))
    full = bench_engine(SH / "ntsc/ntsc-320px.glslp", "full-chain")
    p0ms = bench_engine(p0, "pass0-only")
    print(f"delta (pass1 + narrower blit): {full - p0ms:.4f} ms/f", flush=True)


if __name__ == "__main__":
    main()
