"""Round-5: xbr batch-cliff probe (VERDICT r4 #4).

Measures xbr-lv2 (hand kernel, phase-factored vs dense tail via
RCTPU_XBR) and xbr-lv3 (pure evaluator — the non-registry neighborhood
preset) across batch sizes on the chip. The dense tail materializes
[19, oh, ow] f32 per frame (~158 MB at 1080p) and OOMs HBM at batch 64;
the phase tail keeps the blend fused in [oh, w, r] space.

    python tools/probe_xbr_batch.py [xbr-lv2|xbr-lv3] [dense|phase] B...
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import os

PRESETS = {
    "xbr-lv2": "/root/reference/shaders/shaders_glsl/xbr/xbr-lv2.glslp",
    "xbr-lv3": "/root/reference/shaders/shaders_glsl/xbr/xbr-lv3.glslp",
}


def main() -> int:
    which = sys.argv[1] if len(sys.argv) > 1 else "xbr-lv2"
    tail = sys.argv[2] if len(sys.argv) > 2 else "auto"
    batches = [int(b) for b in sys.argv[3:]] or [32, 64, 128]
    os.environ["RCTPU_XBR"] = tail

    import jax
    import jax.numpy as jnp

    from retrocapture_tpu.runtime.engine import Engine

    dev = jax.devices()[0]
    print(f"device={dev} tail={tail} preset={which}", flush=True)
    rng = np.random.default_rng(0)
    sync = jax.jit(lambda x: jnp.sum(x[..., ::64, ::64, :].astype(jnp.float32)))

    for batch in batches:
        e = Engine(viewport=(1920, 1080))
        assert e.load_preset(PRESETS[which]), e.last_error
        raw = jnp.asarray(
            (rng.random((batch, 240, 320, 3)) * 255).astype(np.uint8)
        )
        vary = jax.jit(lambda f, k: f ^ k)
        k = [0]

        def produce():
            k[0] += 1
            return vary(raw, jnp.uint8(k[0] % 251))

        try:
            t0 = time.time()
            out = e.apply(produce(), output="u8")
            float(sync(out))
            compile_s = time.time() - t0
            best = 0.0
            for _ in range(3):
                iters = 8
                t0 = time.time()
                for i in range(iters):
                    out = e.apply(produce(), output="u8")
                    f = sync(out)
                float(f)
                fps = batch * iters / (time.time() - t0)
                best = max(best, fps)
            print(
                f"batch={batch}: {best:.1f} fps ({1000.0 / best * batch:.2f} "
                f"ms/dispatch, compile {compile_s:.1f}s)",
                flush=True,
            )
        except Exception as ex:  # noqa: BLE001
            print(f"batch={batch}: ERROR {type(ex).__name__}: {str(ex)[:200]}", flush=True)
        del e
    return 0


if __name__ == "__main__":
    sys.exit(main())
