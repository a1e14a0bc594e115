"""Round-5: dispatch-floor probe (the carried scanline/feedback >=4000
gates).

Observation: scanline@128, feedback@128 and light probes all measure
~38-39 ms/dispatch regardless of device work — the bench loop is bound
by the relay dispatch pipeline, not the chip. fps = batch / floor, so
batch is the lever. Probes a config at growing batch sizes with the
bench's lagged-fence discipline and reports ms/dispatch + fps.

    python tools/probe_batch_floor.py <config-name> B...
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import bench  # noqa: E402 - CONFIGS + producer reuse


def main() -> int:
    name = sys.argv[1]
    batches = [int(b) for b in sys.argv[2:]] or [128, 256]
    cfg = next(c for c in bench.CONFIGS if c[0] == name)
    _, preset, shape, _, fmt = cfg

    import jax
    import jax.numpy as jnp

    from retrocapture_tpu.runtime.engine import Engine

    sync = jax.jit(lambda x: jnp.sum(x[..., ::64, ::64, :].astype(jnp.float32)))
    rng = np.random.default_rng(0)
    for batch in batches:
        try:
            e = Engine(viewport=bench.VIEWPORT)
            assert e.load_preset(str(preset)), e.last_error
            e.set_input_format(fmt)
            produce = bench._make_producer(rng, name, shape, batch, fmt)
            t0 = time.time()
            out = e.apply(produce(), output="u8")
            float(sync(out))
            comp = time.time() - t0
            lag, stride = 2, 4
            best = 0.0
            for _ in range(3):
                fences = []
                t0 = time.time()
                n = 0
                for i in range(16):
                    out = e.apply(produce(), output="u8")
                    fences.append(sync(out))
                    n += batch
                    if i % stride == stride - 1 and i >= lag:
                        float(fences[i - lag])
                float(sync(out))
                best = max(best, n / (time.time() - t0))
            print(
                f"{name} batch={batch}: {best:.1f} fps "
                f"({batch / best * 1e3:.1f} ms/dispatch, compile {comp:.1f}s)",
                flush=True,
            )
            del e
        except Exception as ex:  # noqa: BLE001
            print(f"{name} batch={batch}: ERROR {type(ex).__name__}: {str(ex)[:160]}",
                  flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
