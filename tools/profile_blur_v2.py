"""Round-3: A/B the crt-mattias blur kernel formulations on the chip.

v1 = shared per-channel kb=24 band, rank-2 weights, dense one-hot masks
     (~470 multi-vreg ops/row/channel, 9.36 ms/frame measured round 2).
v2 = per-group narrow windows + exact 5x5 weights + clip-hat tau
     routing + tile-vectorized weight arithmetic (ops/pallas/blur_groups
     module comment) — predicted ~3x fewer vreg-instructions.

Times the bare kernel (batch grid, value-varying inputs, lagged-fence
syncs) at the bench geometry (240x320 -> 1080p, batch 32), and
bit-compares v2 against v1 on a fixed probe input (expected: only the
rank-2-residual class differs, ~1e-4 max, under the RGBA8 quantizer).

Usage: python tools/profile_blur_v2.py [v1|v2 ...]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp

B, H, W = 32, 240, 320
OH, OW = 1080, 1920


_fence = jax.jit(lambda t: jnp.sum(t[..., ::64, ::64].astype(jnp.float32)))


def fence(x):
    # Hoisted jit: a fresh jax.jit(lambda ...) per call is a new function
    # identity -> retrace + compile-cache round trip every iteration.
    return _fence(x)


def timeit(fn, produce, iters=10, windows=3):
    out = fn(produce())
    float(fence(out[0]))
    times = []
    for _ in range(windows):
        fs = []
        t0 = time.time()
        for i in range(iters):
            out = fn(produce())
            fs.append(fence(out[0]))
            if i % 4 == 3 and i >= 2:
                float(fs[i - 2])
        float(fence(out[0]))
        times.append((time.time() - t0) / iters)
    return min(times)


def build(which):
    os.environ["RCTPU_BLUR"] = which
    from retrocapture_tpu.graph.kernels import _mattias_curve
    from retrocapture_tpu.ops.pallas.blur_groups import (
        _blur_groups_call,
        _blur_groups_call_v2,
    )

    sys.path.insert(0, str(REPO / "tests"))
    from test_blur_groups import _mattias_groups

    groups = _mattias_groups(OW, OH)
    xg, yg = np.meshgrid(
        (np.arange(OW) + 0.5) / OW, (np.arange(OH) + 0.5) / OH
    )
    cu, cv = _mattias_curve(xg.astype(np.float32), yg.astype(np.float32))
    uv_u = jnp.asarray((xg + (np.asarray(cu) - xg) * 0.5).astype(np.float32))
    uv_v = jnp.asarray((yg + (np.asarray(cv) - yg) * 0.5).astype(np.float32))
    if which == "v1":
        call = _blur_groups_call
    elif which == "v3":
        def call(t_, u_, v_, g_, i_, b_):
            return _blur_groups_call_v2(t_, u_, v_, g_, i_, b_, bf16=True)
    else:
        call = _blur_groups_call_v2

    @jax.jit
    def fn(texb):
        return tuple(call(texb, uv_u, uv_v, groups, False, B))

    return fn


def main():
    names = sys.argv[1:] or ["v1", "v2"]
    dev = jax.devices()[0]
    print(f"device: {dev} platform={dev.platform}", flush=True)
    rng = np.random.default_rng(0)
    raw = jnp.asarray(rng.random((B, H, W, 3), np.float32))
    vary = jax.jit(lambda f, k: jnp.abs(f - k))
    counter = [0]

    def produce():
        counter[0] += 1
        return vary(raw, jnp.float32((counter[0] % 17) / 16.0))

    probe = jnp.asarray(np.random.default_rng(7).random((B, H, W, 3), np.float32))
    base = None
    for n in names:
        fn = build(n)
        t0 = time.time()
        got = [np.asarray(p) for p in fn(probe)]
        t_compile = time.time() - t0
        if base is None:
            base = got
            dmax = 0.0
        else:
            dmax = max(
                float(np.abs(a - b).max()) for a, b in zip(base, got)
            )
        t = timeit(fn, produce)
        print(
            f"{n}: {t * 1e3:.2f} ms/call {t / B * 1e3:.4f} ms/f "
            f"compile={t_compile:.1f}s maxdiff_vs_first={dmax:.2e}",
            flush=True,
        )


if __name__ == "__main__":
    main()
