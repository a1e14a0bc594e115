"""Round-3: measure the VPU arithmetic ceiling of this chip, then put
crt-mattias's blur_groups kernel on that roofline (VERDICT #2).

Ceiling probe: a Pallas kernel that runs a long chain of [8,128]-vreg
f32 ops ENTIRELY in registers (K chained multiply-adds on a [64,128]
block with 8 independent streams so the FMA latency pipeline stays
full), timed per grid step. Reported as vreg-ops/s where one vreg-op is
one arithmetic instruction on an (8,128) f32 tile (an FMA counts 1 -
Mosaic emits mul+add separately only when it cannot fuse; the select /
compare / iota ops the blur kernel leans on all issue at the same
1-instruction rate, so the ceiling transfers).

Also times take_along_axis lane-gathers at the blur kernel's shapes
([KB, 128] windows, [KB, 128] index vectors) since PARITY_r2 claims
Mosaic gathers cost one instruction per sublane row — the gather
number anchors that claim.

Usage: python tools/profile_vpu_roofline.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import retrocapture_tpu  # noqa: F401 - compile cache
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 8  # one (8,128) vreg per accumulator stream
K = 4096  # FMA rounds per grid step (across all streams)
GRID = 8192  # grid steps per kernel launch
STREAMS = 16  # independent 1-vreg accumulators (r5: the old a<->b
# cross-dependent pair serialized on FMA latency; 8 streams of 8 vregs
# each spilled the register file and measured LOWER — 16 live vregs of
# independent chains is the sweet spot probed)


def _alu_kernel(x_ref, o_ref):
    x = x_ref[:]
    accs = [x * np.float32(1.0 + 1e-6 * i) + np.float32(0.125 * i) for i in range(STREAMS)]
    c = [np.float32(1.000001 + 1e-7 * i) for i in range(STREAMS)]
    for _ in range(K // STREAMS):
        for s in range(STREAMS):
            accs[s] = accs[s] * c[s] + np.float32(0.5)
    out = accs[0]
    for s in range(1, STREAMS):
        out = out + accs[s]
    o_ref[:] = out


def _gather_kernel(x_ref, idx_ref, o_ref):
    x = x_ref[:]
    idx = idx_ref[:]
    acc = jnp.zeros_like(x)
    for _ in range(64):
        acc = acc + jnp.take_along_axis(x, idx, axis=1)
        idx = (idx + 1) % 128
    o_ref[:] = acc


def timeit(fn, *args, iters=8):
    out = fn(*args)
    jax.block_until_ready(out)
    best = None
    for _ in range(3):
        t0 = time.time()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        float(jnp.sum(out[:1, :1]))
        dt = (time.time() - t0) / iters
        best = dt if best is None else min(best, dt)
    return best


def main():
    dev = jax.devices()[0]
    print(f"device: {dev} platform={dev.platform}", flush=True)

    x = jnp.asarray(np.random.default_rng(0).random((ROWS, 128), np.float32))

    alu = pl.pallas_call(
        _alu_kernel,
        out_shape=jax.ShapeDtypeStruct((ROWS, 128), jnp.float32),
        grid=(GRID,),
        in_specs=[pl.BlockSpec((ROWS, 128), lambda i: (0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((ROWS, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
    )
    t = timeit(jax.jit(alu), x)
    # ops: per grid step, K FMAs on [ROWS,128] = K*(ROWS//8) vreg-ops
    # (+ a handful of setup ops, <1%).
    vreg_ops = K * (ROWS // 8) * GRID
    per_s = vreg_ops / t
    print(
        f"ALU ceiling: {t * 1e3:.2f} ms/launch -> {per_s / 1e9:.2f} G vreg-ops/s "
        f"({per_s * 8 * 128 / 1e12:.2f} T f32 lane-ops/s)",
        flush=True,
    )

    kb = 24
    xg = jnp.asarray(np.random.default_rng(1).random((kb, 128), np.float32))
    idx = jnp.asarray(np.random.default_rng(2).integers(0, 128, (kb, 128)), jnp.int32)
    gat = pl.pallas_call(
        _gather_kernel,
        out_shape=jax.ShapeDtypeStruct((kb, 128), jnp.float32),
        grid=(GRID // 4,),
        in_specs=[
            pl.BlockSpec((kb, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((kb, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((kb, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
    )
    t = timeit(jax.jit(gat), xg, idx)
    n_gathers = 64 * (GRID // 4)
    print(
        f"lane-gather [kb={kb},128]: {t / n_gathers * 1e9:.1f} ns/gather "
        f"({t / n_gathers / (kb) * 1e9:.2f} ns per sublane-row)",
        flush=True,
    )


if __name__ == "__main__":
    main()
