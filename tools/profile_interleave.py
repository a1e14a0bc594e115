"""Round-3: isolate the hidden per-frame output-packing taxes on chip.

The blit-variant probe measured wfloor (a pure u8 WRITE kernel + the
same `jnp.stack(planes, -1)` packing the shipping blit uses) at
0.52 ms/f — SLOWER than the full blit+quantize (0.34 ms/f measured the
same way). The stack is a minor-dim interleave of 3 u8 planes (XLA
relayout copy), and the lagged fence itself (strided slice-sum of the
u8 output) rides the device too. This probe separates:

  fence     cost of the fence program alone on a resident u8 buffer
  stacki    3 planar u8 planes -> [., ., 3] interleave (jnp.stack)
  concat0   3 planar u8 planes -> [3, ., .] leading-axis concat
  passq     quantize-only pallas (identity blit) WITHOUT the stack
  passq_s   quantize-only + stack (the shipping identity-blit path)

Usage: python tools/profile_interleave.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp

B, OH, OW = 128, 1080, 1920


def timeit_chain(fn, x0, iters=10, windows=3):
    """Chain fn into itself-compatible input? Not generally; instead
    re-dispatch on the same resident input with a varying scalar mixed
    in so the relay cannot cache, and sync via a tiny fence."""
    fence = jax.jit(lambda t: jnp.sum(t[..., ::256, ::256].astype(jnp.float32)))
    out = fn(x0, jnp.uint8(1))
    float(fence(out))
    times = []
    for w in range(windows):
        fs = []
        t0 = time.time()
        for i in range(iters):
            out = fn(x0, jnp.uint8(i % 7 + 1))
            fs.append(fence(out))
            if i % 4 == 3 and i >= 2:
                float(fs[i - 2])
        float(fence(out))
        times.append((time.time() - t0) / iters)
    return min(times)


def main():
    dev = jax.devices()[0]
    print(f"device: {dev} platform={dev.platform}", flush=True)
    rng = np.random.default_rng(0)
    planes = jnp.asarray(
        (rng.random((B, 3, OH, OW)) * 255).astype(np.uint8)
    )  # planar u8
    f32in = jnp.asarray(rng.random((B, OH, OW, 3)).astype(np.float32))

    # fence alone: measured as the marginal cost of the big fence vs the
    # tiny fence on the same resident interleaved buffer.
    big_fence = jax.jit(
        lambda t: jnp.sum(t[..., ::64, ::64, :].astype(jnp.float32))
    )
    inter = jnp.transpose(planes, (0, 2, 3, 1))
    inter.block_until_ready()
    t0 = time.time()
    for _ in range(10):
        float(big_fence(inter))
    t_big = (time.time() - t0) / 10
    print(f"fence(u8 [B,1080,1920,3] ::64 strided): {t_big*1e3:.2f} ms/call "
          f"{t_big/B*1e3:.4f} ms/f", flush=True)

    variants = {
        "stacki": jax.jit(
            lambda p, k: jnp.stack(
                [p[:, 0] ^ k, p[:, 1] ^ k, p[:, 2] ^ k], axis=-1
            )
        ),
        "concat0": jax.jit(
            lambda p, k: jnp.stack(
                [p[:, 0] ^ k, p[:, 1] ^ k, p[:, 2] ^ k], axis=1
            )
        ),
    }
    for n, fn in variants.items():
        t = timeit_chain(fn, planes)
        print(f"{n}: {t*1e3:.2f} ms/call {t/B*1e3:.4f} ms/f", flush=True)

    # quantize-only identity blit, with and without the interleave.
    from retrocapture_tpu.ops.pallas.resample import resample_u8

    def passq_s(t, k):
        return jax.vmap(lambda f: resample_u8(f, None, None, force_pallas=True))(
            t + k.astype(jnp.float32) / 256.0
        )

    def passq(t, k):
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        x = t + k.astype(jnp.float32) / 256.0

        def kern(t_ref, o_ref):
            q = jnp.round(jnp.clip(t_ref[:], 0.0, 1.0) * 255.0).astype(jnp.int32)
            o_ref[:] = q.astype(jnp.uint8)

        def one(f):
            outs = []
            for c in range(3):
                outs.append(
                    pl.pallas_call(
                        kern,
                        out_shape=jax.ShapeDtypeStruct((OH, OW), jnp.uint8),
                        grid=(OH // 120,),
                        in_specs=[
                            pl.BlockSpec(
                                (120, OW), lambda i: (i, 0), memory_space=pltpu.VMEM
                            )
                        ],
                        out_specs=pl.BlockSpec(
                            (120, OW), lambda i: (i, 0), memory_space=pltpu.VMEM
                        ),
                    )(f[:, :, c])
                )
            return jnp.stack(outs, axis=0)  # planar [3, OH, OW]

        return jax.vmap(one)(x)

    for n, fn in (("passq_s", jax.jit(passq_s)), ("passq_planar", jax.jit(passq))):
        t = timeit_chain(fn, f32in)
        print(f"{n}: {t*1e3:.2f} ms/call {t/B*1e3:.4f} ms/f", flush=True)


if __name__ == "__main__":
    main()
