"""Round-3 probe: why does ntsc pass1 (65-tap stride-2 NEAREST FIR,
ntsc-pass2-2phase-gamma.glsl) cost 1.02 ms/f?

Hypothesis: each tap is a stride-2 LANE slice of the [240, 1280, C] f32
texture (_nearest_stride_slice), and Mosaic/XLA materializes a relayout
per tap instead of fusing — 65 copies/frame. A/B three formulations of
the same math (identical tap values, identical summation order):

  strided : 65 stride-2 slices (current lowering)
  phase   : 2 stride-2 phase planes built once + 65 stride-1 slices
  conv    : weights folded into one banded stride-1 matmul per phase
            (changes summation order — parity-relevant, measured for the
            ceiling)

Usage: python tools/profile_fir_phase.py [strided phase conv ...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import retrocapture_tpu  # noqa: F401 - enables the persistent compile cache

import jax
import jax.numpy as jnp

B, H, W, C = 32, 240, 1280, 4
OW = 640
TAPS = 65  # offsets -32..32

rng = np.random.default_rng(0)
WTS = rng.normal(size=(TAPS, C)).astype(np.float32) * 0.03


# One jit wrapper, hoisted: a fresh jax.jit(lambda ...) per call is a new
# function identity -> full retrace + (uncached) remote compile EVERY
# iteration, which swamped the first run of this probe (~1 s/call of
# pure fence compiles across all three forms).
_fence = jax.jit(lambda t: jnp.sum(t[..., ::64, ::64, :].astype(jnp.float32)))


def fence(x):
    return _fence(x)


def pad_edge(tex, m):
    return jnp.pad(tex, ((0, 0), (0, 0), (m, m), (0, 0)), mode="edge")


def fir_strided(tex):
    # tap d: indices 2j + 32 + d of padded tex (pad 32+32=64 margin)
    tp = pad_edge(tex, 33)
    acc = None
    for d in range(TAPS):
        s = d + 1  # start = 33 + (d - 32)
        tap = jax.lax.slice(
            tp, (0, 0, s, 0), (B, H, s + 2 * (OW - 1) + 1, C), (1, 1, 2, 1)
        )
        term = tap * WTS[d]
        acc = term if acc is None else acc + term
    return acc


def fir_phase(tex):
    tp = pad_edge(tex, 34)  # even margin so phases stay aligned
    even = jax.lax.slice(tp, (0, 0, 0, 0), (B, H, tp.shape[2], C), (1, 1, 2, 1))
    odd = jax.lax.slice(tp, (0, 0, 1, 0), (B, H, tp.shape[2] - 1, C), (1, 1, 2, 1))
    acc = None
    for d in range(TAPS):
        s = d + 2  # global start = 34 + (d - 32); phase = s % 2, k = s // 2
        ph, k = (even, s // 2) if s % 2 == 0 else (odd, s // 2)
        tap = jax.lax.slice(ph, (0, 0, k, 0), (B, H, k + OW, C), (1, 1, 1, 1))
        term = tap * WTS[d]
        acc = term if acc is None else acc + term
    return acc


def fir_conv(tex):
    tp = pad_edge(tex, 34)
    even = jax.lax.slice(tp, (0, 0, 0, 0), (B, H, tp.shape[2], C), (1, 1, 2, 1))
    odd = jax.lax.slice(tp, (0, 0, 1, 0), (B, H, tp.shape[2] - 1, C), (1, 1, 2, 1))
    out = None
    for phase, (ph, base) in enumerate(((even, 1), (odd, 1))):
        # taps with (d + 2) % 2 == phase; k = (d + 2) // 2
        ks = [(d, (d + 2) // 2) for d in range(TAPS) if (d + 2) % 2 == phase]
        kmin = min(k for _, k in ks)
        kmax = max(k for _, k in ks)
        n = ph.shape[2]
        a = np.zeros((OW, n), np.float32)
        # per-channel weights differ -> build per-channel matrices stacked
        mats = []
        for c in range(C):
            a = np.zeros((OW, n), np.float32)
            for d, k in ks:
                a[np.arange(OW), np.minimum(k + np.arange(OW), n - 1)] += WTS[d, c]
            mats.append(a)
        aw = jnp.asarray(np.stack(mats))  # [C, OW, N]
        t = jnp.einsum(
            "cwn,bhnc->bhwc", aw, ph, preferred_element_type=jnp.float32
        )
        out = t if out is None else out + t
    return out


FORMS = {"strided": fir_strided, "phase": fir_phase, "conv": fir_conv}


def main():
    names = sys.argv[1:] or ["strided", "phase"]
    dev = jax.devices()[0]
    print(f"device: {dev} platform={dev.platform}", flush=True)
    raw = jnp.asarray(rng.random((B, H, W, C), np.float32))
    vary = jax.jit(lambda f, k: jnp.abs(f - k))
    counter = [0]

    def produce():
        counter[0] += 1
        return vary(raw, jnp.float32((counter[0] % 17) / 16.0))

    probe = jnp.asarray(np.random.default_rng(7).random((B, H, W, C), np.float32))
    base = None
    for n in names:
        fn = jax.jit(FORMS[n])
        t0 = time.time()
        got = np.asarray(fn(probe))
        t_compile = time.time() - t0
        dmax = 0.0 if base is None else float(np.abs(base - got).max())
        if base is None:
            base = got
        # timing
        out = fn(produce())
        float(fence(out))
        times = []
        for _ in range(3):
            fs = []
            t0 = time.time()
            iters = 10
            for i in range(iters):
                out = fn(produce())
                fs.append(fence(out))
                if i % 4 == 3 and i >= 2:
                    float(fs[i - 2])
            float(fence(out))
            times.append((time.time() - t0) / iters)
        t = min(times)
        print(
            f"{n}: {t * 1e3:.2f} ms/call {t / B * 1e3:.4f} ms/f "
            f"compile={t_compile:.1f}s maxdiff_vs_first={dmax:.2e}",
            flush=True,
        )


if __name__ == "__main__":
    main()
