"""Round-5 layout probe: is the xbr front section paying for
channel-minor [oh, w, 3] layouts (C=3 on the lane dim)?

Times two algebraically identical formulations of the front section's
dominant pattern (5 y-gather einsums + 21 shifted taps + per-tap luma +
a reduction), batch 32, on the chip:

  chan:   ytex[k] = einsum("Hs,swc->Hwc") ...  t = slice([oh,w,3])
  planar: ytex[k] = einsum("Hs,csw->cHw") ...  t = slice([3,oh,w])

    python tools/probe_xbr_layout.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import retrocapture_tpu  # noqa: F401
import jax
import jax.numpy as jnp

B, H, W, OH = 32, 240, 320, 1080
TAPS = [(dx, dy) for dy in (-2, -1, 0, 1, 2) for dx in (-1, 0, 1)] + [
    (-2, -1), (-2, 0), (-2, 1), (2, -1), (2, 0), (2, 1),
]
RGBW = np.array([14.352, 28.176, 5.472], np.float32)


def make_my():
    rng = np.random.default_rng(0)
    ys = {}
    for k in (-2, -1, 0, 1, 2):
        idx = np.clip(np.floor((np.arange(OH) + 0.5) * H / OH).astype(int) + k, 0, H - 1)
        ys[k] = (np.arange(H)[None, :] == idx[:, None]).astype(np.float32)
    return ys, rng


def chan(tex, ys):
    t255 = tex.astype(jnp.float32) * 255.0
    ytex = {k: jnp.einsum("Hs,bswc->bHwc", jnp.asarray(a), t255,
                          preferred_element_type=jnp.float32)
            for k, a in ys.items()}
    pads = {k: jnp.pad(v, ((0, 0), (0, 0), (2, 2), (0, 0)), mode="edge")
            for k, v in ytex.items()}
    acc = None
    for dx, dy in TAPS:
        t = jax.lax.slice(pads[dy], (0, 0, 2 + dx, 0), (B, OH, 2 + dx + W, 3))
        L = t[..., 0] * RGBW[0] + t[..., 1] * RGBW[1] + t[..., 2] * RGBW[2]
        acc = L if acc is None else jnp.maximum(acc, L * 1.000001)
    return acc


def planar(tex, ys):
    t255 = jnp.transpose(tex.astype(jnp.float32), (0, 3, 1, 2)) * 255.0  # [B,3,H,W]
    ytex = {k: jnp.einsum("Hs,bcsw->bcHw", jnp.asarray(a), t255,
                          preferred_element_type=jnp.float32)
            for k, a in ys.items()}
    pads = {k: jnp.pad(v, ((0, 0), (0, 0), (0, 0), (2, 2)), mode="edge")
            for k, v in ytex.items()}
    acc = None
    for dx, dy in TAPS:
        t = jax.lax.slice(pads[dy], (0, 0, 0, 2 + dx), (B, 3, OH, 2 + dx + W))
        L = t[:, 0] * RGBW[0] + t[:, 1] * RGBW[1] + t[:, 2] * RGBW[2]
        acc = L if acc is None else jnp.maximum(acc, L * 1.000001)
    return acc


def timeit(fn, x, ys):
    f = jax.jit(lambda t: fn(t, ys))
    sync = jax.jit(lambda o: jnp.sum(o[..., ::64, ::64].astype(jnp.float32)))
    t0 = time.time()
    out = f(x)
    float(sync(out))
    comp = time.time() - t0
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        for _ in range(8):
            out = f(x)
            fence = sync(out)
        float(fence)
        best = min(best, (time.time() - t0) / 8)
    return comp, best


def main():
    ys, rng = make_my()
    x = jnp.asarray((rng.random((B, H, W, 3)) * 255).astype(np.uint8))
    for name, fn in (("chan", chan), ("planar", planar)):
        comp, t = timeit(fn, x, ys)
        print(f"{name}: {t * 1e3:.2f} ms/dispatch = {t / B * 1e3:.3f} ms/frame "
              f"(compile {comp:.1f}s)", flush=True)


if __name__ == "__main__":
    sys.exit(main())
