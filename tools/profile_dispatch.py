"""Round-3: characterize the relay's dispatch pipeline.

The parts probe measured a chained trivial kernel at 13.6 ms/call —
the same order as a full 128-frame scanline apply. Before optimizing
device math, establish what the relay charges for:

  a. serial chain: o = f(o), depth N, one sync        (latency-bound?)
  b. independent dispatches: o_i = f(x_i), one sync   (pipelined?)
  c. diamond: state-chained scalar + heavy parallel   (bench's shape)
  d. submit cost: wall time of ONE dispatch without sync
  e. sync cost: scalar readback round trip

Usage: python tools/profile_dispatch.py
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


def sync(x):
    return float(jnp.sum(jnp.asarray(x, jnp.float32)))


def main():
    dev = jax.devices()[0]
    print(f"device: {dev} platform={dev.platform}", flush=True)

    x = jnp.zeros((8, 128), jnp.float32)
    triv = jax.jit(lambda a: a * 1.0001 + 1.0)
    sync(triv(x))

    # e. sync cost alone (RTT)
    y = triv(x)
    sync(y)
    t0 = time.time()
    for _ in range(8):
        sync(y)
    print(f"sync-only RTT: {(time.time() - t0) / 8 * 1e3:.2f} ms", flush=True)

    # d. submit cost without sync
    t0 = time.time()
    outs = [triv(x) for _ in range(64)]
    t_submit = (time.time() - t0) / 64 * 1e3
    t0 = time.time()
    sync(outs[-1])
    t_drain = (time.time() - t0) * 1e3
    print(f"submit-only: {t_submit:.3f} ms/call; drain after 64 independent: "
          f"{t_drain:.1f} ms", flush=True)

    # a. serial chain depth 64
    o = triv(x)
    sync(o)
    t0 = time.time()
    for _ in range(64):
        o = triv(o)
    sync(o)
    print(f"serial chain x64: {(time.time() - t0) / 64 * 1e3:.3f} ms/hop",
          flush=True)

    # b. independent inputs x64
    xs = [jnp.full((8, 128), float(i), jnp.float32) for i in range(64)]
    for xx in xs:
        xx.block_until_ready()
    t0 = time.time()
    outs = [triv(xx) for xx in xs]
    for oo in outs:
        sync(oo)
    print(f"independent x64 (sync each): {(time.time() - t0) / 64 * 1e3:.3f} "
          f"ms/call", flush=True)
    t0 = time.time()
    outs = [triv(xx) for xx in xs]
    sync(outs[-1])
    tb = (time.time() - t0) / 64 * 1e3
    for oo in outs:
        sync(oo)
    print(f"independent x64 (one sync): {tb:.3f} ms/call", flush=True)

    # c. diamond: heavy work + tiny scalar state chained across calls
    big = jnp.zeros((128, 240, 320, 4), jnp.float32)
    heavy = jax.jit(lambda a, s: (a * 1.0001 + s, s + 1.0))
    s = jnp.float32(0)
    o, s = heavy(big, s)
    sync(s)
    t0 = time.time()
    for _ in range(16):
        o, s = heavy(big, s)
    sync(s)
    print(f"scalar-state chain x16 (heavy body): "
          f"{(time.time() - t0) / 16 * 1e3:.3f} ms/hop", flush=True)

    # same heavy body, state kept host-side
    t0 = time.time()
    for i in range(16):
        o, _ = heavy(big, jnp.float32(i))
    sync(o)
    print(f"host-state x16 (heavy body): {(time.time() - t0) / 16 * 1e3:.3f} "
          f"ms/call", flush=True)


if __name__ == "__main__":
    main()
