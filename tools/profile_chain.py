"""Per-op profiling of the benchmark configs on the real chip.

Answers "where do the milliseconds go" (VERDICT round-1 weak #1: the
known device cost of a 1080p separable resample is ~0.17 ms/frame but
scanline-320 burned 2.67 ms). Times, with value-varying inputs and a
scalar-readback sync:

  * bare dispatch round-trip (tunnel/runtime overhead floor)
  * separable resample 240p->1080p (the affine fast path)
  * one banded warped tap at 1080p (the gather-free warp path)
  * per-config: input produce / chain-without-blit / full apply

Usage: python tools/profile_chain.py [config-name ...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

SHADERS = Path("/root/reference/shaders/shaders_glsl")


def timeit(fn, produce, iters=8, windows=3, sync=None):
    """Median-of-windows wall time per call; scalar readback sync."""
    if sync is None:
        sync = jax.jit(lambda x: jnp.sum(jnp.asarray(x, jnp.float32)))
    out = fn(produce())
    float(sync(out))
    times = []
    for _ in range(windows):
        t0 = time.time()
        for _ in range(iters):
            out = fn(produce())
        float(sync(out))
        times.append((time.time() - t0) / iters)
    return min(times)


def main():
    rng = np.random.default_rng(0)
    dev = jax.devices()[0]
    print(f"device: {dev} platform={dev.platform}")

    # 1. dispatch floor
    x = jnp.zeros((8, 128), jnp.float32)
    trivial = jax.jit(lambda a, k: a + k)
    counter = [0]

    def prod_trivial():
        counter[0] += 1
        return (x, jnp.float32(counter[0]))

    t = timeit(lambda args: trivial(*args), prod_trivial, iters=32)
    print(f"dispatch floor: {t * 1e3:.3f} ms/call")

    # 2. separable resample 240p->1080p (batch 1)
    from retrocapture_tpu.ops.sampling import _axis_matrix

    tex = jnp.asarray(rng.random((240, 320, 4), np.float32))
    u_row = ((np.arange(1920) + 0.5) / 1920).astype(np.float32)
    v_col = ((np.arange(1080) + 0.5) / 1080).astype(np.float32)
    ax = jnp.asarray(_axis_matrix(u_row, 320, True, "clamp_to_edge"))
    ay = jnp.asarray(_axis_matrix(v_col, 240, True, "clamp_to_edge"))

    @jax.jit
    def resamp(t, k):
        t = t + k
        th = jnp.einsum("hs,swc->hwc", ay, t, preferred_element_type=jnp.float32)
        return jnp.einsum("ws,hsc->hwc", ax, th, preferred_element_type=jnp.float32)

    def prod_tex():
        counter[0] += 1
        return (tex, jnp.float32(counter[0] % 7) * 1e-4)

    t = timeit(lambda args: resamp(*args), prod_tex, iters=16)
    print(f"separable resample 240p->1080p: {t * 1e3:.3f} ms")

    # 3. one banded warped bilinear tap at 1080p
    from retrocapture_tpu.ops.sampling import sample2d

    yy, xx = np.meshgrid(
        (np.arange(1080) + 0.5) / 1080, (np.arange(1920) + 0.5) / 1920, indexing="ij"
    )

    @jax.jit
    def warped(t, k):
        u = jnp.asarray(xx, jnp.float32) + k * 1e-5
        v = jnp.asarray(yy, jnp.float32) + (u - u[0, 0]) * 0.01  # mildly warped
        return sample2d(t, u, v, filter_linear=True)

    t = timeit(lambda args: warped(*args), prod_tex, iters=4)
    print(f"banded warped tap 320x240 -> 1080p: {t * 1e3:.3f} ms")

    # 4. per-config breakdown
    from retrocapture_tpu.runtime.engine import Engine

    configs = [
        ("scanline-320", SHADERS / "interpolation/sharp-bilinear-scanlines.glslp", (240, 320), 16),
        ("xbr-lv2-1080p", SHADERS / "xbr/xbr-lv2.glslp", (240, 320), 16),
        ("ntsc-320px", SHADERS / "ntsc/ntsc-320px.glslp", (240, 320), 16),
    ]
    names = sys.argv[1:]
    for name, preset, (h, w), batch in configs:
        if names and name not in names:
            continue
        frames = jnp.asarray((rng.random((batch, h, w, 3)) * 255).astype(np.uint8))
        vary = jax.jit(lambda f, k: f ^ k)

        def produce():
            counter[0] += 1
            return vary(frames, jnp.uint8(counter[0] % 251))

        e = Engine(viewport=(1920, 1080))
        assert e.load_preset(str(preset)), e.last_error
        t0 = time.time()
        out = e.apply(produce())
        out.block_until_ready()
        compile_s = time.time() - t0
        t_full = timeit(e.apply, produce, iters=4)

        # chain without the final blit: hack — viewport = last pass size
        e2 = Engine(viewport=(1920, 1080))
        e2.load_preset(str(preset))
        key = (h, w, 1920, 1080)
        state = e2._get_state(key, jnp.float32)
        import retrocapture_tpu.runtime.engine as em

        shapes = em.compute_chain_shapes(e2._program.preset, w, h, 1920, 1080)
        params = dict(e2._program.defaults)

        def chain_noblit(raw_b):
            src_b = em.Engine._to_rgba_float(raw_b)

            def one(src):
                out, _, _ = em._run_chain(
                    e2._program, shapes, (1920, 1080), src,
                    state.history, state.feedback, state.frame_count,
                    state.time, params, blit=False,
                )
                return out

            return jax.vmap(one)(src_b)

        fn_noblit = jax.jit(chain_noblit)
        t_noblit = timeit(fn_noblit, produce, iters=4)
        print(
            f"{name}: compile={compile_s:.1f}s full={t_full / batch * 1e3:.3f} ms/f "
            f"no-blit={t_noblit / batch * 1e3:.3f} ms/f (batch {batch})"
        )


def mattias_parts(batch: int = 16):
    """Component breakdown of the crt-mattias hand kernel at 1080p:
    blur kernel alone vs chain-without-blit vs full apply(u8). The
    epilogue cost is (no-blit − blur); the blit is (full − no-blit)."""
    rng = np.random.default_rng(0)
    counter = [0]
    h, w = 240, 320
    frames = jnp.asarray((rng.random((batch, h, w, 3)) * 255).astype(np.uint8))
    vary = jax.jit(lambda f, k: f ^ k)

    def produce():
        counter[0] += 1
        return vary(frames, jnp.uint8(counter[0] % 251))

    from retrocapture_tpu.graph import kernels as K
    from retrocapture_tpu.ops.pallas.blur_groups import BlurGroup, blur5x5_groups

    oh, ow = 1080, 1920
    groups = []
    for ch, bx, by, offs, scale, _ in K._MATTIAS_GROUPS:
        xo = [np.float32(offs * k) / np.float32(ow) for k in (-2, -1, 0, 1, 2)]
        yo = [np.float32(offs * k) / np.float32(oh) for k in (-2, -1, 0, 1, 2)]
        groups.append(BlurGroup(ch, bx, by, xo, yo, K._MATTIAS_W, scale))
    xg = (np.arange(ow, dtype=np.float32) + 0.5) / ow
    yg = (np.arange(oh, dtype=np.float32) + 0.5) / oh
    q_u, q_v = np.meshgrid(xg, yg)
    cu, cv = K._mattias_curve(q_u, q_v)
    uu = jnp.asarray(q_u + (cu - q_u) * 0.5, jnp.float32)
    vv = jnp.asarray(q_v + (cv - q_v) * 0.5, jnp.float32)

    @jax.jit
    def blur_only(raw_b):
        src = Engine._to_rgba_float(raw_b)
        p = K._glsl_pow(jnp.maximum(src[..., :3], 0.0), 2.2)
        planes = jax.vmap(lambda t: blur5x5_groups(t, uu, vv, groups))(p)
        return planes[0] + planes[1] + planes[2]

    t_blur = timeit(blur_only, produce, iters=4)
    print(f"mattias blur kernel: {t_blur / batch * 1e3:.3f} ms/f (batch {batch})")

    e = Engine(viewport=(1920, 1080))
    assert e.load_preset(str(SHADERS / "crt/crt-mattias.glslp")), e.last_error
    t_full_u8 = timeit(lambda f: e.apply(f, output="u8"), produce, iters=4)
    t_full_f32 = timeit(e.apply, produce, iters=4)
    print(f"mattias full apply u8:  {t_full_u8 / batch * 1e3:.3f} ms/f")
    print(f"mattias full apply f32: {t_full_f32 / batch * 1e3:.3f} ms/f")

    import retrocapture_tpu.runtime.engine as em

    key = (h, w, 1920, 1080)
    state = e._get_state(key, jnp.float32)
    shapes = em.compute_chain_shapes(e._program.preset, w, h, 1920, 1080)
    params = dict(e._program.defaults)
    params.update(e._custom_params)

    def chain_noblit(raw_b):
        src_b = em.Engine._to_rgba_float(raw_b)

        def one(src):
            out, _, _ = em._run_chain(
                e._program, shapes, (1920, 1080), src,
                state.history, state.feedback, state.frame_count,
                state.time, params, blit=False,
            )
            return out

        return jax.vmap(one)(src_b)

    fn_noblit = jax.jit(chain_noblit)
    t_noblit = timeit(fn_noblit, produce, iters=4)
    print(
        f"mattias no-blit: {t_noblit / batch * 1e3:.3f} ms/f  "
        f"=> epilogue ≈ {(t_noblit - t_blur) / batch * 1e3:.3f} ms/f, "
        f"blit+out ≈ {(t_full_u8 - t_noblit) / batch * 1e3:.3f} ms/f"
    )


def batch_scaling():
    """Throughput vs batch size for the dispatch-bound configs: if the
    relay round trip dominates, fps scales nearly linearly with batch."""
    rng = np.random.default_rng(0)
    counter = [0]
    cases = [
        ("scanline-320", SHADERS / "interpolation/sharp-bilinear-scanlines.glslp", "rgb", (64, 128, 256)),
        ("feedback-ghost-nv12", Path(__file__).resolve().parent.parent / "assets/presets/feedback-ghost.glslp", "nv12", (32, 64, 128)),
        ("ntsc-320px", SHADERS / "ntsc/ntsc-320px.glslp", "rgb", (32, 64, 128)),
        ("xbr-lv2-1080p", SHADERS / "xbr/xbr-lv2.glslp", "rgb", (32, 64)),
        ("crt-mattias-1080p", SHADERS / "crt/crt-mattias.glslp", "rgb", (16, 32, 64)),
    ]
    names = sys.argv[2:]
    h, w = 240, 320
    for name, preset, fmt, batches in cases:
        if names and name not in names:
            continue
        for batch in batches:
            try:
                e = Engine(viewport=(1920, 1080))
                assert e.load_preset(str(preset)), e.last_error
                e.set_input_format(fmt)
                if fmt == "nv12":
                    raw = jnp.asarray((rng.random((batch, h + h // 2, w)) * 255).astype(np.uint8))
                else:
                    raw = jnp.asarray((rng.random((batch, h, w, 3)) * 255).astype(np.uint8))
                vary = jax.jit(lambda f, k: f ^ k)

                def produce():
                    counter[0] += 1
                    return vary(raw, jnp.uint8(counter[0] % 251))

                t0 = time.time()
                out = e.apply(produce(), output="u8")
                sync = jax.jit(lambda x: jnp.sum(jnp.asarray(x, jnp.float32)))
                float(sync(out))
                compile_s = time.time() - t0
                t = timeit(lambda f: e.apply(f, output="u8"), produce, iters=6)
                print(
                    f"{name} batch {batch}: {batch / t:.1f} fps "
                    f"({t / batch * 1e3:.3f} ms/f, compile {compile_s:.1f}s)",
                    flush=True,
                )
            except Exception as ex:  # noqa: BLE001
                print(f"{name} batch {batch}: ERROR {type(ex).__name__}: {ex}", flush=True)


if __name__ == "__main__":
    from retrocapture_tpu.runtime.engine import Engine

    if len(sys.argv) > 1 and sys.argv[1] == "mattias-parts":
        mattias_parts()
    elif len(sys.argv) > 1 and sys.argv[1] == "batch-scaling":
        batch_scaling()
    else:
        main()
