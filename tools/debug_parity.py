"""Per-pass GL-oracle vs engine divergence: renders each pass of a
preset through BOTH paths, feeding each side its own previous outputs,
and prints per-pass PSNR — locates the first diverging pass.

Usage: python tools/debug_parity.py <preset.glslp> [W H] [VW VH]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def psnr(a, b):
    mse = float(((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2).mean())
    if mse <= 0:
        return float("inf")
    return 10 * np.log10(1.0 / mse)


def main():
    import jax.numpy as jnp

    from retrocapture_tpu.graph.plan import PassContext, TexBinding, compile_preset
    from retrocapture_tpu.graph.scale import compute_chain_shapes
    from retrocapture_tpu.io.testpattern import TestPatternSource
    from retrocapture_tpu.ops.colorspace import framebuffer_store
    from retrocapture_tpu.parity.oracle import OracleEngine
    from retrocapture_tpu.presets.glslp import Preset
    from retrocapture_tpu.runtime import engine as em

    path = sys.argv[1]
    w, h = (int(sys.argv[2]), int(sys.argv[3])) if len(sys.argv) > 3 else (320, 240)
    vw, vh = (int(sys.argv[4]), int(sys.argv[5])) if len(sys.argv) > 5 else (640, 480)

    preset = Preset.load(path)
    prog = compile_preset(preset)
    shapes = compute_chain_shapes(preset, w, h, vw, vh)
    n = len(prog.passes)

    frame = TestPatternSource(w, h).capture_frame().astype(np.float32) / 255.0
    src_np = np.concatenate([frame, np.ones((h, w, 1), np.float32)], axis=-1)

    # oracle chain (its own outputs as inputs)
    o = OracleEngine(viewport=(vw, vh))
    o.load_preset(path)

    def filter_of_output(j):
        if j + 1 < n:
            c = preset.passes[j + 1]
            return c.filter_linear, c.wrap_mode, c.mipmap_input
        return True, "clamp_to_edge", False

    params = {k: np.float32(v) for k, v in prog.defaults.items()}
    ob = TexBinding(src_np, preset.passes[0].filter_linear, preset.passes[0].wrap_mode, preset.passes[0].mipmap_input)
    ob_j = TexBinding(jnp.asarray(src_np), *(ob.filter_linear, ob.wrap_mode, ob.mipmap))

    ora_outputs, our_outputs = [], []
    cur_o, cur_e = src_np, jnp.asarray(src_np)
    for i, cp in enumerate(prog.passes):
        cfg = preset.passes[i]
        sh = shapes[i]
        # oracle side
        ctx_o = PassContext(
            prog, i, shapes=shapes, viewport=(vw, vh), source_size=(w, h),
            input_binding=TexBinding(cur_o, cfg.filter_linear, cfg.wrap_mode, cfg.mipmap_input),
            original_binding=ob,
            pass_outputs=[TexBinding(t, *filter_of_output(j)) for j, t in enumerate(ora_outputs)],
            history=[], feedback={},
            frame_count=np.int32(0), frame_time=np.float32(0.0), params=params,
        )
        out_o = o._run_gl_pass(cp, ctx_o, cfg, sh)
        ora_outputs.append(out_o)
        cur_o = out_o
        # engine side
        ctx_e = PassContext(
            prog, i, shapes=shapes, viewport=(vw, vh), source_size=(w, h),
            input_binding=TexBinding(cur_e, cfg.filter_linear, cfg.wrap_mode, cfg.mipmap_input),
            original_binding=ob_j,
            pass_outputs=[TexBinding(t, *filter_of_output(j)) for j, t in enumerate(our_outputs)],
            history=[], feedback={},
            frame_count=np.int32(0), frame_time=np.float32(0.0), params=params,
        )
        color = em._run_pass(cp, ctx_e, sh)
        out_e = np.asarray(
            framebuffer_store(color, float_framebuffer=cfg.float_framebuffer, srgb_framebuffer=cfg.srgb_framebuffer)
        )
        our_outputs.append(jnp.asarray(out_e))
        cur_e = jnp.asarray(out_e)
        # cross-compare
        p_own = psnr(out_o[..., :3], out_e[..., :3])
        print(
            f"pass {i:2d} {Path(cfg.shader_path).name[:46]:46s} "
            f"[{sh.out_w}x{sh.out_h}] psnr={p_own:7.2f}  "
            f"gl(mean={out_o[...,:3].mean():.4f} std={out_o[...,:3].std():.4f}) "
            f"eng(mean={out_e[...,:3].mean():.4f} std={out_e[...,:3].std():.4f})",
            flush=True,
        )
    o._oracle.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
