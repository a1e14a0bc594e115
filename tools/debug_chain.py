"""Per-pass chain diagnostics: run a preset on a test frame and print
each pass's output statistics (min/mean/max per channel) to find where a
chain goes flat/black. CPU-friendly; use small sizes.

Usage: python tools/debug_chain.py <preset.glslp> [W H] [VW VH]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:  # noqa: BLE001
        pass
    import jax.numpy as jnp

    from retrocapture_tpu.graph.plan import PassContext, TexBinding, compile_preset
    from retrocapture_tpu.graph.scale import compute_chain_shapes
    from retrocapture_tpu.ops.colorspace import framebuffer_store
    from retrocapture_tpu.presets.glslp import Preset
    from retrocapture_tpu.runtime import engine as em
    from retrocapture_tpu.io.testpattern import TestPatternSource

    path = sys.argv[1]
    w, h = (int(sys.argv[2]), int(sys.argv[3])) if len(sys.argv) > 3 else (64, 48)
    vw, vh = (int(sys.argv[4]), int(sys.argv[5])) if len(sys.argv) > 5 else (128, 96)

    preset = Preset.load(path)
    prog = compile_preset(preset)
    shapes = compute_chain_shapes(preset, w, h, vw, vh)
    for i, sh in enumerate(shapes):
        cfg = preset.passes[i]
        print(
            f"pass {i}: {Path(cfg.shader_path).name} "
            f"[{sh.in_w}x{sh.in_h} -> {sh.out_w}x{sh.out_h}] "
            f"float_fb={cfg.float_framebuffer} srgb={cfg.srgb_framebuffer} "
            f"alias={cfg.alias!r} mipmap={cfg.mipmap_input}"
        )
    frame = TestPatternSource(w, h).capture_frame().astype(np.float32) / 255.0
    source = jnp.asarray(
        np.concatenate([frame, np.ones((h, w, 1), np.float32)], axis=-1)
    )

    n = len(prog.passes)
    history = tuple()
    feedback = {}
    if prog.uses_history():
        last = shapes[-1]
        history = tuple(
            jnp.zeros((last.out_h, last.out_w, 4), jnp.float32) for _ in range(7)
        )
    if prog.uses_feedback():
        feedback = {
            j: jnp.zeros((sh.out_h, sh.out_w, 4), jnp.float32)
            for j, sh in enumerate(shapes)
        }

    def filter_of_output(j):
        if j + 1 < n:
            cfg = preset.passes[j + 1]
            return cfg.filter_linear, cfg.wrap_mode, cfg.mipmap_input
        return True, "clamp_to_edge", False

    original_binding = TexBinding(
        source,
        preset.passes[0].filter_linear,
        preset.passes[0].wrap_mode,
        preset.passes[0].mipmap_input,
    )
    history_bindings = [TexBinding(t, True, "clamp_to_edge") for t in history]
    pass_outputs = []
    current = source
    params = {k: np.float32(v) for k, v in prog.defaults.items()}
    for i, cp in enumerate(prog.passes):
        cfg = preset.passes[i]
        sh = shapes[i]
        input_binding = TexBinding(
            current, cfg.filter_linear, cfg.wrap_mode, cfg.mipmap_input
        )
        fb_bindings = {
            j: TexBinding(t, *filter_of_output(j)) for j, t in feedback.items()
        }
        ctx = PassContext(
            prog,
            i,
            shapes=shapes,
            viewport=(vw, vh),
            source_size=(w, h),
            input_binding=input_binding,
            original_binding=original_binding,
            pass_outputs=pass_outputs,
            history=history_bindings,
            feedback=fb_bindings,
            frame_count=jnp.int32(1),
            frame_time=jnp.float32(0.016),
            params=params,
        )
        try:
            color = em._run_pass(cp, ctx, sh)
        except Exception as e:  # noqa: BLE001
            print(f"pass {i}: FAILED {type(e).__name__}: {e}")
            return 1
        stored = framebuffer_store(
            color,
            float_framebuffer=cfg.float_framebuffer,
            srgb_framebuffer=cfg.srgb_framebuffer,
        )
        arr = np.asarray(stored)
        print(
            f"pass {i}: out rgb min={arr[..., :3].min():.4f} "
            f"mean={arr[..., :3].mean():.4f} max={arr[..., :3].max():.4f} "
            f"a[mean]={arr[..., 3].mean():.3f} "
            f"std={arr[..., :3].std():.4f} finite={np.isfinite(arr).all()}"
        )
        pass_outputs.append(TexBinding(stored, *filter_of_output(i)))
        current = stored
    return 0


if __name__ == "__main__":
    sys.exit(main())
