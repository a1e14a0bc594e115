"""End-to-end smoke test — the port of tools/smoke-test.sh (the
reference's "refactor safety net", #149/#186), driving the CLI surface.

Pass 1: test-pattern frames through the passthrough pipeline; decode
output and assert the content statistics of smoke-test.sh:168-215
(brightness max >= 180, spatial std >= 20, saturation >= 30, >= 5
distinct bars, temporal mean-diff >= 0.05).

Pass 2: same frames through crt/crt-hyllian-glow.glslp (6-pass CRT, no
external LUTs, smoke-test.sh:28-30); assert the preset activated and
shaded-vs-raw mean abs diff >= 5.0 so a "shader silently did nothing"
regression can't ship green (:279-299).

    python tools/smoke_test.py [--tpu]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tpu", action="store_true", help="run on the default (TPU) backend")
    ap.add_argument("--preset", default="crt/crt-hyllian-glow.glslp")
    args = ap.parse_args()

    if not args.tpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from retrocapture_tpu import Engine
    from retrocapture_tpu.io.testpattern import TestPatternSource

    w, h = 1280, 720
    n = 12
    src = TestPatternSource(w, h)
    frames = src.capture_batch(n)

    # -- pass 1: passthrough content assertions -------------------------
    eng = Engine()
    raw = np.asarray(eng.apply(frames)) * 255.0

    checks = []

    def check(name, ok, detail):
        checks.append((name, bool(ok), detail))
        print(f"[{'PASS' if ok else 'FAIL'}] {name}: {detail}")

    check("brightness", raw.max() >= 180, f"max={raw.max():.1f} (>=180)")
    check("spatial-std", raw.std() >= 20, f"std={raw.std():.1f} (>=20)")
    sat = np.abs(raw.max(axis=-1) - raw.min(axis=-1))
    check("saturation", sat.mean() >= 30, f"mean channel spread={sat.mean():.1f} (>=30)")
    mid = raw[0, h // 3]
    colors = {tuple(np.round(mid[x] / 32).astype(int)) for x in range(0, w, w // 8)}
    check("distinct-bars", len(colors) >= 5, f"{len(colors)} distinct (>=5)")
    tdiff = np.abs(np.diff(raw, axis=0)).mean()
    check("temporal", tdiff >= 0.05, f"mean frame diff={tdiff:.3f} (>=0.05)")

    # -- pass 2: shader chain -------------------------------------------
    eng2 = Engine()
    preset = Path(args.preset)
    if not preset.is_absolute():
        preset = Path("/root/reference/shaders/shaders_glsl") / preset
    loaded = eng2.load_preset(str(preset))
    check("preset-load", loaded, f"{preset.name}: active={eng2.shader_active} err={eng2.last_error}")
    if loaded:
        shaded = np.asarray(eng2.apply(frames)) * 255.0
        check("shader-finite", np.isfinite(shaded).all(), "all finite")
        diff = np.abs(shaded - raw).mean()
        check("shader-effect", diff >= 5.0, f"shaded-vs-raw mean abs diff={diff:.2f} (>=5.0)")

    failed = [c for c in checks if not c[1]]
    print(f"\n{'SMOKE TEST PASSED' if not failed else 'SMOKE TEST FAILED'} "
          f"({len(checks) - len(failed)}/{len(checks)})")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
