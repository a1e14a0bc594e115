"""Validate the round-1 CPU-compile-timeout presets on the TPU backend.

The 18 presets below exceeded the corpus harness's per-preset budget on
the (single-core) CPU backend — XLA's CPU LLVM pipeline takes minutes on
their 10k+ line unrolled HLO (fxaa alone: trace 4 s, CPU compile
>13 min). The TPU path compiles server-side; this probe runs each preset
end-to-end on the chip with a generous budget and records stage timings
and output statistics, mirroring the reference which runs all of these
in real time on desktop GL (e.g. shaders_glsl/anti-aliasing/fxaa.glslp).

    python tools/timeout_probe_tpu.py [--budget 900] [--out timeout_tpu.json]
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time
from pathlib import Path

PRESETS = [
    # The exact `status == "timeout"` set from corpus_report_r2.json.
    "anti-aliasing/fxaa.glslp",
    "crt/metacrt.glslp",
    "nnedi3/nnedi3-nns32-2x-rgb-nns32-4x-luma.glslp",
    "nnedi3/nnedi3-nns32-4x-rgb.glslp",
    "nnedi3/nnedi3-nns64-2x-nns32-4x-nns16-8x-rgb.glslp",
    "nnedi3/nnedi3-nns64-2x-nns32-4x-rgb.glslp",
    "presets/scalefx+rAA+aa-fast.glslp",
    "presets/scalefx+rAA+aa.glslp",
    "presets/scalefx-aa-fast.glslp",
    "presets/scalefx-aa.glslp",
    "presets/vector-glow.glslp",
    "procedural/dakrunch-manta-ray/dakrunch-manta-ray.glslp",
    "procedural/iq-canyon/iq-canyon.glslp",
    "procedural/kali-space-race/kali-space-race.glslp",
    "procedural/kali-space-race-hd/kali-space-race.glslp",
    "procedural/nimitz-cloud-ten/nimitz-cloud-ten.glslp",
    "procedural/shane-abstract-corridor/shane-abstract-corridor.glslp",
    "procedural/sudonhim-cloudy-voxel-world/sudonhim-cloudy-voxel-world.glslp",
    "procedural/sudonhim-cloudy-voxel-world-2/sudonhim-cloudy-voxel-world.glslp",
    "procedural/pmalin-waterfalls/pmalin-waterfalls.glslp",
    "procedural/pmalin-waterfalls-hd/pmalin-waterfalls-hd.glslp",
    "scalefx/scalefx-9x.glslp",
    "scalefx/scalefx+rAA.glslp",
    "denoisers/slow-bilateral.glslp",
]

CODE = r"""
import sys, time, numpy as np
sys.path.insert(0, "@REPO@")
import jax, jax.numpy as jnp
from retrocapture_tpu.runtime.engine import Engine
p = sys.argv[1]
t0 = time.time()
e = Engine(viewport=(640, 480))
ok = e.load_preset('/root/reference/shaders/shaders_glsl/' + p)
t_load = time.time() - t0
frame = (np.random.default_rng(0).random((240, 320, 3)) * 255).astype(np.uint8)
t0 = time.time()
out = e.apply(frame)
jax.block_until_ready(out)
t_first = time.time() - t0
out = np.asarray(out)
t0 = time.time()
for _ in range(3):
    o2 = e.apply(frame)
jax.block_until_ready(o2)
t_steady = (time.time() - t0) / 3
import json
print("RESULT " + json.dumps({
    "preset": p, "load_ok": bool(ok), "shader_active": bool(e.shader_active),
    "t_load": round(t_load, 1), "t_first": round(t_first, 1),
    "t_steady": round(t_steady, 3),
    "finite": bool(np.isfinite(out).all()), "std": float(out.std()),
    "error": e.last_error,
}), flush=True)
"""


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--budget", type=float, default=900.0)
    ap.add_argument("--out", default="timeout_tpu.json")
    ap.add_argument("--filter", default="")
    args = ap.parse_args()
    repo = str(Path(__file__).resolve().parent.parent)
    results = []
    import re

    pat = re.compile(args.filter) if args.filter else None
    for p in PRESETS:
        if pat is not None and not pat.search(p):
            continue
        t0 = time.time()
        try:
            r = subprocess.run(
                [sys.executable, "-c", CODE.replace("@REPO@", repo), p],
                capture_output=True, text=True, timeout=args.budget,
            )
            lines = [l for l in r.stdout.splitlines() if l.startswith("RESULT ")]
            if lines:
                rec = json.loads(lines[0][7:])
            else:
                rec = {"preset": p, "status": "crash", "rc": r.returncode,
                       "stderr": r.stderr[-400:]}
        except subprocess.TimeoutExpired:
            rec = {"preset": p, "status": "timeout", "budget_s": args.budget}
        rec.setdefault("status", "ok" if rec.get("shader_active") else "degraded")
        rec["wall_s"] = round(time.time() - t0, 1)
        results.append(rec)
        print(json.dumps(rec), flush=True)
    Path(args.out).write_text(json.dumps(results, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
