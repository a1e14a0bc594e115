"""Probe round-1 compile-timeout presets: per-preset wall time on CPU."""
import subprocess, sys, time
PRESETS = [
    "anti-aliasing/fxaa.glslp",
    "crt/metacrt.glslp",
    "denoisers/slow-bilateral.glslp",
    "scalefx/scalefx-9x.glslp",
    "nnedi3/nnedi3-nns32-2x-rgb-nns32-4x-luma.glslp",
]
CODE = """
import sys, time, numpy as np
import jax; jax.config.update('jax_platforms', 'cpu')
from retrocapture_tpu.runtime.engine import Engine
t0 = time.time()
e = Engine(viewport=(640, 480))
ok = e.load_preset('/root/reference/shaders/shaders_glsl/' + sys.argv[1])
frame = (np.random.default_rng(0).random((240, 320, 3)) * 255).astype(np.uint8)
out = np.asarray(e.apply(frame))
print('RESULT %s ok=%s active=%s std=%.4f t=%.0fs' % (sys.argv[1], ok, e.shader_active, out.std(), time.time()-t0), flush=True)
"""
for p in PRESETS:
    t0 = time.time()
    try:
        r = subprocess.run([sys.executable, "-c", CODE, p], capture_output=True, text=True, timeout=float(sys.argv[1]) if len(sys.argv) > 1 else 300)
        line = [l for l in r.stdout.splitlines() if l.startswith("RESULT")]
        print(line[0] if line else f"RESULT {p} FAILED rc={r.returncode} {r.stderr[-200:]}", flush=True)
    except subprocess.TimeoutExpired:
        print(f"RESULT {p} TIMEOUT {time.time()-t0:.0f}s", flush=True)
