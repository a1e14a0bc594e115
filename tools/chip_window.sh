#!/bin/bash
# One TPU-window measurement sequence (the axon tunnel has multi-hour
# outages; when it returns, run everything unattended, one client at a
# time). Logs under /tmp/chipwin_*.log, results in the repo.
set -u
cd "$(dirname "$0")/.."
TS=$(date +%H%M)
log() { echo "[chipwin $(date +%T)] $*" | tee -a /tmp/chipwin.log; }

log "0/5 preconv smoke (does the new lowering compile on Mosaic?)"
timeout 1800 python - > /tmp/chipwin_smoke.log 2>&1 <<'EOF'
import numpy as np, jax
from retrocapture_tpu.runtime.engine import Engine
e = Engine(viewport=(256, 192))
assert e.load_preset('/root/reference/shaders/shaders_glsl/crt/crt-mattias.glslp')
f = (np.random.default_rng(0).random((2, 120, 160, 3)) * 255).astype(np.uint8)
out = e.apply(f)
jax.block_until_ready(out)
o = np.asarray(out)
assert np.isfinite(o).all() and o.std() > 0.01, (o.std(),)
print("PRECONV_OK")
EOF
if grep -q PRECONV_OK /tmp/chipwin_smoke.log; then
  log "preconv OK"
else
  log "preconv FAILED on chip - falling back to groups kernel for this window"
  tail -3 /tmp/chipwin_smoke.log | tee -a /tmp/chipwin.log
  export RCTPU_MATTIAS=groups
fi

log "1/5 mattias parts (preconv default)"
timeout 2400 python tools/profile_chain.py mattias-parts > /tmp/chipwin_mattias_parts.log 2>&1
tail -5 /tmp/chipwin_mattias_parts.log | tee -a /tmp/chipwin.log

log "2/5 mattias A/B groups lowering"
RCTPU_MATTIAS=groups timeout 2400 python tools/profile_chain.py mattias-parts > /tmp/chipwin_mattias_groups.log 2>&1
tail -5 /tmp/chipwin_mattias_groups.log | tee -a /tmp/chipwin.log

log "3/5 batch scaling"
timeout 4800 python tools/profile_chain.py batch-scaling > /tmp/chipwin_batch.log 2>&1
tail -14 /tmp/chipwin_batch.log | tee -a /tmp/chipwin.log

log "4/5 full bench"
timeout 18000 python bench.py > /tmp/chipwin_bench.json 2> /tmp/chipwin_bench.err
tail -1 /tmp/chipwin_bench.json | tee -a /tmp/chipwin.log

log "5/5 timeout-preset probe (missing entries)"
for f in "dakrunch-manta-ray" "shane-abstract-corridor" "sudonhim-cloudy-voxel-world/" "iq-canyon" "nnedi3-nns32-2x" "kali-space-race-hd"; do
  timeout 2000 python tools/timeout_probe_tpu.py --filter "$f" --budget 1800 \
    --out "/tmp/chipwin_probe_$(echo "$f" | tr '/' '_').json" >> /tmp/chipwin_probe.log 2>&1
done
log DONE
