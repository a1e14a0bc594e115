#!/bin/bash
# One TPU-window measurement sequence (the axon tunnel has multi-hour
# outages; when it returns, run everything unattended, one client at a
# time). Logs under /tmp/chipwin_*.log, results in the repo.
set -u
cd "$(dirname "$0")/.."
TS=$(date +%H%M)
log() { echo "[chipwin $(date +%T)] $*" | tee -a /tmp/chipwin.log; }

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
