"""Corpus coverage sweep: try to load + apply every shipped .glslp.

Mirrors the reference's resilience contract (compile failure degrades to
passthrough, ShaderEngine.cpp:294-314) but here we want the raw error so
we can close frontend gaps. Each preset runs in a worker process with a
timeout (some chains take minutes to XLA-compile on CPU); on timeout the
worker is killed and restarted. Run:

    python tools/corpus_check.py [--limit N] [--filter SUBSTR] [--out report.json]
"""

from __future__ import annotations

import argparse
import json
import re
import multiprocessing as mp
import sys
import time
import traceback
from collections import Counter
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SHADERS = Path("/root/reference/shaders/shaders_glsl")


def _worker(task_q, result_q, size):
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from retrocapture_tpu.runtime.engine import Engine

    h, w = size
    frame = (np.random.default_rng(0).random((h, w, 3)) * 255).astype(np.uint8)
    while True:
        path = task_q.get()
        if path is None:
            return
        rec = {"preset": path}
        try:
            e = Engine(viewport=(2 * w, 2 * h))
            ok = e.load_preset(str(SHADERS / path))
            if not ok:
                rec["status"] = "load_fail"
                rec["error"] = e.last_error
            else:
                out = np.asarray(e.apply(frame))
                if float(out.std()) == 0.0 and np.all(np.isfinite(out)):
                    # Flat at frame 0 is not necessarily broken: the
                    # procedural family fades in from black over ~100
                    # frames (col *= smoothstep(0,2.5,FrameCount*.025)).
                    # Re-judge at FrameCount=200.
                    import dataclasses

                    import jax.numpy as jnp

                    for key, st in list(e._states.items()):
                        e._states[key] = dataclasses.replace(
                            st, frame_count=jnp.int32(200)
                        )
                    out = np.asarray(e.apply(frame))
                    rec["flat_at_frame0"] = True
                if not np.all(np.isfinite(out)):
                    rec["status"] = "nonfinite"
                elif float(out.std()) == 0.0:
                    rec["status"] = "flat"
                    rec["mean"] = float(out.mean())
                else:
                    rec["status"] = "ok" if e.shader_active else "passthrough"
                rec["shader_active"] = bool(e.shader_active)
        except Exception as ex:  # noqa: BLE001
            rec["status"] = "apply_fail"
            rec["error"] = f"{type(ex).__name__}: {ex}"
            rec["trace"] = traceback.format_exc(limit=5)
        result_q.put(rec)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--limit", type=int, default=0)
    ap.add_argument("--filter", default="")
    ap.add_argument("--out", default="corpus_report.json")
    ap.add_argument("--size", default="240x320", help="HxW of the test frame")
    ap.add_argument("--timeout", type=float, default=240.0, help="seconds per preset")
    args = ap.parse_args()

    h, w = (int(x) for x in args.size.split("x"))

    presets = sorted(SHADERS.rglob("*.glslp"))
    if args.filter:
        pat = re.compile(args.filter)
        presets = [p for p in presets if pat.search(str(p))]
    if args.limit:
        presets = presets[: args.limit]
    rels = [str(p.relative_to(SHADERS)) for p in presets]

    ctx = mp.get_context("spawn")
    task_q = result_q = proc = None

    def start_worker():
        nonlocal task_q, result_q, proc
        task_q = ctx.Queue()
        result_q = ctx.Queue()
        proc = ctx.Process(target=_worker, args=(task_q, result_q, (h, w)), daemon=True)
        proc.start()

    start_worker()
    results = []
    counts = Counter()
    t_start = time.time()
    for i, rel in enumerate(rels):
        task_q.put(rel)
        try:
            rec = result_q.get(timeout=args.timeout)
        except Exception:  # queue.Empty
            proc.kill()
            proc.join()
            rec = {"preset": rel, "status": "timeout"}
            start_worker()
        counts[rec["status"]] += 1
        results.append(rec)
        if (i + 1) % 25 == 0:
            print(
                f"[{i+1}/{len(rels)}] {dict(counts)} ({time.time()-t_start:.0f}s)",
                flush=True,
            )
    task_q.put(None)
    proc.join(timeout=5)
    if proc.is_alive():
        proc.kill()

    print(f"DONE {dict(counts)} in {time.time()-t_start:.0f}s")
    Path(args.out).write_text(json.dumps(results, indent=1))

    # top error signatures
    sigs = Counter()
    for r in results:
        if r["status"] in ("load_fail", "apply_fail"):
            sig = (r.get("error") or "")[:120]
            sigs[sig] += 1
    for sig, n in sigs.most_common(25):
        print(f"{n:4d}  {sig}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
