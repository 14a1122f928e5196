"""Measure full-size train-step throughput vs remat policy on the chip.

Round-2 rematted EVERY interleave block unconditionally (fwd recompute in
backward) and the bench did not donate buffers -> train 10.1 clips/s vs 62.7
eval. This sweep measures the three policies in `interleave.set_remat_policy`
(full / dots / none) with donated buffers, full-size AVE model, B=4, M=4
streaming scan — the exact bench_train methodology.

Run:  BENCH_TRAIN_BATCH=4 python perf/remat_sweep.py [policies...]
"""
import json
import os
import subprocess
import sys

POLICIES = sys.argv[1:] or ["dots", "full", "none"]

for pol in POLICIES:
    env = dict(os.environ, BENCH_REMAT=pol, BENCH_FWD="0", BENCH_E2E="0",
               BENCH_TRAIN="1")
    p = subprocess.run([sys.executable, "bench.py"], env=env,
                       capture_output=True, text=True, timeout=3000)
    line = [l for l in p.stdout.splitlines() if l.startswith("{")]
    try:
        r = json.loads(line[-1])
        print(json.dumps({"policy": pol,
                          "train_clips_per_sec": r.get("train_clips_per_sec"),
                          "train_compile_s": r.get("train_compile_s"),
                          "train_mfu_pct": r.get("train_mfu_pct"),
                          "error": r.get("train_error")}))
    except Exception:
        print(json.dumps({"policy": pol, "rc": p.returncode,
                          "tail": p.stdout[-300:] + p.stderr[-300:]}))
