#!/bin/bash
# Round-4c serialized TPU queue: measure the int8 stage-1 adapter coverage
# (token_resample/chan_align now quantization-eligible via
# adapter._token_linear — fat int8 share 68.2% -> 88.2%, projected matmul
# ceiling 124.6 -> 132.7 TF/s, perf/int8_coverage.py).  Step 1 recalibrates
# (the adapter qid walk shifted; bench detects the stale fingerprint) and
# re-measures the headline at B=4; steps 2-3 re-answer the eval batch
# question for the new program; step 4 runs the FULL default bench so every
# program the driver's end-of-round bench compiles is warm in the
# persistent cache.  Same lock protocol as perf/tpu_queue.sh
# (/tmp/tpu.lock; NEVER two TPU jobs at once).
set -u
cd "$(dirname "$0")/.."
RESULTS=perf/results_r4
mkdir -p "$RESULTS"

run() {  # run <name> <timeout_s> <cmd...>
  local name="$1" t="$2"; shift 2
  local log="$RESULTS/$name.log"
  if [ -s "$log" ] && grep -q DONE "$log"; then
    echo "skip $name (done)"; return 0
  fi
  echo "=== $name start $(date -u +%H:%M:%S) ===" | tee "$log"
  timeout "$t" "$@" >> "$log" 2>&1   # bench.py locks internally (BENCH_LOCK_WAIT)
  local rc=$?
  echo "rc=$rc DONE $(date -u +%H:%M:%S)" >> "$log"
  tail -3 "$log"
}

timeout 180 flock -w 600 /tmp/tpu.lock python -c "import jax; print(jax.devices())" || {
  echo "TPU unavailable"; exit 1; }

# 1. recalibrate + int8 headline B=4 with stage-1 adapter int8 (fresh compile)
run fwd_b4_s1int8 5400 env BENCH_INT8_RECAL=1 BENCH_FWD=0 BENCH_TRAIN=0 \
    BENCH_E2E=0 BENCH_LOCK_WAIT=10800 python bench.py

# 2-3. eval batch sweep for the new program
for b in 6 8; do
  run fwd_b${b}_s1int8 5400 env BENCH_BATCH=$b BENCH_FWD=0 BENCH_TRAIN=0 \
      BENCH_E2E=0 BENCH_LOCK_WAIT=10800 python bench.py
done

# 4. full default bench (warms the driver's exact end-of-round programs:
#    int8 fwd B=4, bf16 fwd, train, e2e)
run bench_full_s1int8 7200 env BENCH_LOCK_WAIT=10800 python bench.py

echo "r4c queue complete"
