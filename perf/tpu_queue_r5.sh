#!/bin/bash
# Round-5 serialized TPU measurement queue (same lock discipline as
# perf/tpu_queue.sh: ONE TPU job at a time on this 1-core host; every step
# shares /tmp/tpu.lock with bench.py).  NEVER leave this running near the
# end of the round.
# Usage: bash perf/tpu_queue_r5.sh   (idempotent: skips steps marked DONE)
set -u
cd "$(dirname "$0")/.."
RESULTS=perf/results_r5
mkdir -p "$RESULTS"

run() {  # run <name> <timeout_s> <cmd...>
  local name="$1" t="$2"; shift 2
  local log="$RESULTS/$name.log"
  if [ -s "$log" ] && grep -q DONE "$log"; then
    echo "skip $name (done)"; return 0
  fi
  echo "=== $name start $(date -u +%H:%M:%S) ===" | tee "$log"
  local last="${*: -1}"
  if [[ "$last" == bench.py ]]; then
    timeout "$t" "$@" >> "$log" 2>&1          # bench.py locks internally
  else
    timeout "$t" flock -w 900 /tmp/tpu.lock "$@" >> "$log" 2>&1
  fi
  local rc=$?
  echo "rc=$rc DONE $(date -u +%H:%M:%S)" >> "$log"
  tail -3 "$log"
}

# 0. availability gate
timeout 180 python -c "import jax; print(jax.devices())" || {
  echo "TPU unavailable"; exit 1; }

# 1. full bench FIRST: new program set (exact gelu + adapter fold + AVS
# phase) — warms the persistent cache the driver's end-of-round run reuses.
run bench_full 7200 python bench.py

# 2. train-step tail attribution (VERDICT #5; the r4 log came back empty)
run knockouts_train 7200 env KNOCKOUT_TRAIN=1 python perf/tail_knockouts.py

# 3. int8-attn resolution (VERDICT #7): one serialized measurement on the
# int8 headline config, forward phases only
run int8_attn 5400 env BENCH_INT8_ATTN=1 BENCH_FWD=0 BENCH_TRAIN=0 \
    BENCH_E2E=0 BENCH_AVS=0 python bench.py

# 4. compile-floor outlier (VERDICT #6): re-measure the 1548s single-block
# probe on a quiet chip
run compile_floor 5400 python perf/compile_floor.py

# 5. e2e overlap sweep (VERDICT #4): worker/prefetch/double-buffer tuning —
# no model recompiles (the e2e program is already cached from step 1)
for nw in 2 4 8; do
  run e2e_w$nw 2700 env BENCH_FWD=0 BENCH_INT8=0 BENCH_TRAIN=0 BENCH_AVS=0 \
      BENCH_E2E_WORKERS=$nw python bench.py
done

echo "queue complete"
