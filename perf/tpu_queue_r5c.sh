#!/bin/bash
# Round-5c queue: measure the two remaining serving levers with explicit
# envs (defaults get flipped only for measured wins), then the final
# full-default bench that warms the official end-of-round cache.
# Run AFTER perf/tpu_queue_r5b.sh completes.  Same lock discipline.
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
    timeout "$t" "$@" >> "$log" 2>&1
  else
    timeout "$t" flock -w 900 /tmp/tpu.lock "$@" >> "$log" 2>&1
  fi
  local rc=$?
  echo "rc=$rc DONE $(date -u +%H:%M:%S)" >> "$log"
  tail -3 "$log"
}

# 1. bf16 STFT on the int8 headline config (expected: frees a few ms of the
#    8.8 ms frontend knockout; drift-bounded <0.35 dB log-mel)
run probe_stft 3600 env BENCH_STFT=bf16 BENCH_FWD=0 BENCH_TRAIN=0 \
    BENCH_E2E=0 BENCH_AVS=0 python bench.py

# 2. e2e with the half-payload ingest formats (YUV420 frames + mu-law audio:
#    7.0 -> 3.5 MB per B=4 batch; expected to move e2e from ingest-bound
#    toward the decode cap)
run e2e_half 2700 env BENCH_E2E_FMT=yuv420 BENCH_E2E_WAVE=mulaw BENCH_FWD=0 \
    BENCH_INT8=0 BENCH_TRAIN=0 BENCH_AVS=0 python bench.py

echo "queue r5c complete — flip bench defaults for measured wins, then run"
echo "one full 'python bench.py' to warm the official end-of-round cache."
