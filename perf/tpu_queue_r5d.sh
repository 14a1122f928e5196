#!/bin/bash
# Round-5d ENDGAME queue: run after tpu_queue_r5c.sh completes and after any
# final default flips are committed.  Purpose: leave the machine in the exact
# state the driver's end-of-round artifacts are produced from —
#   1. one full DEFAULT `python bench.py` (the official program set) so the
#      persistent compile cache is warm for BENCH_r05;
#   2. one streamed dryrun_multichip(8) so the XLA:CPU cache is warm for
#      MULTICHIP_r05.
# Same serialized lock discipline as the other queues; NEVER leave anything
# running near round end.
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

# 1. the official end-of-round program set, exactly as the driver will run it
run bench_final 7200 python bench.py

# 2. multichip dryrun warm (CPU; under the lock so it never contends with a
#    TPU measurement on this 1-core host)
run dryrun_warm 1800 python __graft_entry__.py

echo "queue r5d complete — repo is in end-of-round state"
