#!/bin/bash
# Round-5b queue: bisect the 79.84 -> 65.9 headline regression (chip ruled
# out by perf/results_r5/roofline.log — rates identical to r4), then re-run
# the fixed train knockouts and the fixed AVS phase.  Same serialized lock
# discipline as perf/tpu_queue_r5.sh.
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

# 0. availability gate (the tunnel went dark ~09:45; don't burn timeouts)
timeout 300 flock -w 120 /tmp/tpu.lock python -c "
import time, numpy as np, jax, jax.numpy as jnp
t0=time.time(); x=jnp.ones((256,256),jnp.bfloat16)
np.asarray(jax.jit(lambda a: a@a+1)(x))
print('tunnel ok %.1fs' % (time.time()-t0))" || {
  echo "TPU unavailable"; exit 1; }

# 1. regression probe A: tanh-approx GELU (the r4 default), fold kept on.
#    Recovers ~79 -> the erf lowering is the regression.
run probe_tanh 3600 env BENCH_GELU=tanh BENCH_TRAIN=0 BENCH_E2E=0 \
    BENCH_AVS=0 python bench.py

# 2. regression probe B: exact GELU, folding OFF.
#    Recovers ~79 -> folding is the regression (unexpected: it removes work).
run probe_nofold 3600 env BENCH_FOLD=0 BENCH_TRAIN=0 BENCH_E2E=0 \
    BENCH_AVS=0 python bench.py

# 3. both reverted (r4-equivalent program): separates code from session noise
#    if neither single probe recovers.
run probe_r4cfg 3600 env BENCH_GELU=tanh BENCH_FOLD=0 BENCH_TRAIN=0 \
    BENCH_E2E=0 BENCH_AVS=0 python bench.py

# 4. train-step tail attribution (the 413 payload bug is fixed: on-device
#    batches, frozen tree as jit arg)
run knockouts_train2 7200 env KNOCKOUT_TRAIN=1 python perf/tail_knockouts.py

# 5. AVS S4 forward phase alone (dtype/arity bugs fixed)
run avs_fwd 3600 env BENCH_FWD=0 BENCH_INT8=0 BENCH_TRAIN=0 BENCH_E2E=0 \
    python bench.py

# 6. adapter stage attribution (before fusing anything: which of the 13.3 ms
# is stage 2 two-hop vs stage 3/4 modulation vs stage 5 bottleneck vs the
# stage-1 resample GEMMs)
run knockouts_adstages 5400 env KNOCKOUT_INT8=1 \
    KNOCKOUT_VARIANTS=",ad_stage1,ad_stage2,ad_stage34,ad_stage5,adapters" \
    python perf/tail_knockouts.py

echo "queue r5b complete"
