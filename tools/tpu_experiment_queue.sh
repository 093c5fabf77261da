#!/bin/bash
# Queued TPU experiments (ROUND_NOTES.md) — run top to bottom when a TPU is
# reachable.  Each step is independently skippable; results append to
# /tmp/tpu_queue_results.log (copy wins into BASELINE.md with the config).
#
# Usage: bash tools/tpu_experiment_queue.sh [step ...]   (default: all)

set -u
cd "$(dirname "$0")/.."
LOG=/tmp/tpu_queue_results.log
steps="${*:-health bench profile batch14 group_vmap serve}"

run() {  # run <name> <cmd...>
  local name=$1; shift
  echo "=== $name: $* ===" | tee -a "$LOG"
  timeout 3600 "$@" 2>&1 | grep -v cpu_aot_loader | tail -20 | tee -a "$LOG"
  echo "--- $name exit=$? ---" | tee -a "$LOG"
}

for s in $steps; do case $s in
  health)
    # fail-fast: every later step hangs forever if the relay is dead
    python tools/tpu_health.py || exit 3 ;;
  bench)
    # reproduce the 22.5 clouds/s headline at the current defaults
    run bench python bench.py ;;
  profile)
    # re-rank the cost structure at K=48 (ROUND_NOTES: the K=80 profile is
    # stale; CC while-loops + per-(item,class) small-ops are a bigger slice)
    run profile python tools/profile_step.py
    run parse python tools/parse_trace.py \
      /tmp/jax_trace/plugins/profile/*/*.trace.json.gz 3 ;;
  batch14)
    # B-sweep refinement at K=48: B=12 tied B=10 (22.60 vs 22.49); B=16 OOM
    run batch14 env GCA_BENCH_BATCH=14 python bench.py ;;
  group_vmap)
    # batched grouping/CC re-test at p=100/K=48 (rejected -3% at p200/K80)
    run group_vmap env GCA_BENCH_GROUP_VMAP=1 python bench.py ;;
  serve)
    # serving re-measure at K=48 (README still quotes K=80-era numbers)
    run serve python tools/serve_bench.py ;;
  scene)
    # first scene-family throughput number (not part of the default list —
    # compile is a fresh ~10 min program on the tunnel)
    run scene env GCA_BENCH_FAMILY=scene python bench.py ;;
  *) echo "unknown step: $s" ;;
esac; done

echo "done — results in $LOG"
