#!/bin/bash
# Queued TPU experiments (ROUND_NOTES.md) — run top to bottom when a TPU is
# reachable.  Each step is independently skippable; results append to
# /tmp/tpu_queue_results.log (copy wins into BASELINE.md with the config).
#
# Usage: bash tools/tpu_experiment_queue.sh [step ...]   (default: all)
#
# NOTE: avoid the `profile` step unless needed — jax.profiler trace
# collection has wedged the tunnel relay before (micro_bench/edgebwd gives
# profiler-free attribution).

set -u
cd "$(dirname "$0")/.."
LOG=/tmp/tpu_queue_results.log
steps="${*:-health bench edgebwd shared_graph revgather scene_bf16}"

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
  edgebwd)
    # scatter vs reverse-gather backward + the rev-index argsort, in
    # isolation at the bench shapes (decision input for Config.edge_backward)
    run edgebwd python tools/micro_bench.py edgebwd ;;
  shared_graph)
    # one graph for all 3 edge convs (saves 2 feature-space kNN per step);
    # accuracy A/B must follow before any default change
    run shared_graph env GCA_BENCH_SHARED_GRAPH=1 python bench.py ;;
  revgather)
    # reverse-gather edge backward at in-degree cap 64, alone and with the
    # shared graph (one argsort serves both convs only conceptually — each
    # conv still sorts its own idx; shared graph makes both idx identical,
    # letting XLA CSE the sort)
    run revgather env GCA_BENCH_EDGE_BWD=revgather:64 python bench.py
    run revgather_shared env GCA_BENCH_EDGE_BWD=revgather:64 \
      GCA_BENCH_SHARED_GRAPH=1 python bench.py ;;
  scene_bf16)
    # scene-family backbone bf16 A/B (scene is dense-conv bound): bench pair
    # then the convergence pair (tools/scene_convergence_run.py)
    run scene env GCA_BENCH_FAMILY=scene GCA_BENCH_BATCH=4 python bench.py
    run scene_bf16 env GCA_BENCH_FAMILY=scene GCA_BENCH_BATCH=4 \
      GCA_BENCH_SCENE_BF16=1 python bench.py ;;
  scene_conv)
    # scene accuracy A/B (fp32 vs bf16), synthetic, ~8 min each on a v5e
    run scene_conv_fp32 python tools/scene_convergence_run.py --steps 1500 \
      --out /tmp/scene_conv_fp32.jsonl
    run scene_conv_bf16 python tools/scene_convergence_run.py --steps 1500 \
      --bf16 --out /tmp/scene_conv_bf16.jsonl ;;
  profile)
    # trace-based attribution — CAN WEDGE THE RELAY; last resort
    run profile python tools/profile_step.py
    run parse python tools/parse_trace.py \
      /tmp/jax_trace/plugins/profile/*/*.trace.json.gz 3 ;;
  batch14)
    run batch14 env GCA_BENCH_BATCH=14 python bench.py ;;
  group_vmap)
    run group_vmap env GCA_BENCH_GROUP_VMAP=1 python bench.py ;;
  serve)
    run serve python tools/serve_bench.py ;;
  *) echo "unknown step: $s" ;;
esac; done

echo "done — results in $LOG"
