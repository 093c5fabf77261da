#!/bin/bash
# Queued TPU experiments (ROUND_NOTES.md) — run top to bottom when a TPU is
# reachable.  Each step is independently skippable; results append to
# /tmp/tpu_queue_results.log (copy wins into BASELINE.md with the config).
#
# Usage: bash tools/tpu_experiment_queue.sh [step ...]   (default: all)
#
# Every step re-gates on tools/tpu_health.py: the tunnel relay dies silently
# (three times on 2026-08-19 alone) and a dead relay makes every jax call
# block forever — without the gate each queued step burns its full 1h
# timeout against a wedged device.  The gate waits (5-min retries) instead
# of exiting so the queue survives a mid-run wedge and resumes on recovery.
#
# NOTE: avoid the `profile` step unless needed — jax.profiler trace
# collection has wedged the tunnel relay before (micro_bench/edgebwd gives
# profiler-free attribution).

set -u
cd "$(dirname "$0")/.."
LOG=/tmp/tpu_queue_results.log
steps="${*:-bench inner scene_conv serve group_vmap micro}"

waittpu() {  # returns 1 if the deadline passes while waiting
  # GCA_QUEUE_PROBE (default 120s) — raise when the relay is in its
  # "slow but alive" state (ops complete but take minutes to start;
  # observed 2026-08-21 00:03-00:30: 120s probes failed for 25 min while a
  # 500s probe succeeded)
  local pt="${GCA_QUEUE_PROBE:-120}"
  until GCA_TPU_PROBE_TIMEOUT="$pt" timeout $((pt + 60)) \
      python tools/tpu_health.py >> "$LOG" 2>&1; do
    if [[ -n "${GCA_QUEUE_DEADLINE:-}" ]] \
        && (( GCA_QUEUE_DEADLINE - $(date +%s) < 120 )); then
      return 1
    fi
    echo "$(date -u +%H:%M) tpu not ready, retrying in 300s" | tee -a "$LOG"
    sleep 300
  done
}

run() {  # run <name> <cmd...>
  local name=$1; shift
  # GCA_QUEUE_DEADLINE (unix epoch seconds) bounds the whole queue: the
  # round driver runs bench.py on the one TPU chip at round end, and a
  # queued run still holding the device would block it.  Past-deadline
  # steps are skipped; an in-flight step is killed when it crosses the
  # deadline (its partial JSONL still feeds tools/gate_report.py).
  # Order matters: waittpu FIRST (its 5-min retry loop is unbounded on a
  # wedged relay), then the deadline check + limit from the post-wait
  # clock — otherwise a step can start after the deadline and hold the
  # chip through the driver's bench.
  if ! waittpu; then
    echo "=== $name SKIPPED (deadline reached while waiting for tpu) ===" \
      | tee -a "$LOG"
    return
  fi
  # per-step wall limit: GCA_STEP_LIMIT (default 1h; joint3k strict runs
  # need ~50-70 min -> set 5400 for that queue), always clipped by the
  # deadline — a wedged mid-run step must not hold the chip for the whole
  # remaining round (a killed convergence run's partial JSONL still feeds
  # gate_report).
  local limit="${GCA_STEP_LIMIT:-3600}"
  if [[ -n "${GCA_QUEUE_DEADLINE:-}" ]]; then
    local left=$(( GCA_QUEUE_DEADLINE - $(date +%s) ))
    if (( left < 120 )); then
      echo "=== $name SKIPPED (deadline reached) ===" | tee -a "$LOG"
      return
    fi
    (( left < limit )) && limit=$left
  fi
  echo "=== $name: $* ===" | tee -a "$LOG"
  timeout "$limit" "$@" 2>&1 | grep -v cpu_aot_loader | tail -30 | tee -a "$LOG"
  echo "--- $name exit=$? ---" | tee -a "$LOG"
}

runwatch() {  # run <name> <cmd...> with a JSONL stall watchdog
  # Automates the round-3 operational rule: a long-lived tunnel client can
  # crawl while fresh clients run full speed (BASELINE.md 2026-08-20), so
  # when the step's --out JSONL goes GCA_STALL_MIN (default 15) minutes
  # without a new row, kill the run and restart it ONCE from scratch
  # (convergence runs are seed-deterministic; the restart re-reaches the
  # stall point at fresh-client pace).  The cmd must contain "--out <file>".
  local name=$1; shift
  local out=""
  local prev=""
  for a in "$@"; do [[ "$prev" == "--out" ]] && out=$a; prev=$a; done
  local stall_s=$(( ${GCA_STALL_MIN:-15} * 60 ))
  local attempt
  for attempt in 1 2; do
    if ! waittpu; then
      echo "=== $name SKIPPED (deadline while waiting for tpu) ===" \
        | tee -a "$LOG"
      return
    fi
    local limit="${GCA_STEP_LIMIT:-3600}"
    if [[ -n "${GCA_QUEUE_DEADLINE:-}" ]]; then
      local left=$(( GCA_QUEUE_DEADLINE - $(date +%s) ))
      if (( left < 120 )); then
        echo "=== $name SKIPPED (deadline) ===" | tee -a "$LOG"; return
      fi
      (( left < limit )) && limit=$left
    fi
    echo "=== $name (attempt $attempt): $* ===" | tee -a "$LOG"
    # a stale file from a previous killed run must not trip the watchdog
    # the moment this attempt starts
    [[ -n "$out" ]] && rm -f "$out"
    local started=$(date +%s)
    timeout "$limit" "$@" > /tmp/runwatch_$name.log 2>&1 &
    local pid=$!
    local stalled=0
    while kill -0 $pid 2>/dev/null; do
      sleep 60
      if [[ -n "$out" && ! -f "$out" ]]; then
        # no row yet: compile/first-eval grace of 2x the stall budget
        if (( $(date +%s) - started > 2 * stall_s )); then
          echo "--- $name NO OUTPUT after $((2 * stall_s))s — killing ---" \
            | tee -a "$LOG"
          kill $pid 2>/dev/null; sleep 3; kill -9 $pid 2>/dev/null
          stalled=1
          break
        fi
      elif [[ -n "$out" && -f "$out" ]]; then
        local age=$(( $(date +%s) - $(stat -c %Y "$out") ))
        if (( age > stall_s )); then
          echo "--- $name STALLED (${age}s since last row) — killing ---" \
            | tee -a "$LOG"
          kill $pid 2>/dev/null; sleep 3; kill -9 $pid 2>/dev/null
          stalled=1
          break
        fi
      fi
      if [[ -n "${GCA_QUEUE_DEADLINE:-}" ]] \
          && (( GCA_QUEUE_DEADLINE - $(date +%s) < 0 )); then
        kill $pid 2>/dev/null
        break
      fi
    done
    wait $pid 2>/dev/null
    tail -30 /tmp/runwatch_$name.log | grep -v cpu_aot_loader | tee -a "$LOG"
    echo "--- $name exit=$? stalled=$stalled ---" | tee -a "$LOG"
    (( stalled )) || return
  done
}

for s in $steps; do case $s in
  health)
    python tools/tpu_health.py || exit 3 ;;
  bench)
    # reproduce the headline at the current defaults (23.2 on the fast relay
    # host, 22.5 on the session-5 host — pair A/Bs same-host, same-hour)
    run bench python bench.py ;;
  inner)
    # nn_nb_inner: lower graph degree for edge convs 2-3 only (layer-1 K=48
    # kept); their gather/scatter cost is linear in k.  Paired sweep; a win
    # needs the convergence A/B (tools/convergence_run.py --nn-nb-inner N,
    # default + --hard mixes) before any default change
    run inner_ctrl  python bench.py
    run inner32     env GCA_BENCH_NN_INNER=32 python bench.py
    run inner24     env GCA_BENCH_NN_INNER=24 python bench.py
    run inner_ctrl2 python bench.py ;;
  inner_conv)
    # convergence gates for the inner-degree win (bench: inner=24 30.3,
    # inner=32 27.1, control 23.2 clouds/s).  Protocol matches the K-sweep:
    # 1000 steps, step-1000 mIoU/type-mIoU, default + hard mixes, seed-2
    # repeat on the default mix.  Controls on file (inner=0/K=48): default
    # s0 0.857/0.975, default s2 0.884/0.982, hard s0 0.869/0.960.
    run i24_def_s0 python tools/convergence_run.py --steps 1000 \
      --nn-nb-inner 24 --out /tmp/conv_i24_def_s0.jsonl
    run i24_hard_s0 python tools/convergence_run.py --steps 1000 \
      --nn-nb-inner 24 --hard --out /tmp/conv_i24_hard_s0.jsonl
    run i24_def_s2 python tools/convergence_run.py --steps 1000 \
      --nn-nb-inner 24 --seed 2 --out /tmp/conv_i24_def_s2.jsonl
    run i32_def_s0 python tools/convergence_run.py --steps 1000 \
      --nn-nb-inner 32 --out /tmp/conv_i32_def_s0.jsonl
    run i32_hard_s0 python tools/convergence_run.py --steps 1000 \
      --nn-nb-inner 32 --hard --out /tmp/conv_i32_hard_s0.jsonl
    run i32_def_s2 python tools/convergence_run.py --steps 1000 \
      --nn-nb-inner 32 --seed 2 --out /tmp/conv_i32_def_s2.jsonl ;;
  inner_tiebreak)
    # Remaining confirmation pairs for the (provisionally ADOPTED,
    # BASELINE.md 2026-08-20 session 9) nn_nb_inner=32 default:
    # i32_def_s3 already ran (0.858/1.000 — PASS); still pending are its
    # paired control and the second hard seed.  Collate with
    #   python tools/gate_report.py /tmp/conv_*.jsonl \
    #     --pair i32_def_s3=k48_def_s3 --pair i32_hard_s2=k48_hard_s2
    # REVERT Config.nn_nb_inner to 0 if the drop reproduces.
    run k48_def_s3 python tools/convergence_run.py --steps 1000 \
      --seed 3 --out /tmp/conv_k48_def_s3.jsonl
    run i32_hard_s2 python tools/convergence_run.py --steps 1000 \
      --nn-nb-inner 32 --hard --seed 2 --out /tmp/conv_i32_hard_s2.jsonl
    run k48_hard_s2 python tools/convergence_run.py --steps 1000 \
      --hard --seed 2 --out /tmp/conv_k48_hard_s2.jsonl ;;
  inner_perf)
    # perf follow-ups at the adopted inner-degree candidate (INNER=24|32,
    # whichever passes the convergence gate): the smaller [B,N,k2,C] edge
    # tensors for layers 2-3 may move the OOM boundary (B re-sweep),
    # re-rank the stage attribution, and re-test batched grouping (the
    # grouping slice is relatively bigger once the edge convs shrink)
    ik="${INNER:-24}"
    run i${ik}_bench python bench.py
    run i${ik}_b12 env GCA_BENCH_NN_INNER=$ik GCA_BENCH_BATCH=12 python bench.py
    run i${ik}_b14 env GCA_BENCH_NN_INNER=$ik GCA_BENCH_BATCH=14 python bench.py
    run i${ik}_micro env GCA_BENCH_NN_INNER=$ik python tools/micro_bench.py \
      knn,encoder,model_fwd,graph,cc,grouping,voxelize,head,losses,step
    run i${ik}_gvmap env GCA_BENCH_NN_INNER=$ik GCA_BENCH_GROUP_VMAP=1 \
      python bench.py ;;
  strict_bench)
    # VERDICT r2 item 2: the strict-parity throughput line — every escape
    # hatch disengaged (K=80 uniform, p=200, exact lax.top_k kNN, fp32) —
    # paired with the tuned headline on the same host/hour so the 5.48x
    # claim decomposes into TPU-native vs algorithmic-deviation factors.
    run strict_parity env GCA_BENCH_NN=80 GCA_BENCH_NN_INNER=0 \
      GCA_BENCH_PROPOSALS=200 GCA_BENCH_KNN=xla python bench.py
    run tuned_headline python bench.py ;;
  joint3k)
    # VERDICT r2 item 3: joint long-horizon deviation A/B — the FULL tuned
    # stack (K=48, inner=32, p=100, approx-kNN 0.8) vs the FULL strict-parity
    # stack (K=80, inner=0, p=200, exact kNN) at 3000 steps, both mixes.
    # Per-knob 1000-step gates cannot see compounding deviations; this can.
    run j3k_tuned_def python tools/convergence_run.py --steps 3000 \
      --nn-nb-inner 32 --max-proposals 100 --out /tmp/conv_j3k_tuned_def.jsonl
    run j3k_strict_def python tools/convergence_run.py --steps 3000 \
      --nn-nb 80 --recall exact --max-proposals 200 \
      --out /tmp/conv_j3k_strict_def.jsonl
    run j3k_tuned_hard python tools/convergence_run.py --steps 3000 --hard \
      --nn-nb-inner 32 --max-proposals 100 --out /tmp/conv_j3k_tuned_hard.jsonl
    run j3k_strict_hard python tools/convergence_run.py --steps 3000 --hard \
      --nn-nb 80 --recall exact --max-proposals 200 \
      --out /tmp/conv_j3k_strict_hard.jsonl ;;
  joint3k_s1)
    # seed-1 repeats of joint3k (run if TPU time remains)
    run j3k_tuned_def_s1 python tools/convergence_run.py --steps 3000 \
      --seed 1 --nn-nb-inner 32 --max-proposals 100 \
      --out /tmp/conv_j3k_tuned_def_s1.jsonl
    run j3k_strict_def_s1 python tools/convergence_run.py --steps 3000 \
      --seed 1 --nn-nb 80 --recall exact --max-proposals 200 \
      --out /tmp/conv_j3k_strict_def_s1.jsonl
    run j3k_tuned_hard_s1 python tools/convergence_run.py --steps 3000 \
      --hard --seed 1 --nn-nb-inner 32 --max-proposals 100 \
      --out /tmp/conv_j3k_tuned_hard_s1.jsonl
    run j3k_strict_hard_s1 python tools/convergence_run.py --steps 3000 \
      --hard --seed 1 --nn-nb 80 --recall exact --max-proposals 200 \
      --out /tmp/conv_j3k_strict_hard_s1.jsonl ;;
  j3k_finish)
    # VERDICT r3 item 1: close the tuned-defaults evidence gap.  (a) the
    # strict_def 3000-step control died at step 500 (tunnel stall) — re-run
    # it to completion; (b) seed-1 repeats of the joint pair, HARD mix first
    # (the contested mix: the inner=32 revert trigger fired there).
    # Collate: python tools/gate_report.py /tmp/conv_j3k_*.jsonl \
    #   --pair j3k_tuned_def=j3k_strict_def --pair j3k_tuned_hard=j3k_strict_hard \
    #   --pair j3k_tuned_hard_s1=j3k_strict_hard_s1 --pair j3k_tuned_def_s1=j3k_strict_def_s1
    runwatch j3k_strict_def python tools/convergence_run.py --steps 3000 \
      --nn-nb 80 --recall exact --max-proposals 200 \
      --out /tmp/conv_j3k_strict_def.jsonl
    runwatch j3k_tuned_def_s1 python tools/convergence_run.py --steps 3000 \
      --seed 1 --nn-nb-inner 32 --max-proposals 100 \
      --out /tmp/conv_j3k_tuned_def_s1.jsonl
    runwatch j3k_strict_def_s1 python tools/convergence_run.py --steps 3000 \
      --seed 1 --nn-nb 80 --recall exact --max-proposals 200 \
      --out /tmp/conv_j3k_strict_def_s1.jsonl ;;
  j3k_hard_s1)
    # (tuned_hard_s1 completed 2026-08-20 21:33; re-run only the strict
    # control if its first attempt was truncated before step ~2250)
    run j3k_strict_hard_s1 python tools/convergence_run.py --steps 3000 \
      --hard --seed 1 --nn-nb 80 --recall exact --max-proposals 200 \
      --out /tmp/conv_j3k_strict_hard_s1b.jsonl ;;
  scene_soft)
    # Round-5 deviation-#7 closure: SOFT per-class grouping is the new scene
    # default (softgroup.py:437 semantics) — measure its cost vs the argmax
    # partition, same B, same hour.
    run scene_soft_b4   env GCA_BENCH_FAMILY=scene GCA_BENCH_BATCH=4 python bench.py
    run scene_argmax_b4 env GCA_BENCH_FAMILY=scene GCA_BENCH_BATCH=4 \
      GCA_BENCH_SCENE_SOFT=0 python bench.py ;;
  scene_r5_extra)
    # round-5 follow-ups: B>8 plain (B=8 fits without remat, trend rising),
    # grid-48 at the winning batch, and the fixed multi-class CC A/B pair
    run scene_b10_plain env GCA_BENCH_FAMILY=scene GCA_BENCH_BATCH=10 python bench.py
    run scene_g48_b8   env GCA_BENCH_FAMILY=scene GCA_BENCH_BATCH=8 \
      GCA_BENCH_SCENE_GRID=48 python bench.py
    run scene_b8_ctrl  env GCA_BENCH_FAMILY=scene GCA_BENCH_BATCH=8 \
      python bench.py
    run scene_b12_plain env GCA_BENCH_FAMILY=scene GCA_BENCH_BATCH=12 python bench.py ;;
  scene_g48_conv)
    # grid-48 adoption gate: scene convergence at grid 64 (bench default,
    # control) vs 48 (candidate) — soft grouping, same seed/steps
    runwatch gconv_g64 python tools/scene_convergence_run.py --steps 1500 \
      --bf16 --grid 64 --out /tmp/scene_conv_g64.jsonl
    runwatch gconv_g48 python tools/scene_convergence_run.py --steps 1500 \
      --bf16 --grid 48 --out /tmp/scene_conv_g48.jsonl ;;
  # (scene_soft_cc step removed: the fused multi-class CC sweep was
  # REJECTED 2026-08-21 — 20.45 vs 21.95 clouds/s paired at B=8 — and its
  # code deleted; cc_pallas.py tombstone 2 + BASELINE.md keep the record.)
  scene_soft_conv)
    # soft-vs-argmax AP convergence gate (VERDICT r4 item 2: "AP not
    # degraded vs argmax"): same seed/steps/defaults, only grouping differs
    runwatch scene_conv_soft python tools/scene_convergence_run.py \
      --steps 1500 --bf16 --out /tmp/scene_conv_soft_s0.jsonl
    runwatch scene_conv_argmax python tools/scene_convergence_run.py \
      --steps 1500 --bf16 --soft 0 --out /tmp/scene_conv_argmax_s0.jsonl ;;
  j3k_def_r5)
    # strict_def full-3000 re-run alone (r4's was stall-killed at 2500)
    runwatch j3k_strict_def_r5 python tools/convergence_run.py --steps 3000 \
      --nn-nb 80 --recall exact --max-proposals 200 \
      --out /tmp/conv_j3k_strict_def_r5.jsonl ;;
  j3k_close)
    # VERDICT r4 item 4: the LAST missing tuned-defaults cells —
    # strict_def_s1 (never ran) and a strict_def full-3000 re-run (r4's was
    # stall-killed at step 2500).
    runwatch j3k_strict_def_s1 python tools/convergence_run.py --steps 3000 \
      --seed 1 --nn-nb 80 --recall exact --max-proposals 200 \
      --out /tmp/conv_j3k_strict_def_s1.jsonl
    runwatch j3k_strict_def_r5 python tools/convergence_run.py --steps 3000 \
      --nn-nb 80 --recall exact --max-proposals 200 \
      --out /tmp/conv_j3k_strict_def_r5.jsonl ;;
  # (cc_pallas32 step removed round 5: the bit-packed sweep was REJECTED
  # round 4 — isolated 52.6 vs 40.9 ms, e2e -2.6% — and its code deleted;
  # BASELINE.md round-4 rows keep the record.)
  cc_pallas)
    # Pallas tiled CC sweep vs the XLA select+min sweep (ops/cc_pallas.py).
    # Stage-level A/B first (CC in isolation), then end-to-end.
    run cc_xla    python tools/micro_bench.py cc
    run cc_pal    env GCA_BENCH_CC_PALLAS=1 python tools/micro_bench.py cc
    run cc_bench  env GCA_BENCH_CC_PALLAS=1 python bench.py
    run cc_ctrl   python bench.py ;;
  scene_conv)
    # scene-family bf16 accuracy gate (bench win already measured: 19.50 vs
    # 16.17 clouds/s, +20.6%); 2 seeds each, ~8 min per run on a v5e
    run scene_fp32_s0 python tools/scene_convergence_run.py --steps 1500 \
      --out /tmp/scene_conv_fp32_s0.jsonl
    run scene_bf16_s0 python tools/scene_convergence_run.py --steps 1500 \
      --bf16 --out /tmp/scene_conv_bf16_s0.jsonl
    run scene_fp32_s1 python tools/scene_convergence_run.py --steps 1500 \
      --seed 1 --out /tmp/scene_conv_fp32_s1.jsonl
    run scene_bf16_s1 python tools/scene_convergence_run.py --steps 1500 \
      --seed 1 --bf16 --out /tmp/scene_conv_bf16_s1.jsonl ;;
  serve)
    # K=48 serving re-measure (the 2026-08-19 21:24 numbers are contaminated
    # by a concurrent CPU drive; run this on an otherwise idle host)
    run serve python tools/serve_bench.py ;;
  scene_perf)
    # VERDICT r3 item 5: scene-family ladder.  Baseline B=4 19.5 clouds/s
    # (bf16).  (a) batch lift via U-Net remat (GCA_BENCH_SCENE_REMAT drops
    # the [B, G^3, C] block activations that OOM'd B=10); (b) raw B sweep;
    # (c) grid 48 (semantics change -> convergence gate before adoption).
    run scene_b4_ctrl env GCA_BENCH_FAMILY=scene GCA_BENCH_BATCH=4 python bench.py
    run scene_b6      env GCA_BENCH_FAMILY=scene GCA_BENCH_BATCH=6 python bench.py
    run scene_b8      env GCA_BENCH_FAMILY=scene GCA_BENCH_BATCH=8 python bench.py
    run scene_b8_rem  env GCA_BENCH_FAMILY=scene GCA_BENCH_BATCH=8 \
      GCA_BENCH_SCENE_REMAT=1 python bench.py
    run scene_b10_rem env GCA_BENCH_FAMILY=scene GCA_BENCH_BATCH=10 \
      GCA_BENCH_SCENE_REMAT=1 python bench.py
    run scene_b12_rem env GCA_BENCH_FAMILY=scene GCA_BENCH_BATCH=12 \
      GCA_BENCH_SCENE_REMAT=1 python bench.py
    run scene_g48_b4  env GCA_BENCH_FAMILY=scene GCA_BENCH_BATCH=4 \
      GCA_BENCH_SCENE_GRID=48 python bench.py ;;
  group_vmap)
    # batched-CC grouping re-test at p=100/K=48 (rejected -3% at p=200/K=80)
    run group_vmap env GCA_BENCH_GROUP_VMAP=1 python bench.py
    run group_ctrl python bench.py ;;
  micro)
    # K=48 per-stage attribution (profiler-free; decision input for the
    # next perf lever ranking)
    run micro python tools/micro_bench.py \
      knn,encoder,model_fwd,graph,cc,grouping,voxelize,head,losses,step ;;
  edgebwd)
    run edgebwd python tools/micro_bench.py edgebwd ;;
  batch14)
    run batch14 env GCA_BENCH_BATCH=14 python bench.py ;;
  profile)
    # trace-based attribution — CAN WEDGE THE RELAY; last resort
    run profile python tools/profile_step.py
    run parse python tools/parse_trace.py \
      /tmp/jax_trace/plugins/profile/*/*.trace.json.gz 3 ;;
  *) echo "unknown step: $s" ;;
esac; done

echo "done — results in $LOG"
