"""Headline benchmark: full train step (fwd+bwd+update) throughput on TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload: 8192-point ABC-like clouds (synthetic, same schema as the real
loader), full GCANet-class pipeline — encoder kNN + 3 edge convs, all heads,
offset module, gated grouping + CC + HAIS, proposal voxelisation, instance
U-Net, all losses, Adam update.  Metric is point clouds/sec/chip.

``vs_baseline``: the reference publishes no numbers (BASELINE.md); the
documented proxy is an estimated 5 clouds/s for the PyTorch reference
(batch 3 @ 7000 pts on an A100) — vs_baseline = ours / 5.0.
"""

import json
import os
import time

from gcanet_tpu.runtime_setup import enable_compilation_cache

A100_REFERENCE_CLOUDS_PER_SEC = 5.0  # documented estimate, see BASELINE.md


def main():
    # Fail fast if the TPU tunnel is unusable: every jax call (even
    # jax.devices()) blocks FOREVER at 0% CPU when the relay is dead, and a
    # WEDGED relay (process up, ports open, device ops never complete —
    # observed after jax.profiler traces) hangs exactly the same way.  A
    # bounded out-of-process probe of a trivial device op distinguishes both
    # from "healthy but compiling": the probe op is tiny and completes in
    # seconds on any live relay, warm or cold.
    if os.environ.get("GCA_PLATFORM", "") != "cpu":
        import sys
        sys.path.insert(0, os.path.join(os.path.dirname(
            os.path.abspath(__file__)), "tools"))
        import tpu_health

        probe_s = int(os.environ.get("GCA_BENCH_PROBE_TIMEOUT", "600"))
        dead = not tpu_health.relay_alive()
        if dead or not tpu_health.device_op_ok(probe_s):
            fam = os.environ.get("GCA_BENCH_FAMILY", "abc")
            print(json.dumps({
                "metric": ("scene_" if fam == "scene" else "")
                          + "train_clouds_per_sec_per_chip_8k_pts",
                "value": 0.0, "unit": "clouds/s", "vs_baseline": 0.0,
                "error": ("TPU tunnel relay dead" if dead else
                          f"TPU relay wedged (device op timed out after "
                          f"{probe_s}s)") + " (tools/tpu_health.py); "
                         "bench not run",
            }))
            raise SystemExit(3)
    enable_compilation_cache()
    # imports AFTER the guard + platform pinning: model/ops imports must not
    # touch the (possibly dead) TPU before GCA_PLATFORM is applied
    import jax
    import jax.numpy as jnp

    from gcanet_tpu.config import bench_config
    from gcanet_tpu.data.synthetic import synth_batch, synth_scene_batch
    from gcanet_tpu.train import step as step_lib
    # batch 10 is the single-chip sweet spot (re-swept at max_proposals=100:
    # B=10 -> 16.0, B=12 -> 15.1 clouds/s, B=16 OOM; BASELINE.md round-2 log)
    cfg = bench_config()
    tx = step_lib.make_optimizer(cfg)
    # GCA_BENCH_FAMILY=scene benches the SoftGroup scene family instead of
    # the ABC flagship (distinct metric name; the driver's headline is the
    # default family)
    family = os.environ.get("GCA_BENCH_FAMILY", "abc")
    # GCA_BENCH_MESH=N measures the data-parallel shard_map path over an
    # N-device mesh (psum-averaged grads over ICI); default is the driver's
    # single-chip headline
    mesh = step_lib.make_mesh(cfg)
    if family == "scene":
        from gcanet_tpu.config import scene_grouping_defaults
        from gcanet_tpu.models.softgroup_scene import SoftGroupNet
        from gcanet_tpu.train import scene_step

        # scene workload uses the SoftGroup scannetv2 grouping recipe with
        # the mean table at the synthetic per-class instance size (n/5)
        cfg = cfg.replace(grouping=scene_grouping_defaults(
            cfg.grouping,
            class_numpoint_mean=(cfg.num_points / 5.0,) * 10))
        if "GCA_BENCH_BATCH" not in os.environ:
            # scene sweet spot is B=8 (ladder, BASELINE round-5: 21.95 at
            # grid 64 / 33.78 at grid 48 vs B=10's 17.6/30.5) — the ABC
            # headline's B=10 default is wrong for this family
            cfg = cfg.replace(batch_size=8)
        # scene grid default 48 (ADOPTED 2026-08-21 round 5): +54% over
        # grid 64 at B=8 (33.78 vs 21.95 clouds/s), convergence gate green
        # (gconv_g64 vs gconv_g48, docs/conv_r5/ — identical AP50 at the
        # last common step, sem-mIoU within the ±0.05 band).  The dense
        # grid is a TPU design knob, not reference parity (spconv uses a
        # dynamic voxel hash); GCA_BENCH_SCENE_GRID=64 restores the old
        # workload.  SoftGroupNet's model default stays 64 (the
        # capacity-conservative choice for real scans).
        model = SoftGroupNet(
            cfg, scene_grid=int(os.environ.get("GCA_BENCH_SCENE_GRID", "48")),
            # default follows Config.scene_bf16 (ON since the 2026-08-20
            # convergence gate); GCA_BENCH_SCENE_BF16=0 benches strict fp32
            compute_bf16=bool(int(os.environ.get("GCA_BENCH_SCENE_BF16",
                                                 str(int(cfg.scene_bf16))))),
            # GCA_BENCH_SCENE_REMAT=1: drop U-Net block activations (B>4
            # memory A/B; BASELINE.md round-4)
            remat=bool(int(os.environ.get("GCA_BENCH_SCENE_REMAT", "0"))))
        state = scene_step.init_scene_state(cfg, model, tx,
                                            jax.random.PRNGKey(0))
        train_step = scene_step.make_scene_train_step(cfg, model, tx, mesh,
                                                      donate=True)
        raw = synth_scene_batch(cfg, cfg.batch_size, seed=0)
        metric = "scene_train_clouds_per_sec_per_chip_8k_pts"
    else:
        from gcanet_tpu.models.primitive_net import PrimitiveNet

        model = PrimitiveNet(cfg)
        state = step_lib.init_state(cfg, model, tx, jax.random.PRNGKey(0))
        train_step = step_lib.make_train_step(cfg, model, tx, mesh, donate=True)
        raw = synth_batch(cfg, cfg.batch_size, seed=0)
        metric = "train_clouds_per_sec_per_chip_8k_pts"

    batch = {k: v for k, v in raw.items() if k != "index"}

    rng = jax.random.PRNGKey(1)
    if mesh is not None:
        state = step_lib.replicate_to_mesh(state, mesh)
        rng = step_lib.replicate_to_mesh(rng, mesh)
        # numpy straight to the mesh — jnp.asarray first would device_put to
        # chip 0 and fetch back through the tunnel inside make_global_batch
        batch = step_lib.make_global_batch(mesh, batch)
    else:
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
    # compile + warmup (float() forces completion — the axon plugin's
    # block_until_ready returns without waiting)
    state, metrics = train_step(state, batch, rng)
    float(metrics["total_loss"])

    n_iters = int(os.environ.get("GCA_BENCH_ITERS", "10"))
    t0 = time.perf_counter()
    for i in range(n_iters):
        # per-step key derives from state.step inside the jit; a host-side
        # split here would stall the tunnelled dispatch pipeline
        state, metrics = train_step(state, batch, rng)
    float(metrics["total_loss"])
    dt = time.perf_counter() - t0

    n_dev = mesh.devices.size if mesh is not None else 1
    clouds_per_sec = cfg.batch_size * n_iters / dt / n_dev
    row = {
        "metric": metric,
        "value": round(clouds_per_sec, 3),
        "unit": "clouds/s",
        "vs_baseline": round(clouds_per_sec / A100_REFERENCE_CLOUDS_PER_SEC, 3),
    }
    if n_dev > 1:
        row["devices"] = n_dev
        row["total_clouds_per_sec"] = round(clouds_per_sec * n_dev, 3)
    # Roofline context (VERDICT r3 item 7): XLA's own per-executable cost
    # model gives FLOPs and HBM bytes for the EXACT compiled step; divide by
    # the measured step time and the chip peaks (v5e: 197 TFLOP/s bf16 MXU,
    # 819 GB/s HBM).  mfu counts every XLA op's flops (a slight overcount vs
    # the matmul-only convention); hbm_util counts compiler-visible bytes
    # (fusion keeps actual traffic at or below it).  Best-effort: older
    # plugins without cost_analysis simply omit the fields.
    # Compiled.cost_analysis() reports the post-GSPMD PER-DEVICE module
    # (verified on the 8-device virtual mesh: sharded flops == full/8 —
    # ADVICE r4 low #4), so per-chip utilisation needs NO device-count
    # division: each chip performs `flops` work every `step_s`.
    try:
        ca = train_step.lower(state, batch, rng).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        step_s = dt / n_iters
        flops = float(ca.get("flops", 0.0))
        byts = float(ca.get("bytes accessed", 0.0))
        if flops > 0:
            row["mfu"] = round(flops / step_s / 1.97e14, 4)
        if byts > 0:
            row["hbm_util"] = round(byts / step_s / 8.19e11, 4)
    except Exception:
        pass
    print(json.dumps(row))


if __name__ == "__main__":
    main()
