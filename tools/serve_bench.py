"""Serving throughput bench: forward, predict() and predict_batch paths.

Prints one JSON line per measured path.  This formalises the ad-hoc serving
measurements behind BASELINE.md's inference numbers so a config change (e.g.
the round-2 nn_nb 80->48 default) is a one-command re-measure.

Knobs (same family as the train bench, gcanet_tpu.config.bench_config):
GCA_BENCH_POINTS (8192), GCA_BENCH_BATCH (8, the batched paths),
GCA_BENCH_NN (0 = Config default), GCA_PLATFORM (cpu to stay off the TPU).

Run: python tools/serve_bench.py [--iters 20] [--paths fwd,predict,batch]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gcanet_tpu.runtime_setup import enable_compilation_cache


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--paths", default="fwd,predict,batch,stream",
                    help="comma subset of fwd,predict,batch,stream")
    ap.add_argument("--family", default="abc", choices=["abc", "scene"],
                    help="scene = ScenePredictor (SoftGroup switchover "
                         "surface): predict/batch/stream paths")
    ap.add_argument("--scene-grid", type=int, default=48,
                    help="scene voxel grid (48 = the round-5 tuned bench "
                         "default; 64 = the model's conservative default)")
    args = ap.parse_args()
    enable_compilation_cache()

    import jax
    import numpy as np

    from gcanet_tpu.config import bench_config
    from gcanet_tpu.data.synthetic import synth_batch
    from gcanet_tpu.serve import Predictor

    if args.family == "scene":
        return scene_main(args)
    cfg = bench_config().replace(using_set_aggr=True)
    b = cfg.batch_size
    pred = Predictor(cfg)
    paths_arg = set(args.paths.split(","))
    if pred.mesh is not None and paths_arg & {"fwd", "predict"}:
        # GCA_BENCH_MESH > 1: only the batched paths shard over the mesh
        print(json.dumps({"note": "mesh serving — fwd/predict skipped"}))
        args.paths = ",".join(paths_arg & {"batch", "stream"})

    batch = synth_batch(cfg, b, seed=0)
    xyz = np.asarray(batch["gt_pc"], np.float32)
    nrm = np.asarray(batch["gt_normal"], np.float32)
    paths = set(args.paths.split(","))

    def emit(metric, clouds, dt):
        print(json.dumps({
            "metric": metric,
            "value": round(clouds / dt, 3),
            "unit": "clouds/s",
            "config": {"points": cfg.num_points, "batch": b,
                       "nn_nb": cfg.nn_nb, "iters": args.iters},
        }), flush=True)

    if "fwd" in paths:
        import jax.numpy as jnp

        x1, n1 = jnp.asarray(xyz[:1]), jnp.asarray(nrm[:1])
        xb, nb = jnp.asarray(xyz), jnp.asarray(nrm)
        for label, (xx, nn) in (("1", (x1, n1)), (str(b), (xb, nb))):
            out = pred._forward(pred.state.params, pred.state.batch_stats,
                                xx, nn)
            float(out.semantic_scores.sum())       # force completion (axon)
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = pred._forward(pred.state.params, pred.state.batch_stats,
                                    xx, nn)
            float(out.semantic_scores.sum())
            dt_dev = time.perf_counter() - t0
            emit(f"serve_forward_clouds_per_sec_b{label}",
                 xx.shape[0] * args.iters, dt_dev)
            # Relay-RTT decomposition (VERDICT r4 item 6): the loop above
            # dispatches back-to-back and syncs ONCE, so it measures
            # device-bound time; fetching the full semantic tensor every
            # iteration adds the tunnel's per-result transfer.  The delta
            # quantifies how tunnel-bound each serving mode's number is
            # (local-host TPU serving pays only the device slice).
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = pred._forward(pred.state.params, pred.state.batch_stats,
                                    xx, nn)
                np.asarray(out.semantic_scores)    # full result over the relay
            dt_tot = time.perf_counter() - t0
            per = xx.shape[0] * args.iters
            print(json.dumps({
                "metric": f"serve_forward_decomp_b{label}",
                "device_ms_per_cloud": round(1e3 * dt_dev / per, 2),
                "fetch_ms_per_cloud": round(1e3 * (dt_tot - dt_dev) / per, 2),
                "unit": "ms",
            }), flush=True)

    if "predict" in paths:
        pred.predict(xyz[0], nrm[0])               # compile + warm
        t0 = time.perf_counter()
        for _ in range(args.iters):
            pred.predict(xyz[0], nrm[0])
        emit("serve_predict_clouds_per_sec_b1", args.iters,
             time.perf_counter() - t0)

    if "batch" in paths:
        pred.predict_batch(xyz, nrm)               # compile + warm
        t0 = time.perf_counter()
        for _ in range(args.iters):
            pred.predict_batch(xyz, nrm)
        emit(f"serve_predict_batch_clouds_per_sec_b{b}", b * args.iters,
             time.perf_counter() - t0)

    if "stream" in paths:
        # pipelined: batch i fetch/postprocess overlaps batch i+1 compute
        list(pred.predict_stream([(xyz, nrm)]))    # compile + warm
        t0 = time.perf_counter()
        n_out = sum(1 for _ in pred.predict_stream(
            (xyz, nrm) for _ in range(args.iters)))
        emit(f"serve_predict_stream_clouds_per_sec_b{b}", n_out,
             time.perf_counter() - t0)




def scene_main(args):
    """Scene-family serving throughput: ScenePredictor predict / batch /
    stream on synthetic scenes at the bench shapes.  First scene-serving
    measurement (round 5); the packed-bits mask fetch keeps the
    device->host payload ~1/8 of the plain masks."""
    import json as _json
    import time as _time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from gcanet_tpu.config import bench_config, scene_grouping_defaults
    from gcanet_tpu.data.synthetic import synth_scene_batch
    from gcanet_tpu.serve import ScenePredictor

    cfg = bench_config()
    cfg = cfg.replace(grouping=scene_grouping_defaults(
        cfg.grouping, class_numpoint_mean=(cfg.num_points / 5.0,) * 10))
    b = cfg.batch_size
    pred = ScenePredictor(cfg, scene_grid=args.scene_grid)
    batch = synth_scene_batch(cfg, b, seed=0)
    xyz = np.asarray(batch["xyz"], np.float32)
    feats = np.asarray(batch["feats"], np.float32)

    def emit(metric, clouds, dt):
        print(_json.dumps({
            "metric": metric,
            "value": round(clouds / dt, 3),
            "unit": "clouds/s",
            "config": {"points": cfg.num_points, "batch": b,
                       "grid": args.scene_grid, "iters": args.iters},
        }), flush=True)

    paths = set(args.paths.split(","))
    if "predict" in paths:
        pred.predict(xyz[0], feats[0])             # compile + warm
        t0 = _time.perf_counter()
        for _ in range(args.iters):
            pred.predict(xyz[0], feats[0])
        emit("scene_serve_predict_clouds_per_sec_b1", args.iters,
             _time.perf_counter() - t0)
    if "batch" in paths:
        pred.predict_batch(xyz, feats)             # compile + warm
        t0 = _time.perf_counter()
        for _ in range(args.iters):
            pred.predict_batch(xyz, feats)
        emit(f"scene_serve_predict_batch_clouds_per_sec_b{b}",
             b * args.iters, _time.perf_counter() - t0)
    if "stream" in paths:
        list(pred.predict_stream([(xyz, feats)]))  # compile + warm
        t0 = _time.perf_counter()
        n_out = sum(1 for _ in pred.predict_stream(
            (xyz, feats) for _ in range(args.iters)))
        emit(f"scene_serve_predict_stream_clouds_per_sec_b{b}", n_out,
             _time.perf_counter() - t0)


if __name__ == "__main__":
    main()
