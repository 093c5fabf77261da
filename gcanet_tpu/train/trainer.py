"""Trainer: workspace, checkpoint/resume, LR schedule, train/eval loops.

Mirrors ``trainer_new.py`` behaviour:
  * workspace + log file                  (:64-83, logging :35-55)
  * dynamic model import via config       (:85-96) -> model registry here
  * Adam/SGD + piecewise LR decay         (:98-117, :144-155)
  * checkpoint load with key intersection (:120-142) -> orbax restore
  * per-epoch train/eval, periodic + best-metric checkpoint retention
                                          (:396-478)
  * throughput accounting (`example/sec`) every 50 batches (:226-247)

Observability is a JSONL scalar stream (+ stdout) instead of TF1 summaries
(utils/tf_logger.py replacement); each record carries step, epoch and wall
time so any dashboard can consume it.
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gcanet_tpu.config import Config
from gcanet_tpu.train import metrics as metric_utils
from gcanet_tpu.train import step as step_lib


def _make_tb_writer(log_dir: str):
    """TensorBoard event-file writer, master-only and import-guarded.

    The reference logs through tensorboardX on the master process
    (softgroup/util/logger.py:26-38 wraps SummaryWriter with @master_only;
    utils/tf_logger.py:12-73 is the TF1 equivalent).  JSONL stays the source
    of truth; event files are a parallel stream for TensorBoard dashboards.
    """
    if jax.process_index() != 0:
        return None
    try:
        from tensorboardX import SummaryWriter
    except ImportError:
        return None
    return SummaryWriter(log_dir)


class ScalarLogger:
    """JSONL scalar logger + optional TensorBoard event files
    (replaces utils/tf_visualizer.py / softgroup/util/logger.py)."""

    def __init__(self, log_dir: str, name: str, tensorboard: bool = True):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, f"scalars_{name}.jsonl")
        self.name = name
        self.tb = _make_tb_writer(os.path.join(log_dir, "tb", name)) \
            if tensorboard else None

    def log_scalars(self, scalars: Dict[str, float], step: int):
        rec = {"step": int(step), "time": time.time()}
        rec.update({k: float(v) for k, v in scalars.items()})
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        if self.tb is not None:
            for k, v in scalars.items():
                self.tb.add_scalar(k, float(v), int(step))
            self.tb.flush()

    def log_histogram(self, name: str, values, step: int, bins: int = 16):
        """Histogram summary (tf_logger.py histo_summary equivalent): quantile
        sketch + bin counts as a JSONL record."""
        v = np.asarray(values).ravel()
        counts, edges = np.histogram(v, bins=bins)
        rec = {"step": int(step), "time": time.time(), "histogram": name,
               "min": float(v.min()), "max": float(v.max()),
               "mean": float(v.mean()), "std": float(v.std()),
               "counts": counts.tolist(), "edges": np.round(edges, 6).tolist()}
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        if self.tb is not None:
            self.tb.add_histogram(name, v, int(step))


def prefetch_to_device(batch_iter, depth: int = 2, mesh=None):
    """Move batches to device on a background thread, ``depth`` ahead.

    The reference overlaps host work with GPU compute through DataLoader
    worker processes + pinned-memory `.cuda()` (trainer_new.py:163-208); the
    TPU analogue is issuing ``device_put`` for upcoming batches while the
    current step executes, hiding the host->device transfer on the tunnelled
    TPU.  ``index`` entries (python ids) pass through untouched.  With a
    ``mesh``, arrays are assembled into batch-sharded global jax.Arrays
    (each process contributes its local chunk — multi-host data feed).
    """
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    end = object()

    def put_batch(item):
        arrays = {k: v for k, v in item.items() if k != "index"}
        if mesh is not None:
            arrays = step_lib.make_global_batch(mesh, arrays)
        else:
            arrays = {k: jax.device_put(np.asarray(v))
                      for k, v in arrays.items()}
        if "index" in item:
            arrays["index"] = item["index"]
        q.put(arrays)

    def producer():
        try:
            for item in batch_iter:
                put_batch(item)
            q.put(end)
        except BaseException as e:                      # noqa: BLE001
            q.put(e)

    threading.Thread(target=producer, daemon=True).start()
    while True:
        item = q.get()
        if item is end:
            return
        if isinstance(item, BaseException):
            raise item
        yield item


class Trainer:
    def __init__(self, cfg: Config):
        self.cfg = cfg
        if cfg.debug:
            # the TPU analogue of the reference's always-on
            # torch.autograd.set_detect_anomaly(True) (trainer_new.py:212):
            # fail fast with a traceback on the op producing a NaN.
            jax.config.update("jax_debug_nans", True)
        self.build_workspace()
        self.build_model_optimizer()
        self.train_viz = ScalarLogger(cfg.log_dir, "train")
        self.test_viz = ScalarLogger(cfg.log_dir, "test")
        logging.basicConfig(level=logging.INFO)
        self.logger = logging.getLogger("Train")
        # basicConfig is a no-op when jax/absl already configured the root
        # logger, leaving the effective level at WARNING — set INFO explicitly
        # or trainlog.log stays empty (trainer_new.py:35-55 logs at INFO)
        self.logger.setLevel(logging.INFO)
        fh = logging.FileHandler(os.path.join(cfg.log_dir, "trainlog.log"))
        fh.setFormatter(logging.Formatter("%(asctime)s---%(message)s"))
        self.logger.addHandler(fh)

    # ------------------------------------------------------------------ setup
    def build_workspace(self):
        os.makedirs(self.cfg.log_dir, exist_ok=True)
        self.ckpt_dir = os.path.abspath(
            self.cfg.checkpoint_path or os.path.join(self.cfg.log_dir, "checkpoint"))

    def build_model_optimizer(self):
        cfg = self.cfg
        from gcanet_tpu.models.registry import build_model

        self.model = build_model(cfg)
        self.tx = step_lib.make_optimizer(cfg)
        self.mesh = step_lib.make_mesh(cfg)
        rng = jax.random.PRNGKey(cfg.seed)
        self.state = step_lib.init_state(cfg, self.model, self.tx, rng)
        n_params = sum(x.size for x in jax.tree.leaves(self.state.params))
        print(f"parameters number: {n_params / 1e6:.2f} M")
        if cfg.num_points % 128:
            print(f"note: num_points={cfg.num_points} is not 128-aligned; "
                  f"TPU throughput is ~2x better at e.g. 8192 (see BASELINE.md)")
        self.train_step = step_lib.make_train_step(cfg, self.model, self.tx,
                                                   self.mesh, donate=True)
        self.eval_step = step_lib.make_eval_step(cfg, self.model)
        self.start_epoch = 0
        if not cfg.not_load_model:
            self.load_checkpoint()
        if self.mesh is not None:
            # jit over a (possibly multi-host) mesh accepts only global
            # arrays; the state is identical on every process (same seed /
            # same restored checkpoint), so replication is safe
            self.state = step_lib.replicate_to_mesh(self.state, self.mesh)

    # ------------------------------------------------------------ checkpoints
    def load_checkpoint(self):
        import orbax.checkpoint as ocp

        path = os.path.join(self.ckpt_dir, "latest")
        if not os.path.isdir(path):
            return
        with ocp.StandardCheckpointer() as ckptr:
            restored = ckptr.restore(path, self.state)
        self.state = restored
        meta_path = os.path.join(self.ckpt_dir, "meta.json")
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                self.start_epoch = json.load(f).get("epoch", 0)
        print(f"Successfully Load Model with {self.start_epoch} epoch...")

    def save_checkpoint(self, epoch: int, tag: str = "latest",
                        metrics: Optional[Dict] = None):
        import orbax.checkpoint as ocp

        path = os.path.join(self.ckpt_dir, tag)
        with ocp.StandardCheckpointer() as ckptr:
            # multi-host: every process participates (orbax coordinates)
            ckptr.save(path, self.state, force=True)
        if jax.process_index() == 0:
            with open(os.path.join(self.ckpt_dir, "meta.json"), "w") as f:
                json.dump({"epoch": epoch, "metrics": metrics or {}}, f)

    # ------------------------------------------------------------------- data
    def build_dataloaders(self):
        cfg = self.cfg
        from gcanet_tpu.data.abc_dataset import ABCDataset

        train_list = os.path.join(cfg.data_path, cfg.train_dataset)
        if os.path.exists(train_list):
            self.train_data = ABCDataset(cfg.data_path, cfg.train_dataset, cfg,
                                         skip=cfg.train_skip, fold=cfg.train_fold,
                                         training=True)
            self.test_data = ABCDataset(cfg.data_path, cfg.test_dataset, cfg,
                                        skip=cfg.val_skip, training=False)
        else:
            print(f"dataset list {train_list} not found -> synthetic data")
            self.train_data = self.test_data = None

    def _train_batches(self, epoch: int):
        """Per-process batch stream: each process loads + collates only its
        contiguous chunk of every global batch (shard selection replacing the
        reference's DistributedSampler; ids re-based so the in-step
        axis_index rebase composes — see step.rebase_local_batch)."""
        cfg = self.cfg
        from gcanet_tpu.parallel.dist import get_dist_info

        rank, world = get_dist_info()
        if self.train_data is not None:
            for batch in self.train_data.batches(cfg.batch_size, shuffle=True,
                                                 seed=cfg.seed + epoch,
                                                 shard=(rank, world)):
                yield step_lib.rebase_local_batch(batch, rank, world,
                                                  cfg.max_instances)
        else:
            from gcanet_tpu.data.synthetic import synth_batch
            from gcanet_tpu.parallel.dist import shard_bounds

            lo, hi = shard_bounds(cfg.batch_size, rank, world)  # raises if
            local_bs = hi - lo                                  # indivisible
            # GCA_SYNTH_BATCHES: epoch length of the synthetic fallback (the
            # verify drive shrinks it on 1-core hosts, where each CPU step
            # costs ~1 min)
            n = int(os.environ.get("GCA_SYNTH_BATCHES", "32"))
            for i in range(n):
                batch = synth_batch(cfg, local_bs,
                                    seed=(epoch * 1000 + i) * world + rank)
                yield step_lib.rebase_local_batch(batch, rank, world,
                                                  cfg.max_instances)

    def _test_batches(self):
        """Eval stream, rank-strided across processes (results re-joined via
        collect_results, softgroup/util/dist.py:51-76 semantics)."""
        cfg = self.cfg
        from gcanet_tpu.parallel.dist import get_dist_info

        rank, world = get_dist_info()
        if self.test_data is not None:
            yield from self.test_data.batches(1, shuffle=False,
                                              stride=(rank, world))
        else:
            from gcanet_tpu.data.synthetic import synth_batch

            for i in range(8):
                if i % world == rank:
                    yield synth_batch(cfg, 1, seed=90000 + i)

    # ------------------------------------------------------------------ loops
    def _set_lr(self, epoch: int):
        lr = step_lib.lr_for_epoch(self.cfg, epoch)
        hp = self.state.opt_state.hyperparams
        val = jnp.asarray(lr, dtype=hp["learning_rate"].dtype)
        if self.mesh is not None:
            val = step_lib.replicate_to_mesh(val, self.mesh)
        hp["learning_rate"] = val
        self.train_viz.log_scalars({"lr": lr}, epoch)
        return lr

    def train_one_epoch(self, epoch: int):
        cfg = self.cfg
        self._set_lr(epoch)
        rng = jax.random.PRNGKey(cfg.seed * 7919 + epoch)
        if self.mesh is not None:
            rng = step_lib.replicate_to_mesh(rng, self.mesh)
        stat: Dict[str, float] = {}
        step_t0 = time.time()
        n_batches = 0
        pending = []                        # device-side metrics; fetch lazily
        batches = prefetch_to_device(self._train_batches(epoch),
                                     mesh=self.mesh)
        for batch_idx, batch in enumerate(batches):
            # per-step key is folded in on device from state.step — no
            # host-side split (each one is a tunnelled mini-dispatch)
            arrays = {k: v for k, v in batch.items() if k != "index"}
            self.state, metrics = self.train_step(self.state, arrays, rng)
            n_batches += 1
            # keep metrics on device: a float() here would force a device
            # round-trip per batch (high latency on the tunnelled TPU); we
            # only materialise at the logging boundary
            pending.append(metrics)
            if (batch_idx + 1) % 50 == 0:
                for m in pending:
                    for k, v in m.items():
                        stat[k] = stat.get(k, 0.0) + float(v)
                pending = []
                dt = time.time() - step_t0
                stat["example/sec"] = cfg.batch_size * 50 / dt
                self.train_viz.log_scalars(
                    {k: v / 50 if k != "example/sec" else v for k, v in stat.items()},
                    (epoch * 10_000 + batch_idx) * cfg.batch_size)
                msg = " ".join(f"{k}: {v / 50:.3f}" for k, v in sorted(stat.items())
                               if k != "example/sec")
                self.logger.info(f"batch {batch_idx + 1}: {msg} "
                                 f"({stat['example/sec']:.2f} ex/s)")
                stat = {}
                step_t0 = time.time()
        return n_batches

    def _local_eval_params(self):
        """(params, batch_stats) usable by the plain (mesh-less) batch-1 eval
        jit: under multi-host the train state is a global array, so evaluate
        on this process's local replica."""
        params, batch_stats = self.state.params, self.state.batch_stats
        if self.mesh is not None and jax.process_count() > 1:
            local = lambda x: x.addressable_data(0)  # noqa: E731
            params = jax.tree.map(local, params)
            batch_stats = jax.tree.map(local, batch_stats)
        return params, batch_stats

    def _merge_eval_results(self, stat: Dict[str, float], cnt: int,
                            extra: Optional[list] = None):
        """Merge rank-strided eval outputs across processes (every process
        evaluated a subset; softgroup/util/dist.py:51-76 collect pattern):
        sums the stat dicts and counts, concatenates the optional extra list,
        and re-joins self._results_rows.  Identity single-process."""
        if jax.process_count() == 1:
            return (stat, cnt, extra) if extra is not None else (stat, cnt)
        from gcanet_tpu.parallel.dist import collect_results

        merged = collect_results([(stat, cnt, extra)])
        stat, cnt, extras = {}, 0, []
        for s, c, e in merged:
            cnt += c
            if e is not None:
                extras.extend(e)
            for k, v in s.items():
                stat[k] = stat.get(k, 0.0) + v
        self._results_rows = collect_results(self._results_rows)
        return (stat, cnt, extras) if extra is not None else (stat, cnt)

    def test_one_epoch(self, epoch: int):
        cfg = self.cfg
        stat: Dict[str, float] = {}
        cnt = 0
        self._results_rows = []
        params, batch_stats = self._local_eval_params()
        for batch in self._test_batches():
            arrays = {k: jnp.asarray(v) for k, v in batch.items() if k != "index"}
            try:
                out, merged_dev, total, ld = self.eval_step(
                    params, batch_stats, arrays)
            except Exception as e:                 # noqa: BLE001
                # log the failing object and continue (trainer_new.py:333-335)
                obj = batch.get("index", ["?"])[0]
                self.logger.error(f"error: {obj}: {e}")
                continue
            # instance extraction ran on device (merged_labels_device); one
            # tiny device_get covers everything the host metrics consume —
            # each separate np.asarray/float is a device->host RTT on the
            # tunnelled TPU, and [CH, N, C] mask fetches dominate otherwise
            merged, tpp, ld_host = jax.device_get(
                (merged_dev, out.type_per_point[0], ld))
            i_gt = np.asarray(batch["I_gt"][0])
            t_gt = np.asarray(batch["T_gt"][0])
            miou = metric_utils.compute_miou(merged, i_gt)
            type_miou = metric_utils.compute_type_miou_abc(
                tpp, t_gt, merged, i_gt)
            for k, v in dict(ld_host, miou=miou, type_miou=type_miou).items():
                stat[k] = stat.get(k, 0.0) + float(v)
            if cfg.resultsSave:
                self._save_xyz_dumps(batch, out, merged, miou, type_miou)
            self._results_rows.append({
                "ID": batch.get("index", ["?"])[0] if "index" in batch else cnt,
                "miou": round(miou, 3), "type_miou": round(type_miou, 3),
            })
            cnt += 1
        from gcanet_tpu.parallel.dist import is_main_process

        stat, cnt = self._merge_eval_results(stat, cnt)
        avg = {k: v / max(cnt, 1) for k, v in stat.items()}
        if is_main_process():
            self._write_results_csv(epoch, avg)
            self.test_viz.log_scalars(avg, epoch)
            self.logger.info("eval " + " ".join(
                f"{k}: {v:.4f}" for k, v in sorted(avg.items())))
        return avg.get("miou", 0.0), avg.get("type_miou", 0.0)

    def _prune_checkpoints(self, epoch: int):
        """Keep power-of-2-aligned epoch checkpoints plus the most recent few
        (softgroup/util/utils.py:88-104 retention policy)."""
        import re
        import shutil

        if jax.process_index() != 0:
            return  # one pruner: concurrent rmtree races on shared storage
        keep = {epoch, epoch - self.cfg.save_interval}
        e = 1
        while e <= epoch:
            keep.add(e - 1)
            e *= 2
        if not os.path.isdir(self.ckpt_dir):
            return
        for name in os.listdir(self.ckpt_dir):
            m = re.fullmatch(r"eval(\d+)", name)
            if m and int(m.group(1)) not in keep:
                shutil.rmtree(os.path.join(self.ckpt_dir, name),
                              ignore_errors=True)

    def _save_xyz_dumps(self, batch, out, merged, miou, type_miou):
        """Per-object .xyz visualisation dumps (train_new.py:189-220)."""
        d = os.path.join(self.cfg.log_dir, "results")
        os.makedirs(d, exist_ok=True)
        obj = batch.get("index", ["obj"])[0] if "index" in batch else "obj"
        xyz = np.asarray(batch["gt_pc"][0] if hasattr(batch["gt_pc"], "shape")
                         else batch["gt_pc"])
        if xyz.ndim == 3:
            xyz = xyz[0]
        tp = np.asarray(out.type_per_point[0]).argmax(-1)
        i_gt = np.asarray(batch["I_gt"])[0] if np.asarray(batch["I_gt"]).ndim == 2 \
            else np.asarray(batch["I_gt"])
        t_gt = np.asarray(batch["T_gt"])[0] if np.asarray(batch["T_gt"]).ndim == 2 \
            else np.asarray(batch["T_gt"])
        def dump(name, labels):
            np.savetxt(os.path.join(d, f"{obj}_{name}.xyz"),
                       np.column_stack([xyz, labels]), fmt="%.8f")
        dump(f"miou_{miou:.3f}_inc", merged)
        dump(f"typemiou_{type_miou:.3f}_seg", tp)
        dump("inc_gt", i_gt)
        dump("seg_gt", t_gt)

    def _write_results_csv(self, epoch: int, avg: Dict[str, float]):
        """CSV analogue of the reference's pandas .to_excel dumps
        (trainer_new.py:364-377, 447-455)."""
        import csv

        path = os.path.join(self.cfg.log_dir, "output_results.csv")
        rows = self._results_rows + [dict({"ID": f"Epoch{epoch}"},
                                          **{k: round(v, 4) for k, v in avg.items()})]
        keys = sorted({k for r in rows for k in r})
        with open(path, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=keys)
            w.writeheader()
            w.writerows(rows)

    def train(self):
        cfg = self.cfg
        self.build_dataloaders()
        if cfg.eval:
            # evaluate the loaded checkpoint once, regardless of where the
            # epoch counter stands (a finished run has start_epoch ==
            # max_epoch, which would skip the loop below entirely)
            print(f"**** EVAL (epoch {self.start_epoch:03d}) ****")
            self.test_one_epoch(self.start_epoch)
            return
        max_miou, max_type_miou = 0.0, 0.0
        for epoch in range(self.start_epoch, cfg.max_epoch):
            print(f"**** EPOCH {epoch:03d} **** lr "
                  f"{step_lib.lr_for_epoch(cfg, epoch):f}")
            self.train_one_epoch(epoch)
            if epoch % cfg.save_interval == cfg.save_interval - 1:
                self.save_checkpoint(epoch + 1, tag=f"eval{epoch}")
                self._prune_checkpoints(epoch)
            if epoch % cfg.eval_interval == cfg.eval_interval - 1:
                miou, type_miou = self.test_one_epoch(epoch)
                self.save_checkpoint(epoch + 1, tag="latest",
                                     metrics={"miou": miou, "type_miou": type_miou})
                if miou >= max_miou:
                    max_miou = miou
                    self.save_checkpoint(epoch + 1, tag="max_miou",
                                         metrics={"miou": miou, "type_miou": type_miou})
                elif type_miou >= max_type_miou:
                    max_type_miou = type_miou
                    self.save_checkpoint(epoch + 1, tag="max_type_miou",
                                         metrics={"miou": miou, "type_miou": type_miou})
