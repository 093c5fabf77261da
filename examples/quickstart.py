"""Quickstart for users switching from the reference GCANet.

Reference workflow -> this framework:

    python train_new.py                          # same entry point
    python train_new.py --eval                   # same eval switch
    python train_new.py --model_dict models.dgcnn-hais-concat-direct-2

Programmatic use below: build a config, train a few steps, run inference.
TPU tip: keep --num_points 128-aligned (8192 recommended; see BASELINE.md).
"""

import jax
import jax.numpy as jnp
import numpy as np

from gcanet_tpu.config import Config
from gcanet_tpu.data.synthetic import synth_batch, synth_object
from gcanet_tpu.models.registry import build_model
from gcanet_tpu.serve import Predictor
from gcanet_tpu.train import step as step_lib


def main():
    # small shapes so the example runs anywhere (CPU included)
    cfg = Config(num_points=512, batch_size=2, nn_nb=16, offset_knn=8,
                 offset_keypoints=32, max_instances=16)

    # --- training ---------------------------------------------------------
    model = build_model(cfg)
    tx = step_lib.make_optimizer(cfg)
    state = step_lib.init_state(cfg, model, tx, jax.random.PRNGKey(0))
    train_step = step_lib.make_train_step(cfg, model, tx)

    rng = jax.random.PRNGKey(1)          # per-step key folds in state.step
    for i in range(3):
        batch = {k: jnp.asarray(v)
                 for k, v in synth_batch(cfg, cfg.batch_size, seed=i).items()
                 if k != "index"}
        state, metrics = train_step(state, batch, rng)
        print(f"step {i}: loss {float(metrics['total_loss']):.3f}")

    # --- inference --------------------------------------------------------
    pred = Predictor(cfg.replace(batch_size=1))
    obj = synth_object(cfg, np.random.RandomState(0))
    out = pred.predict(obj["gt_pc"], obj["gt_normal"])
    print("predicted instances:", len(out["instances"]),
          "| type logits:", out["type_per_point"].shape,
          "| labels:", np.unique(out["instance_labels"]).size)


if __name__ == "__main__":
    main()
