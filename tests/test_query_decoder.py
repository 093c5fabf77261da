"""Query decoder + Hungarian criterion forward/loss sanity."""

import jax
import jax.numpy as jnp
import numpy as np

from gcanet_tpu.losses import mask2former as m2f
from gcanet_tpu.models.query_decoder import QueryDecoder


def test_query_decoder_forward():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 60, 32).astype(np.float32))
    dec = QueryDecoder(num_layer=2, num_query=8, num_class=7, in_channel=32,
                       d_model=64, nhead=4, hidden_dim=128)
    vars_ = dec.init(jax.random.PRNGKey(0), x)
    out = dec.apply(vars_, x)
    assert out["labels"].shape == (2, 8, 7)
    assert out["masks"].shape == (2, 8, 60)
    assert out["parameters"].shape == (2, 8, 22)
    assert len(out["aux_outputs"]) == 2
    assert np.isfinite(np.asarray(out["masks"])).all()


def test_criterion_perfect_match_low_loss():
    rng = np.random.RandomState(1)
    q, n, i, c = 6, 40, 3, 5
    gt_masks = np.zeros((i, n), np.float32)
    gt_masks[0, :15] = 1
    gt_masks[1, 15:30] = 1
    gt_masks[2, 30:] = 1
    gt_classes = np.array([0, 1, 2])
    # predictions: first 3 queries perfectly match the instances
    masks = np.full((q, n), -10.0, np.float32)
    labels = np.full((q, c), -10.0, np.float32)
    for j in range(3):
        masks[j][gt_masks[j] > 0] = 10.0
        labels[j, gt_classes[j]] = 10.0
    labels[3:, c - 1] = 10.0  # rest predict background
    pred = {"labels": jnp.asarray(labels), "masks": jnp.asarray(masks)}
    out = m2f.criterion(pred, jnp.asarray(gt_masks), jnp.asarray(gt_classes),
                        jnp.ones(i, bool), c)
    assert float(out["loss"]) < 0.1

    # random predictions should cost much more
    pred_bad = {"labels": jnp.asarray(rng.randn(q, c).astype(np.float32)),
                "masks": jnp.asarray(rng.randn(q, n).astype(np.float32))}
    out_bad = m2f.criterion(pred_bad, jnp.asarray(gt_masks),
                            jnp.asarray(gt_classes), jnp.ones(i, bool), c)
    assert float(out_bad["loss"]) > float(out["loss"])
