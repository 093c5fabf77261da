"""Hungarian-matched mask criterion for the query decoder.

Equivalent of the reference's Mask2Former-style criterion
(models/loss.py: ``HungarianMatcher`` :165-210, ``Criterion`` :212-376 with
dice/BCE mask losses and class CE over matched query-instance pairs).  The
assignment runs on host through ``jax.pure_callback`` (cost matrices are
Q x I, tiny); everything else is jit-compiled.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


def dice_loss(inputs, targets, valid):
    """Soft dice over masks: inputs [Q, N] logits, targets [Q, N] in {0,1}."""
    probs = jax.nn.sigmoid(inputs)
    num = 2 * jnp.sum(probs * targets, -1)
    den = jnp.sum(probs, -1) + jnp.sum(targets, -1)
    loss = 1 - (num + 1) / (den + 1)
    return jnp.sum(jnp.where(valid, loss, 0.0)) / jnp.maximum(jnp.sum(valid), 1)


def bce_mask_loss(inputs, targets, valid):
    eps = 1e-7
    p = jax.nn.sigmoid(inputs)
    bce = -(targets * jnp.log(p + eps) + (1 - targets) * jnp.log(1 - p + eps))
    per_q = jnp.mean(bce, -1)
    return jnp.sum(jnp.where(valid, per_q, 0.0)) / jnp.maximum(jnp.sum(valid), 1)


def _hungarian_host(cost: np.ndarray, valid_rows: np.ndarray,
                    valid_cols: np.ndarray):
    from scipy.optimize import linear_sum_assignment

    cost = np.asarray(cost)
    valid_rows = np.asarray(valid_rows)
    valid_cols = np.asarray(valid_cols)
    q, i = cost.shape
    c = cost.copy()
    c[~valid_rows] = 1e6
    c[:, ~valid_cols] = 1e6
    row, col = linear_sum_assignment(c)
    assign = np.full(q, -1, np.int32)
    for r, cc in zip(row, col):
        if valid_rows[r] and valid_cols[cc]:
            assign[r] = cc
    return assign


def hungarian_match(cost: jnp.ndarray, valid_rows, valid_cols) -> jnp.ndarray:
    """cost [Q, I] -> assigned instance per query (-1 unmatched), via host."""
    return jax.pure_callback(
        _hungarian_host,
        jax.ShapeDtypeStruct((cost.shape[0],), jnp.int32),
        cost, valid_rows, valid_cols, vmap_method="sequential")


def criterion(pred: Dict, gt_masks: jnp.ndarray, gt_classes: jnp.ndarray,
              gt_valid: jnp.ndarray, num_classes: int,
              cost_weight=(1.0, 1.0, 1.0)) -> Dict[str, jnp.ndarray]:
    """One batch item: pred labels [Q, C], masks [Q, N]; gt_masks [I, N]."""
    labels, masks = pred["labels"], pred["masks"]
    q, n = masks.shape
    i = gt_masks.shape[0]

    probs = jax.nn.softmax(labels, -1)
    cls_cost = -probs[:, jnp.clip(gt_classes, 0, num_classes - 1)]  # [Q, I]
    mp = jax.nn.sigmoid(masks)
    inter = mp @ gt_masks.T
    dice_cost = 1 - (2 * inter + 1) / (jnp.sum(mp, -1)[:, None]
                                       + jnp.sum(gt_masks, -1)[None, :] + 1)
    # BCE cost: mean_n [-gt log p - (1-gt) log(1-p)] as two matmuls
    bce_cost = ((-jnp.log(mp + 1e-7)) @ gt_masks.T
                + (-jnp.log(1 - mp + 1e-7)) @ (1 - gt_masks).T) / n
    cost = (cost_weight[0] * cls_cost + cost_weight[1] * dice_cost
            + cost_weight[2] * bce_cost)

    assign = hungarian_match(cost, jnp.ones(q, bool), gt_valid)
    matched = assign >= 0
    a = jnp.clip(assign, 0, i - 1)

    tgt_cls = jnp.where(matched, gt_classes[a], num_classes - 1)
    logp = jax.nn.log_softmax(labels, -1)
    ce = -jnp.take_along_axis(logp, tgt_cls[:, None], 1)[:, 0]
    cls_loss = jnp.mean(ce)

    tgt_masks = gt_masks[a]
    d = dice_loss(masks, tgt_masks, matched)
    bce = bce_mask_loss(masks, tgt_masks, matched)
    return {"cls_loss": cls_loss, "dice_loss": d, "bce_loss": bce,
            "loss": cls_loss + d + bce}
