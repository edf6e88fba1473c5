"""Counting/accuracy metrics (host-side pieces).

MRAccuracy (/root/reference/loss.py:422-440): sigmoid -> 0.5-binarise ->
connected components -> mean relative count error vs the dot-map sum.
Connected-component labelling has no XLA primitive; it runs host-side on the
(tiny) binarised masks via cv2, exactly like the reference.
"""

from __future__ import annotations

import numpy as np


def connected_component_count(mask: np.ndarray, connectivity: int = 8) -> int:
    """Number of foreground components (background excluded)."""
    import cv2

    n, _ = cv2.connectedComponents(mask.astype(np.uint8),
                                   connectivity=connectivity)
    return int(n - 1)


def mr_accuracy(pred_logits: np.ndarray, gt_dot: np.ndarray) -> float:
    """loss.py:422-440 — pred_logits (B,H,W,1) or (B,H,W); gt_dot (B,H,W)."""
    if pred_logits.ndim == 4:
        pred_logits = pred_logits[..., 0]
    prob = 1.0 / (1.0 + np.exp(-pred_logits))
    pred_bin = (prob >= 0.5).astype(np.uint8)
    bsz = gt_dot.shape[0]
    mre = 0.0
    for b in range(bsz):
        count_gt = int(np.sum(gt_dot[b]))
        count_pred = connected_component_count(pred_bin[b])
        if count_gt != 0:
            mre += abs(count_gt - count_pred) / count_gt
        elif count_pred != 0:
            mre += 1.0
    return mre / bsz


def class_argmax(logits):
    """argmax over the trailing class axis via full-lane plane compares.

    Semantics identical to the reference's softmax->argmax chain
    (test_mc3serousv5.py:878-887): softmax is monotone, and first-max-wins
    tie-breaking matches torch/jnp argmax.  On TPU a (B,H,W,C) tensor with
    C of 2-4 keeps only C of 128 lanes live, so jnp.argmax over the class
    axis pays ~128/C x its useful bytes; comparing C rank-3 (B,H,W) planes
    runs at full lane width."""
    import jax.numpy as jnp

    c = logits.shape[-1]
    if c > 8:
        return jnp.argmax(logits, axis=-1)
    best = logits[..., 0]
    idx = jnp.zeros(logits.shape[:-1], jnp.int32)
    for k in range(1, c):
        zk = logits[..., k]
        take = zk > best
        idx = jnp.where(take, jnp.int32(k), idx)
        best = jnp.where(take, zk, best)
    return idx
