"""CLTR SetCriterion + Hungarian matcher + PostProcess.

Capability parity with /root/reference/CLTR/conditional_detr.py:110-287 (losses),
CLTR/matcher.py (focal class cost + L1 point cost -> scipy LSAP) and
PostProcess :290-322.

TPU-native structure: targets are padded to a static ``max_points`` per batch so
every loss is one fused XLA program.  The Hungarian assignment itself is
inherently sequential; the train step is split in two jit phases with the
scipy LSAP on host in between (the axon TPU backend has no host callbacks):

  phase 1 (jit)  forward -> per-decoder-level cost matrices
  host           linear_sum_assignment per (level, image)
  phase 2 (jit)  forward + matched losses + grads + update

(The reference pays the same host sync every step via `.cpu()` at
matcher.py:77.)
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def dice_loss(inputs, targets, num_points):
    """DETR-style mask dice loss (ref segmentation.py:179-194) — the only
    other live function of the dormant panoptic machinery."""
    inputs = jax.nn.sigmoid(inputs)
    inputs = inputs.reshape(inputs.shape[0], -1)
    targets = targets.reshape(targets.shape[0], -1)
    numerator = 2 * (inputs * targets).sum(1)
    denominator = inputs.sum(-1) + targets.sum(-1)
    loss = 1 - (numerator + 1) / (denominator + 1)
    return loss.sum() / num_points


def sigmoid_focal_loss(inputs, targets, num_points, alpha=0.25, gamma=2.0):
    """DETR-style focal loss (ref segmentation.py:197-222)."""
    prob = jax.nn.sigmoid(inputs)
    ce = jnp.maximum(inputs, 0) - inputs * targets + jnp.log1p(
        jnp.exp(-jnp.abs(inputs)))
    p_t = prob * targets + (1 - prob) * (1 - targets)
    loss = ce * ((1 - p_t) ** gamma)
    if alpha >= 0:
        alpha_t = alpha * targets + (1 - alpha) * (1 - targets)
        loss = alpha_t * loss
    return loss.mean(axis=1).sum() / num_points


def pad_targets(targets: Sequence[dict], max_points: int, channel_point: int):
    """Host-side: list of {'labels', 'points_macher', 'points'} -> padded
    arrays (labels (B,T), points (B,T,P), match_points (B,T,P), valid (B,T))."""
    bsz = len(targets)
    labels = np.zeros((bsz, max_points), np.int32)
    points = np.zeros((bsz, max_points, channel_point), np.float32)
    mpoints = np.zeros((bsz, max_points, channel_point), np.float32)
    valid = np.zeros((bsz, max_points), bool)
    for i, t in enumerate(targets):
        n = min(len(t["labels"]), max_points)
        if n == 0:
            continue
        labels[i, :n] = np.asarray(t["labels"])[:n]
        pts = np.asarray(t["points"], np.float32).reshape(len(t["labels"]), -1)
        mp = np.asarray(t["points_macher"], np.float32).reshape(
            len(t["labels"]), -1)
        points[i, :n, : min(pts.shape[1], channel_point)] = \
            pts[:n, :channel_point]
        mpoints[i, :n, : min(mp.shape[1], channel_point)] = \
            mp[:n, :channel_point]
        valid[i, :n] = True
    return labels, points, mpoints, valid


@dataclasses.dataclass
class SetCriterion:
    num_classes: int = 2
    weight_dict: Dict[str, float] = None
    focal_alpha: float = 0.25
    cost_class: float = 2.0
    cost_point: float = 5.0

    # ---------------- cost matrices (jit-able; ref matcher.py:56-77)

    def cost_matrix(self, pred_logits, pred_points, tgt_labels, tgt_points,
                    tgt_valid):
        """(B,Q,C),(B,Q,P),(B,T),(B,T,P),(B,T) -> (B,Q,T) with +inf-ish cost
        at invalid target slots."""
        prob = jax.nn.sigmoid(pred_logits)  # (B,Q,C)
        alpha, gamma = 0.25, 2.0
        neg = (1 - alpha) * (prob ** gamma) * (-jnp.log(1 - prob + 1e-8))
        pos = alpha * ((1 - prob) ** gamma) * (-jnp.log(prob + 1e-8))
        # gather per-target class columns
        cost_class = (jnp.take_along_axis(
            pos[:, :, None, :], tgt_labels[:, None, :, None], axis=3)
            - jnp.take_along_axis(
                neg[:, :, None, :], tgt_labels[:, None, :, None], axis=3)
        )[..., 0]  # (B,Q,T)
        cost_point = jnp.sum(
            jnp.abs(pred_points[:, :, None, :] - tgt_points[:, None, :, :]),
            axis=-1)
        C = self.cost_class * cost_class + self.cost_point * cost_point
        return jnp.where(tgt_valid[:, None, :], C, 1e9)

    def all_cost_matrices(self, outputs, tgt_labels, tgt_match_points,
                          tgt_valid):
        """Final + aux levels -> (L, B, Q, T); level L-1 is the final output.

        The reference matcher consumes targets' normalized ``points``
        (matcher.py:62) which DataLoader.py:822-823 makes numerically equal
        to ``points_macher`` (both are (y,x,knn)/crop_size, 3 cols); we keep
        the two keys separate to honor the dataset contract."""
        levels = list(outputs.get("aux_outputs", [])) + [
            {"pred_logits": outputs["pred_logits"],
             "pred_points": outputs["pred_points"]}]
        return jnp.stack([
            self.cost_matrix(lv["pred_logits"], lv["pred_points"],
                             tgt_labels, tgt_match_points, tgt_valid)
            for lv in levels])

    # ---------------- host matching

    @staticmethod
    def hungarian(cost_lbqt: np.ndarray, n_targets: np.ndarray) -> np.ndarray:
        """LSAP per (level, image).  Returns match_src (L,B,T): for each valid
        target j, the assigned query index (0 for padded slots)."""
        from scipy.optimize import linear_sum_assignment

        L, B, Q, T = cost_lbqt.shape
        match_src = np.zeros((L, B, T), np.int32)
        for l in range(L):
            for b in range(B):
                n = int(n_targets[b])
                if n == 0:
                    continue
                rows, cols = linear_sum_assignment(cost_lbqt[l, b, :, :n])
                match_src[l, b, cols] = rows
        return match_src

    # ---------------- losses (jit-able; ref :133-194)

    def level_losses(self, pred_logits, pred_points, tgt_labels, tgt_points,
                     tgt_valid, match_src, num_points):
        b, q, c = pred_logits.shape
        # scatter matched target classes into a (B,Q) map of num_classes
        target_classes = jnp.full((b, q), self.num_classes, jnp.int32)
        batch_idx = jnp.arange(b)[:, None]
        scatter_cls = jnp.where(tgt_valid, tgt_labels, self.num_classes)
        # padded slots all write query 0 — resolve by writing matched values
        # last with a where-combine:
        matched_map = jnp.full((b, q), self.num_classes, jnp.int32)
        matched_map = matched_map.at[batch_idx, match_src].set(
            jnp.where(tgt_valid, scatter_cls, self.num_classes))
        # padded slots may have clobbered query 0; restore when no valid
        # target actually matched query 0
        q0_valid = jnp.any((match_src == 0) & tgt_valid, axis=1)
        matched_map = matched_map.at[:, 0].set(
            jnp.where(q0_valid, matched_map[:, 0], self.num_classes))
        onehot = jax.nn.one_hot(matched_map, self.num_classes + 1,
                                dtype=pred_logits.dtype)[..., :-1]
        loss_ce = sigmoid_focal_loss(pred_logits, onehot, num_points,
                                     self.focal_alpha) * q

        src_points = pred_points[batch_idx, match_src]  # (B,T,P)
        l1 = jnp.abs(src_points - tgt_points).sum(-1)
        loss_point = jnp.where(tgt_valid, l1, 0.0).sum() / num_points

        card_pred = jnp.sum(
            jnp.argmax(pred_logits, -1) != (pred_logits.shape[-1] - 1),
            axis=1).astype(jnp.float32)
        card_err = jnp.mean(jnp.abs(card_pred - tgt_valid.sum(1)))
        return {"loss_ce": loss_ce, "loss_point": loss_point,
                "cardinality_error": card_err}

    def losses(self, outputs, tgt_labels, tgt_points, tgt_valid, match_src):
        """match_src: (L,B,T) from `hungarian`.  Returns the weighted total and
        the loss dict (ref forward :247-287)."""
        num_points = jnp.maximum(tgt_valid.sum().astype(jnp.float32), 1.0)
        levels = list(outputs.get("aux_outputs", [])) + [
            {"pred_logits": outputs["pred_logits"],
             "pred_points": outputs["pred_points"]}]
        loss_dict = {}
        n_aux = len(levels) - 1
        for l, lv in enumerate(levels):
            d = self.level_losses(lv["pred_logits"], lv["pred_points"],
                                  tgt_labels, tgt_points, tgt_valid,
                                  match_src[l], num_points)
            if l == n_aux:
                loss_dict.update(d)
            else:
                loss_dict.update({f"{k}_{l}": v for k, v in d.items()})
        total = sum(loss_dict[k] * w for k, w in self.weight_dict.items()
                    if k in loss_dict)
        return total, loss_dict


def build_weight_dict(cls_loss_coef=2, point_loss_coef=5, dec_layers=6,
                      aux_loss=True):
    """ref build :372-382."""
    weight_dict = {"loss_ce": cls_loss_coef, "loss_point": point_loss_coef}
    if aux_loss:
        aux = {}
        for i in range(dec_layers - 1):
            aux.update({f"{k}_{i}": v for k, v in weight_dict.items()})
        weight_dict.update(aux)
    return weight_dict


class PostProcess:
    """Top-k 100 sigmoid scores -> absolute points (ref :290-322)."""

    def __call__(self, outputs, target_sizes):
        out_logits = np.asarray(outputs["pred_logits"])
        out_point = np.asarray(outputs["pred_points"])
        bsz, q, c = out_logits.shape
        prob = 1 / (1 + np.exp(-out_logits))
        flat = prob.reshape(bsz, -1)
        k = min(100, flat.shape[1])
        topk_idx = np.argsort(-flat, axis=1)[:, :k]
        scores = np.take_along_axis(flat, topk_idx, axis=1)
        topk_points = topk_idx // c
        labels = topk_idx % c
        results = []
        for b in range(bsz):
            h, w = target_sizes[b]
            pts = out_point[b, topk_points[b]][:, :2] * np.array([w, h])
            results.append({"scores": scores[b], "labels": labels[b],
                            "points": pts})
        return results
