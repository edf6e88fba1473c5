#!/usr/bin/env python
"""TPU-side ours-only probe for the detection-regime parity budget.

Uses parity_cltr_detect's (fixed, normalized-target) easy point data and
shrunken config; sweeps lr over long checkpoint horizons to find when the
count MAE (reference val rule: #(sigmoid>0.35), Trainer.py:549-580) drops
below the no-detection baseline.  Informs the CPU two-framework run's
budget — this script never touches the torch side.

Run: python benchmarks/probe_detect_tpu.py [--lrs 1e-4,3e-4] [--epochs 3000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))
sys.path.insert(0, HERE)

import parity_cltr_detect as det  # noqa: E402


def probe(lr, epochs, seed=0):
    import jax
    import jax.numpy as jnp

    from unet_torch_tpu.models.cltr import build_cltr
    from unet_torch_tpu.models.cltr.criterion import pad_targets
    from unet_torch_tpu.train.cltr_steps import (
        make_cltr_eval_loss,
        make_cltr_fused_step,
    )
    from unet_torch_tpu.train.optim import make_optimizer
    from unet_torch_tpu.train.state import TrainState

    (xs, targets), (vx, vt) = det.make_easy_point_data(seed)
    model, criterion, _ = build_cltr(dict(det.SMALL))
    tx = make_optimizer("Adam", lr, 0.0, clip_max_norm=det.CLIP)
    n = len(xs)
    max_pts = max(len(t["labels"]) for t in targets + vt) + 1
    variables = model.init(jax.random.key(seed), jnp.asarray(xs[:1]),
                           train=False)
    state = TrainState.create(variables["params"],
                              variables.get("batch_stats", {}), tx)
    fused = make_cltr_fused_step(model, criterion, tx)
    eval_fn = make_cltr_eval_loss(model, criterion)
    key = jax.random.key(10_000 + seed)

    # pre-pad every batch once (static shapes -> one jit signature)
    order = np.arange(n)
    rng = np.random.RandomState(seed)
    vbatches = [pad_targets(vt[i:i + det.BATCH], max_pts, 3)
                for i in range(0, len(vx), det.BATCH)]
    vxs = [jnp.asarray(vx[i:i + det.BATCH])
           for i in range(0, len(vx), det.BATCH)]

    def evaluate():
        losses, scores = [], []
        for bx, (labels, points, _mp, valid) in zip(vxs, vbatches):
            loss, logits = eval_fn(state, bx, jnp.asarray(labels),
                                   jnp.asarray(points), jnp.asarray(valid))
            losses.append(float(loss))
            probs = np.asarray(jax.nn.sigmoid(logits))
            scores.append(probs.reshape(probs.shape[0], -1))
        return float(np.mean(losses)), det._count_mae(
            np.concatenate(scores), vt)

    baseline = float(np.mean([len(t["labels"]) for t in vt]))
    traj = {}
    checkpoints = sorted({min(epochs, c) for c in
                          [50, 100, 200, 400, 800, 1500, epochs]})
    done = 0
    for ep_target in checkpoints:
        for _ in range(ep_target - done):
            rng.shuffle(order)
            for i in range(0, n - det.BATCH + 1, det.BATCH):
                idx = order[i:i + det.BATCH]
                labels, points, _mp, valid = pad_targets(
                    [targets[j] for j in idx], max_pts, 3)
                key, sub = jax.random.split(key)
                state, _l, _ = fused(state, jnp.asarray(xs[idx]),
                                     jnp.asarray(labels),
                                     jnp.asarray(points),
                                     jnp.asarray(valid), lr, sub)
        done = ep_target
        loss, mae = evaluate()
        traj[ep_target] = {"loss": round(loss, 3), "mae": round(mae, 3)}
        print(f"  lr {lr:g} ep {ep_target}: loss {loss:.3f} mae {mae:.3f}"
              f" (baseline {baseline:.2f})", flush=True)
        if np.isnan(loss):
            break
    return {"lr": lr, "baseline_mae": baseline, "traj": traj}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lrs", default="1e-4,3e-4")
    ap.add_argument("--epochs", type=int, default=3000)
    args = ap.parse_args()
    out = [probe(float(v), args.epochs) for v in args.lrs.split(",")]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
