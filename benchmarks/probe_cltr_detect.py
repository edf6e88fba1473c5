#!/usr/bin/env python
"""Probe (ours-only): how many steps until the shrunken CLTR leaves the
no-detection regime (count MAE < gt-mean baseline) on the synthetic point
data?  Informs the budget for the two-framework detection-regime parity run
(VERDICT r2 item 2).

Run: python benchmarks/probe_cltr_detect.py [--epochs-list 100,200,400]
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

import parity_cltr as pc  # noqa: E402


def run_ours_trajectory(train, val, checkpoints, lr, seed, small):
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

    model, criterion, _ = build_cltr(dict(small))
    tx = make_optimizer("Adam", lr, 0.0, clip_max_norm=0.1)
    xs, targets = train
    n = len(xs)
    max_pts = max(len(t["labels"]) for t in targets + val[1]) + 1
    variables = model.init(jax.random.key(seed), jnp.asarray(xs[:1]),
                          train=False)
    state = TrainState.create(variables["params"],
                              variables.get("batch_stats", {}), tx)
    fused = make_cltr_fused_step(model, criterion, tx)
    eval_fn = make_cltr_eval_loss(model, criterion)
    key = jax.random.key(10_000 + seed)
    order = np.arange(n)
    rng = np.random.RandomState(seed)

    def evaluate():
        vx, vt = val
        losses, scores = [], []
        for i in range(0, len(vx), pc.BATCH):
            labels, points, _mp, valid = pad_targets(vt[i:i + pc.BATCH],
                                                     max_pts, 3)
            loss, logits = eval_fn(state, jnp.asarray(vx[i:i + pc.BATCH]),
                                   jnp.asarray(labels), jnp.asarray(points),
                                   jnp.asarray(valid))
            losses.append(float(loss))
            # reference counting rule flattens queries*classes — every
            # sigmoid entry above threshold counts, BOTH class channels
            # (Trainer.py:558-569; matches parity_cltr_detect's arms)
            probs = np.asarray(jax.nn.sigmoid(logits))
            scores.append(probs.reshape(probs.shape[0], -1))
        return (float(np.mean(losses)),
                pc._count_mae(np.concatenate(scores), vt))

    traj = {}
    done = 0
    for ep_target in checkpoints:
        for _ in range(ep_target - done):
            rng.shuffle(order)
            for i in range(0, n - pc.BATCH + 1, pc.BATCH):
                idx = order[i:i + pc.BATCH]
                labels, points, _mp, valid = pad_targets(
                    [targets[j] for j in idx], max_pts, 3)
                key, sub = jax.random.split(key)
                state, _loss, _ = fused(
                    state, jnp.asarray(xs[idx]), jnp.asarray(labels),
                    jnp.asarray(points), jnp.asarray(valid), lr, sub)
        done = ep_target
        loss, mae = evaluate()
        traj[ep_target] = {"val_loss": round(loss, 3),
                           "count_mae": round(mae, 3)}
        print(f"epoch {ep_target}: loss {loss:.2f} mae {mae:.3f}",
              flush=True)
    return traj


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs-list", default="50,100,200,400,800")
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    small = dict(pc.SMALL)
    small.update(enc_layers=1, dec_layers=2, dim_feedforward=256,
                 num_queries=50)
    checkpoints = [int(v) for v in args.epochs_list.split(",")]
    tr, va = pc.make_point_data(args.seed)
    gt_mean = float(np.mean([len(t["labels"]) for t in va[1]]))
    print(f"no-detection baseline MAE = {gt_mean:.3f}", flush=True)
    traj = run_ours_trajectory(tr, va, checkpoints, args.lr, args.seed,
                               small)
    print(json.dumps({"baseline_mae": gt_mean, "trajectory": traj,
                      "small": small, "lr": args.lr}))


if __name__ == "__main__":
    main()
