#!/usr/bin/env python
"""CLTR trained-outcome parity: reference torch conditional-DETR (run in
place from /root/reference with the torchvision stub) vs our JAX build,
trained on identical synthetic point-annotation data with identical
hyperparameters, per-seed independent inits (same protocol as
benchmarks/parity_dice.py).

A shrunken CLTR (2+2 layers, 100 queries, 64² crops; hidden stays 256 —
the reference hardcodes a 256-dim query sine embedding,
CLTR/transformer.py:40) keeps the 1-vCPU torch side tractable; both sides
shrink identically, so every code path (backbone, conditional decoder,
matcher, criterion) is exercised.

Metrics per seed (val set, no dropout):
  val_loss   criterion weighted sum (identical loss definitions both sides)
  count_mae  |#(sigmoid cls > 0.35) - gt_count| per image, averaged
             (Trainer.py:549-580 counting rule)

Writes benchmarks/PARITY_CLTR.json.
Run (CPU): python benchmarks/parity_cltr.py [--seeds 3] [--epochs 40]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import types

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))
sys.path.insert(0, HERE)

SIZE = 64
N_TRAIN, N_VAL = 32, 24
BATCH = 4
SMALL = dict(num_queries=100, hidden_dim=256, nheads=8, enc_layers=2,
             dec_layers=2, dim_feedforward=512, dropout=0.1)


def make_point_data(seed):
    """Images with K in [2,6] bright gaussian dots; targets in the reference
    DataPointReg contract (DataLoader.py:812-824): labels=1, points_macher
    (x, y, knn)/crop, points (x, y, knn)."""
    rng = np.random.RandomState(1000 + seed)
    imgs, targets = [], []
    yy, xx = np.mgrid[0:SIZE, 0:SIZE]
    for _ in range(N_TRAIN + N_VAL):
        k = rng.randint(2, 7)
        pts = rng.rand(k, 2) * (SIZE - 8) + 4  # (x, y)
        img = rng.randn(SIZE, SIZE, 3).astype(np.float32) * 0.1
        for x0, y0 in pts:
            img += np.exp(-(((xx - x0) ** 2 + (yy - y0) ** 2) / 8.0)
                          )[..., None].astype(np.float32)
        img = (img - img.mean((0, 1))) / (img.std((0, 1)) + 1e-6)
        if k > 1:
            d = np.linalg.norm(pts[:, None] - pts[None], axis=-1)
            np.fill_diagonal(d, np.inf)
            knn = d.min(1)
        else:
            knn = np.full(k, SIZE / 2.0)
        pm = np.concatenate([pts, knn[:, None]], 1).astype(np.float32) / SIZE
        imgs.append(img)
        targets.append({"labels": np.ones(k, np.int64),
                        "points_macher": pm, "points": pm * SIZE})
    tr = (np.stack(imgs[:N_TRAIN]), targets[:N_TRAIN])
    va = (np.stack(imgs[N_TRAIN:]), targets[N_TRAIN:])
    return tr, va


def _count_mae(scores, targets, thresh=0.35):
    """scores: (N, Q) sigmoid class-0 probabilities."""
    errs = [abs(float((s > thresh).sum()) - len(t["labels"]))
            for s, t in zip(scores, targets)]
    return float(np.mean(errs))


# ---------------------------------------------------------------------------
# reference torch side
# ---------------------------------------------------------------------------

def run_torch(train, val, epochs, lr, seed):
    import torchvision_stub

    torchvision_stub.install()
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import torch
    import yaml

    torch.set_num_threads(os.cpu_count() or 8)
    torch.Tensor.cuda = lambda self, *a, **k: self  # matcher hardcodes .cuda()
    from CLTR.build_model import buildCLTR
    from CLTR.misc import NestedTensor

    with open("/root/reference/CLTR/CLTRconfig.yml") as f:
        args = yaml.safe_load(f)
    args.update(SMALL)
    torch.manual_seed(seed)
    np.random.seed(seed)
    model, criterion, _ = buildCLTR(args)
    opt = torch.optim.Adam(model.parameters(), lr=lr)
    xs, targets = train
    n = len(xs)

    def to_t(batch_x):
        return NestedTensor(
            torch.tensor(batch_x.transpose(0, 3, 1, 2)),
            torch.zeros(len(batch_x), SIZE, SIZE, dtype=torch.bool))

    def to_targets(ts):
        return [{k: torch.tensor(v) for k, v in t.items()} for t in ts]

    order = np.arange(n)
    rng = np.random.RandomState(seed)
    model.train()
    criterion.train()
    for _ in range(epochs):
        rng.shuffle(order)
        for i in range(0, n - BATCH + 1, BATCH):
            idx = order[i:i + BATCH]
            opt.zero_grad()
            out = model(to_t(xs[idx]))
            ld = criterion(out, to_targets([targets[j] for j in idx]))
            sum(ld[k] * criterion.weight_dict[k]
                for k in ld if k in criterion.weight_dict).backward()
            opt.step()

    model.eval()
    criterion.eval()
    vx, vt = val
    losses, scores = [], []
    with torch.no_grad():
        for i in range(0, len(vx), BATCH):
            out = model(to_t(vx[i:i + BATCH]))
            ld = criterion(out, to_targets(vt[i:i + BATCH]))
            losses.append(float(sum(
                ld[k] * criterion.weight_dict[k]
                for k in ld if k in criterion.weight_dict)))
            scores.append(torch.sigmoid(out["pred_logits"][..., 0]).numpy())
    return float(np.mean(losses)), _count_mae(np.concatenate(scores), vt)


# ---------------------------------------------------------------------------
# ours
# ---------------------------------------------------------------------------

def run_ours(train, val, epochs, lr, seed):
    import jax
    import jax.numpy as jnp

    from unet_torch_tpu.models.cltr import build_cltr
    from unet_torch_tpu.models.cltr.criterion import pad_targets
    from unet_torch_tpu.train.cltr_steps import make_cltr_fused_step
    from unet_torch_tpu.train.optim import make_optimizer
    from unet_torch_tpu.train.state import TrainState

    model, criterion, _ = build_cltr(dict(SMALL))
    tx = make_optimizer("Adam", lr, 0.0)
    xs, targets = train
    n = len(xs)
    max_pts = max(len(t["labels"]) for t in targets + val[1]) + 1
    variables = model.init(jax.random.key(seed),
                           jnp.asarray(xs[:1]), train=False)
    state = TrainState.create(variables["params"],
                              variables.get("batch_stats", {}), tx)
    fused = make_cltr_fused_step(model, criterion, tx)
    key = jax.random.key(10_000 + seed)

    order = np.arange(n)
    rng = np.random.RandomState(seed)
    for _ in range(epochs):
        rng.shuffle(order)
        for i in range(0, n - BATCH + 1, BATCH):
            idx = order[i:i + BATCH]
            labels, points, _mp, valid = pad_targets(
                [targets[j] for j in idx], max_pts, 3)
            key, sub = jax.random.split(key)
            state, _loss, _ = fused(state, jnp.asarray(xs[idx]),
                                    jnp.asarray(labels), jnp.asarray(points),
                                    jnp.asarray(valid), lr, sub)

    # val: forward without dropout + the same weighted criterion
    from unet_torch_tpu.train.cltr_steps import make_cltr_eval_loss

    eval_fn = make_cltr_eval_loss(model, criterion)
    vx, vt = val
    losses, scores = [], []
    for i in range(0, len(vx), BATCH):
        labels, points, _mp, valid = pad_targets(vt[i:i + BATCH], max_pts, 3)
        loss, logits = eval_fn(state, jnp.asarray(vx[i:i + BATCH]),
                               jnp.asarray(labels), jnp.asarray(points),
                               jnp.asarray(valid))
        losses.append(float(loss))
        scores.append(np.asarray(jax.nn.sigmoid(logits[..., 0])))
    return float(np.mean(losses)), _count_mae(np.concatenate(scores), vt)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--out", default=os.path.join(HERE, "PARITY_CLTR.json"))
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    res = {"torch_val_loss": [], "torch_count_mae": [],
           "ours_val_loss": [], "ours_count_mae": []}
    for s in range(args.seeds):
        tr, va = make_point_data(s)
        tl, tm = run_torch(tr, va, args.epochs, args.lr, s)
        print(f"seed {s} torch: loss {tl:.4f} mae {tm:.3f}", flush=True)
        ol, om = run_ours(tr, va, args.epochs, args.lr, s)
        print(f"seed {s} ours:  loss {ol:.4f} mae {om:.3f}", flush=True)
        res["torch_val_loss"].append(round(tl, 4))
        res["torch_count_mae"].append(round(tm, 4))
        res["ours_val_loss"].append(round(ol, 4))
        res["ours_count_mae"].append(round(om, 4))
    summary = {
        "config": {**SMALL, "epochs": args.epochs, "lr": args.lr,
                   "seeds": args.seeds, "n_train": N_TRAIN, "n_val": N_VAL,
                   "size": SIZE, "batch": BATCH},
        **res,
        "torch_loss_mean": round(float(np.mean(res["torch_val_loss"])), 4),
        "ours_loss_mean": round(float(np.mean(res["ours_val_loss"])), 4),
        "torch_mae_mean": round(float(np.mean(res["torch_count_mae"])), 4),
        "ours_mae_mean": round(float(np.mean(res["ours_count_mae"])), 4),
    }
    with open(args.out, "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
