#!/usr/bin/env python
"""CLTR detection-regime trained-outcome parity (VERDICT r2 item 2).

The r3 run proved val-loss-trajectory parity but both frameworks sat at the
no-detection count-MAE baseline — DETR-style detectors need far more steps
than the 1-vCPU torch side affords at full scale (the ResNet-50 backbone
alone is ~3.7 s/step; lr > 1e-4 diverges to NaN with or without clipping).
This experiment puts BOTH frameworks in a regime where detection onsets
within budget, with every shrink applied identically to both:

  - easy point data: 1-2 bright gaussians per 48^2 image
  - 16 queries, enc 1 / dec 2, ffn 256, dropout 0 (hidden stays 256 — the
    reference hardcodes the 256-dim query sine embedding)
  - thin (1,1,1,1) resnet backbone (torchvision_stub.LAYERS on the torch
    side, cltr_config.backbone_layers on ours)
  - lr 1e-4, global-norm clip 0.1 (CLTRconfig.yml:33's stated value,
    applied on both sides)

Metric: the reference's val counting rule — count = #(sigmoid cls > 0.35)
per image, MAE vs gt count (Trainer.py:549-580).  Detection regime =
MAE below the no-detection baseline (= mean gt count).

Writes benchmarks/PARITY_CLTR_DETECT.json.
Run (CPU): python benchmarks/parity_cltr_detect.py [--seeds 2]
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

SIZE = 48
N_TRAIN, N_VAL = 16, 16
BATCH = 4
SMALL = dict(num_queries=16, hidden_dim=256, nheads=8, enc_layers=1,
             dec_layers=2, dim_feedforward=256, dropout=0.0,
             backbone_layers=(1, 1, 1, 1))
CLIP = 0.1


def make_easy_point_data(seed):
    rng = np.random.RandomState(500 + seed)
    imgs, targets = [], []
    yy, xx = np.mgrid[0:SIZE, 0:SIZE]
    for _ in range(N_TRAIN + N_VAL):
        k = rng.randint(1, 3)
        pts = rng.rand(k, 2) * (SIZE - 12) + 6  # (x, y)
        img = rng.randn(SIZE, SIZE, 3).astype(np.float32) * 0.05
        for x0, y0 in pts:
            img += 2.0 * np.exp(-(((xx - x0) ** 2 + (yy - y0) ** 2) / 10.0)
                                )[..., None].astype(np.float32)
        img = (img - img.mean((0, 1))) / (img.std((0, 1)) + 1e-6)
        knn = np.full(k, SIZE / 2.0) if k == 1 else np.full(
            k, float(np.linalg.norm(pts[0] - pts[1])))
        # The dataset contract (ref DataLoader.py:818-823): points are
        # (y, x, knn-dist) / crop_size — NORMALIZED, and 'points' ==
        # 'points_macher' numerically (points has exactly 3 cols).  The
        # matcher (matcher.py:62) and loss_points (conditional_detr.py:183)
        # both consume the normalized 'points' against sigmoid predictions.
        pm = np.concatenate([pts[:, ::-1], knn[:, None]],
                            1).astype(np.float32) / SIZE
        imgs.append(img)
        targets.append({"labels": np.ones(k, np.int64),
                        "points_macher": pm, "points": pm.copy()})
    return ((np.stack(imgs[:N_TRAIN]), targets[:N_TRAIN]),
            (np.stack(imgs[N_TRAIN:]), targets[N_TRAIN:]))


def _count_mae(scores, targets, thresh=0.35):
    """Reference val counting rule (Trainer.py:558-569): sigmoid probs are
    flattened over num_queries*num_classes entries per image and every entry
    above 0.35 counts — both class channels, not just channel 0."""
    errs = [abs(float((s > thresh).sum()) - len(t["labels"]))
            for s, t in zip(scores, targets)]
    return float(np.mean(errs))


def run_torch(train, val, checkpoints, lr, seed):
    import torchvision_stub

    torchvision_stub.LAYERS = tuple(SMALL["backbone_layers"])
    torchvision_stub.install()
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import torch
    import yaml

    torch.set_num_threads(os.cpu_count() or 8)
    torch.Tensor.cuda = lambda self, *a, **k: self
    from CLTR.build_model import buildCLTR
    from CLTR.misc import NestedTensor

    with open("/root/reference/CLTR/CLTRconfig.yml") as f:
        args = yaml.safe_load(f)
    args.update({k: v for k, v in SMALL.items() if k != "backbone_layers"})
    torch.manual_seed(seed)
    np.random.seed(seed)
    model, criterion, _ = buildCLTR(args)
    opt = torch.optim.Adam(model.parameters(), lr=lr)
    xs, targets = train
    n = len(xs)

    def to_t(bx):
        return NestedTensor(torch.tensor(bx.transpose(0, 3, 1, 2)),
                            torch.zeros(len(bx), SIZE, SIZE,
                                        dtype=torch.bool))

    def to_targets(ts):
        return [{k: torch.tensor(v) for k, v in t.items()} for t in ts]

    def evaluate():
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
                scores.append(torch.sigmoid(
                    out["pred_logits"]).flatten(1).numpy())
        model.train()
        criterion.train()
        return float(np.mean(losses)), _count_mae(np.concatenate(scores),
                                                  vt)

    order = np.arange(n)
    rng = np.random.RandomState(seed)
    model.train()
    criterion.train()
    traj = {}
    done = 0
    for ep_target in checkpoints:
        for _ in range(ep_target - done):
            rng.shuffle(order)
            for i in range(0, n - BATCH + 1, BATCH):
                idx = order[i:i + BATCH]
                opt.zero_grad()
                out = model(to_t(xs[idx]))
                ld = criterion(out, to_targets([targets[j] for j in idx]))
                sum(ld[k] * criterion.weight_dict[k]
                    for k in ld if k in criterion.weight_dict).backward()
                torch.nn.utils.clip_grad_norm_(model.parameters(), CLIP)
                opt.step()
        done = ep_target
        loss, mae = evaluate()
        traj[ep_target] = {"val_loss": round(loss, 3),
                           "count_mae": round(mae, 3)}
        print(f"  torch ep {ep_target}: loss {loss:.2f} mae {mae:.3f}",
              flush=True)
    return traj


def run_ours(train, val, checkpoints, lr, seed, precision="f32"):
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

    model, criterion, _ = build_cltr({**SMALL, "precision": precision})
    tx = make_optimizer("Adam", lr, 0.0, clip_max_norm=CLIP)
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

    def evaluate():
        vx, vt = val
        losses, scores = [], []
        for i in range(0, len(vx), BATCH):
            labels, points, _mp, valid = pad_targets(vt[i:i + BATCH],
                                                     max_pts, 3)
            loss, logits = eval_fn(state, jnp.asarray(vx[i:i + BATCH]),
                                   jnp.asarray(labels), jnp.asarray(points),
                                   jnp.asarray(valid))
            losses.append(float(loss))
            probs = np.asarray(jax.nn.sigmoid(logits))
            scores.append(probs.reshape(probs.shape[0], -1))
        return float(np.mean(losses)), _count_mae(np.concatenate(scores),
                                                  vt)

    order = np.arange(n)
    rng = np.random.RandomState(seed)
    traj = {}
    done = 0
    for ep_target in checkpoints:
        for _ in range(ep_target - done):
            rng.shuffle(order)
            for i in range(0, n - BATCH + 1, BATCH):
                idx = order[i:i + BATCH]
                labels, points, _mp, valid = pad_targets(
                    [targets[j] for j in idx], max_pts, 3)
                key, sub = jax.random.split(key)
                state, _l, _ = fused(state, jnp.asarray(xs[idx]),
                                     jnp.asarray(labels),
                                     jnp.asarray(points),
                                     jnp.asarray(valid), lr, sub)
        done = ep_target
        loss, mae = evaluate()
        traj[ep_target] = {"val_loss": round(loss, 3),
                           "count_mae": round(mae, 3)}
        print(f"  ours  ep {ep_target}: loss {loss:.2f} mae {mae:.3f}",
              flush=True)
    return traj


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=2)
    ap.add_argument("--checkpoints", default="50,100,200,300")
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--out", default=os.path.join(
        HERE, "PARITY_CLTR_DETECT.json"))
    ap.add_argument("--bf16", action="store_true",
                    help="add an ours-bf16 arm (precision quality sign-off)")
    ap.add_argument("--no-torch", action="store_true",
                    help="skip the torch arm (reuse a previous JSON's)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    checkpoints = [int(v) for v in args.checkpoints.split(",")]

    last = str(checkpoints[-1])

    def _final(arm, runs):
        vals = [r[arm][int(last) if int(last) in r[arm] else last]
                ["count_mae"] for r in runs if arm in r]
        return round(float(np.mean(vals)), 4) if vals else None

    def _dump(runs, seeds_done):
        # incremental write per seed — a multi-hour 6-seed campaign must
        # survive being killed at round end with partial evidence intact
        summary = {
            "config": {**{k: v for k, v in SMALL.items()},
                       "lr": args.lr, "clip": CLIP, "size": SIZE,
                       "n_train": N_TRAIN, "n_val": N_VAL, "batch": BATCH,
                       "checkpoints": checkpoints, "seeds": seeds_done},
            "runs": runs,
            "torch_final_mae": _final("torch", runs),
            "ours_final_mae": _final("ours", runs),
            "ours_bf16_final_mae": _final("ours_bf16", runs),
            "baseline_mae": round(float(np.mean(
                [r["baseline_mae"] for r in runs])), 4),
        }
        with open(args.out, "w") as f:
            json.dump(summary, f, indent=2)
        return summary

    runs = []
    for s in range(args.seeds):
        tr, va = make_easy_point_data(s)
        baseline = float(np.mean([len(t["labels"]) for t in va[1]]))
        print(f"seed {s}: no-detection baseline MAE {baseline:.3f}",
              flush=True)
        row = {"seed": s, "baseline_mae": round(baseline, 3)}
        if not args.no_torch:
            row["torch"] = run_torch(tr, va, checkpoints, args.lr, s)
        row["ours"] = run_ours(tr, va, checkpoints, args.lr, s)
        if args.bf16:
            row["ours_bf16"] = run_ours(tr, va, checkpoints, args.lr, s,
                                        precision="bf16")
        runs.append(row)
        summary = _dump(runs, s + 1)

    if runs:
        print(json.dumps(summary))


if __name__ == "__main__":
    main()
