#!/usr/bin/env python
"""Dice-parity experiment: reference torch UNet vs unet_torch_tpu on identical
synthetic data (BASELINE.json's "Dice parity within 0.5%" criterion).

Trains both frameworks' UNet (same width, same loss-family, same LR/optimizer/
epochs/data) and reports final validation multiclass Dice.  Writes
PARITY_DICE.json next to this script.

Run: python benchmarks/parity_dice.py [--epochs 8] [--base 8] [--size 64]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import types

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_data(n_train=16, n_val=16, size=64, n_classes=3, seed=0):
    from unet_torch_tpu.data.synthetic import make_blob_sample

    rng = np.random.RandomState(seed)
    xs, ys = [], []
    for _ in range(n_train + n_val):
        img, mask, _, _ = make_blob_sample(rng, size, 6, n_classes)
        img = (img.astype(np.float64) - img.mean((0, 1))) / img.std((0, 1))
        xs.append(img.astype(np.float32))
        ys.append(mask.astype(np.int64))
    xs, ys = np.stack(xs), np.stack(ys)
    return (xs[:n_train], ys[:n_train]), (xs[n_train:], ys[n_train:])


def dice_multiclass(pred_labels, target, n_classes):
    dices = []
    for c in range(n_classes):
        p = pred_labels == c
        t = target == c
        inter = np.logical_and(p, t).sum()
        denom = p.sum() + t.sum()
        if denom == 0:
            continue
        dices.append(2 * inter / denom)
    return float(np.mean(dices))


def train_torch(train, val, epochs, base, n_classes, lr, batch, seed=0):
    import torch

    sys.modules.setdefault("torchvision", types.ModuleType("torchvision"))
    sys.path.insert(0, "/root/reference")
    from Model import UNet as TorchUNet

    torch.manual_seed(seed)
    (xs, ys), (vx, vy) = train, val
    model = TorchUNet(3, n_classes, base, usa_cuda=False)
    opt = torch.optim.Adam(model.parameters(), lr=lr, weight_decay=1e-4)
    ce = torch.nn.CrossEntropyLoss()
    xs_t = torch.from_numpy(xs.transpose(0, 3, 1, 2))
    ys_t = torch.from_numpy(ys)
    model.train()
    for _ in range(epochs):
        perm = torch.randperm(len(xs_t))
        for i in range(0, len(xs_t), batch):
            idx = perm[i:i + batch]
            opt.zero_grad()
            loss = ce(model(xs_t[idx]), ys_t[idx])
            loss.backward()
            opt.step()
    model.eval()
    with torch.no_grad():
        out = model(torch.from_numpy(vx.transpose(0, 3, 1, 2)))
        pred = out.argmax(1).numpy()
    return dice_multiclass(pred, vy, n_classes)


def train_ours(train, val, epochs, base, n_classes, lr, batch, seed=0):
    import jax
    import jax.numpy as jnp

    from unet_torch_tpu.models.unet import UNet
    from unet_torch_tpu.train.optim import make_optimizer
    from unet_torch_tpu.train.state import TrainState
    from unet_torch_tpu.train.steps import make_single_steps

    (xs, ys), (vx, vy) = train, val
    model = UNet(3, n_classes, base)
    tx = make_optimizer("Adam", lr, 1e-4)
    variables = model.init(jax.random.key(seed), jnp.asarray(xs[:1]),
                           train=False)
    state = TrainState.create(variables["params"],
                              variables.get("batch_stats", {}), tx)
    step, _ = make_single_steps(model, tx, "CE", "CE", n_classes)
    rng = np.random.RandomState(seed)
    key = jax.random.key(seed + 1)
    for _ in range(epochs):
        perm = rng.permutation(len(xs))
        for i in range(0, len(xs), batch):
            idx = perm[i:i + batch]
            state, _loss = step(state, jnp.asarray(xs[idx]),
                                jnp.asarray(ys[idx], jnp.float32), lr, key)
    out = model.apply({"params": state.params,
                       "batch_stats": state.batch_stats},
                      jnp.asarray(vx), train=False)
    pred = np.argmax(np.asarray(out), axis=-1)
    return dice_multiclass(pred, vy, n_classes)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--base", type=int, default=8)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--n-train", type=int, default=16)
    ap.add_argument("--n-val", type=int, default=16)
    ap.add_argument("--backend", default="cpu", choices=["cpu", "axon"],
                    help="JAX backend (cpu iterates fast; axon = real TPU)")
    ap.add_argument("--out", default="PARITY_DICE.json")
    args = ap.parse_args()

    if args.backend == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")

    n_classes = 3
    train, val = make_data(n_train=args.n_train, n_val=args.n_val,
                           size=args.size, n_classes=n_classes)
    ref_dices, our_dices = [], []
    for seed in range(args.seeds):
        d_ref = train_torch(train, val, args.epochs, args.base, n_classes,
                            args.lr, args.batch, seed=seed)
        d_ours = train_ours(train, val, args.epochs, args.base, n_classes,
                            args.lr, args.batch, seed=seed)
        ref_dices.append(d_ref)
        our_dices.append(d_ours)
        print(f"seed {seed}: torch {d_ref:.4f}  ours {d_ours:.4f}",
              flush=True)
    dice_ref = float(np.mean(ref_dices))
    dice_ours = float(np.mean(our_dices))
    result = {
        "reference_torch_dice": round(dice_ref, 4),
        "unet_torch_tpu_dice": round(dice_ours, 4),
        "abs_gap": round(abs(dice_ref - dice_ours), 4),
        "ours_minus_torch": round(dice_ours - dice_ref, 4),
        "meets_criterion": bool(dice_ours >= dice_ref - 0.005),
        "per_seed_torch": [round(d, 4) for d in ref_dices],
        "per_seed_ours": [round(d, 4) for d in our_dices],
        "std_torch": round(float(np.std(ref_dices)), 4),
        "std_ours": round(float(np.std(our_dices)), 4),
        "config": vars(args),
    }
    print(json.dumps(result, indent=2))
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            args.out)
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
