#!/usr/bin/env python
"""Trained-outcome parity suite — fills the BASELINE.md cells beyond the CE
experiment (benchmarks/parity_dice.py):

  mc        flagship multi-class `dice_bce_mc` loss (config.yml:13), torch
            reference loss.py run in place vs ours; metric = val Dice
  multitask UNet_multitask two-head density regression (mse+mse on ReLU
            heads, Trainer.py:881-890); metric = val count MAE (sum/200)
  bf16      ours only: bf16-compute vs f32 training, same seeds; the
            BASELINE.json "parity within 0.5%" criterion applied to precision
  topo      ours only (the reference DELETED its topo implementations —
            SURVEY.md §0; only the dispatch names survive): dice_bce warm-up
            -> topo loss vs dice_bce-only, metric = component-count MRE

Writes benchmarks/PARITY_SUITE.json.  Run: python benchmarks/parity_suite.py
[--experiments mc,multitask,bf16,topo] [--seeds 3] [--epochs 80]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import types

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parity_dice import dice_multiclass, make_data  # noqa: E402


def _torch_setup():
    sys.modules.setdefault("torchvision", types.ModuleType("torchvision"))
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")


def make_density_data(n_train=32, n_val=48, size=64, seed=0):
    from unet_torch_tpu.data.synthetic import make_blob_sample

    rng = np.random.RandomState(seed)
    xs, y1s, y2s = [], [], []
    for _ in range(n_train + n_val):
        img, mask, _, density = make_blob_sample(rng, size, 6, 3)
        im = (img.astype(np.float64) - img.mean((0, 1))) / img.std((0, 1))
        xs.append(im.astype(np.float32))
        # two heads at realistic count scale (sum(density) ~ n_cells; the
        # class-fraction weights keep the heads distinct), x200 like the
        # reference's density labels (DataLoader.py:370)
        f1 = max((mask == 1).mean() / max((mask > 0).mean(), 1e-6), 0.05)
        d1 = density * f1 * 200.0
        d2 = density * (1.0 - f1) * 200.0
        y1s.append(d1[..., None].astype(np.float32))
        y2s.append(d2[..., None].astype(np.float32))
    xs, y1s, y2s = np.stack(xs), np.stack(y1s), np.stack(y2s)
    tr = (xs[:n_train], y1s[:n_train], y2s[:n_train])
    va = (xs[n_train:], y1s[n_train:], y2s[n_train:])
    return tr, va


# ---------------------------------------------------------------- mc dice_bce_mc

def mc_torch(train, val, epochs, base, lr, batch, seed):
    import torch

    _torch_setup()
    import loss as ref_loss
    from Model import UNet as TorchUNet

    ref_loss.CLASS_NUMBER = 3
    torch.manual_seed(seed)
    (xs, ys), (vx, vy) = train, val
    model = TorchUNet(3, 3, base, usa_cuda=False)
    opt = torch.optim.Adam(model.parameters(), lr=lr, weight_decay=1e-4)
    xs_t = torch.from_numpy(xs.transpose(0, 3, 1, 2))
    ys_t = torch.from_numpy(ys).float()
    model.train()
    for _ in range(epochs):
        perm = torch.randperm(len(xs_t))
        for i in range(0, len(xs_t), batch):
            idx = perm[i:i + batch]
            opt.zero_grad()
            out = model(xs_t[idx])
            ref_loss.calc_loss(out, ys_t[idx],
                               loss_type="dice_bce_mc").backward()
            opt.step()
    model.eval()
    with torch.no_grad():
        pred = model(torch.from_numpy(vx.transpose(0, 3, 1, 2))).argmax(1)
    return dice_multiclass(pred.numpy(), vy, 3)


def mc_ours(train, val, epochs, base, lr, batch, seed, dtype="float32",
            fold=False, fused_head=False):
    import jax
    import jax.numpy as jnp

    from unet_torch_tpu.models.unet import UNet
    from unet_torch_tpu.train.optim import make_optimizer
    from unet_torch_tpu.train.state import TrainState
    from unet_torch_tpu.train.steps import make_single_steps

    (xs, ys), (vx, vy) = train, val
    model = UNet(3, 3, base, fold=fold,
                 dtype=jnp.bfloat16 if dtype == "bfloat16"
                 else jnp.float32)
    tx = make_optimizer("Adam", lr, 1e-4)
    variables = model.init(jax.random.key(seed), jnp.asarray(xs[:1]),
                           train=False)
    state = TrainState.create(variables["params"],
                              variables.get("batch_stats", {}), tx)
    step, _ = make_single_steps(model, tx, "dice_bce_mc", "dice_bce_mc", 3,
                                fused_head=fused_head)
    rng = np.random.RandomState(seed)
    key = jax.random.key(seed + 1)
    for _ in range(epochs):
        perm = rng.permutation(len(xs))
        for i in range(0, len(xs), batch):
            idx = perm[i:i + batch]
            key, sub = jax.random.split(key)
            state, _ = step(state, jnp.asarray(xs[idx]),
                            jnp.asarray(ys[idx], jnp.float32), lr, sub)
    out = model.apply({"params": state.params,
                       "batch_stats": state.batch_stats},
                      jnp.asarray(vx), train=False)
    pred = np.argmax(np.asarray(out, np.float32), axis=-1)
    return dice_multiclass(pred, vy, 3)


# ------------------------------------------------------ UNet_attention dice

def att_torch(train, val, epochs, base, lr, batch, seed):
    """Reference UNet_attention (Model.py:294-391) trained-outcome arm —
    the reference never constructs it from its CLI (train.py:267-271 bug),
    but the class itself is trainable."""
    import torch

    _torch_setup()
    import loss as ref_loss
    from Model import UNet_attention as TorchUNetAttention

    ref_loss.CLASS_NUMBER = 3
    torch.manual_seed(seed)
    (xs, ys), (vx, vy) = train, val
    model = TorchUNetAttention(3, 3, base, usa_cuda=False)
    opt = torch.optim.Adam(model.parameters(), lr=lr, weight_decay=1e-4)
    xs_t = torch.from_numpy(xs.transpose(0, 3, 1, 2))
    ys_t = torch.from_numpy(ys).float()
    model.train()
    for _ in range(epochs):
        perm = torch.randperm(len(xs_t))
        for i in range(0, len(xs_t), batch):
            idx = perm[i:i + batch]
            opt.zero_grad()
            ref_loss.calc_loss(model(xs_t[idx]), ys_t[idx],
                               loss_type="dice_bce_mc").backward()
            opt.step()
    model.eval()
    with torch.no_grad():
        pred = model(torch.from_numpy(vx.transpose(0, 3, 1, 2))).argmax(1)
    return dice_multiclass(pred.numpy(), vy, 3)


def att_ours(train, val, epochs, base, lr, batch, seed):
    import jax
    import jax.numpy as jnp

    from unet_torch_tpu.models.unet import UNetAttention
    from unet_torch_tpu.train.optim import make_optimizer
    from unet_torch_tpu.train.state import TrainState
    from unet_torch_tpu.train.steps import make_single_steps

    (xs, ys), (vx, vy) = train, val
    model = UNetAttention(3, 3, base)
    tx = make_optimizer("Adam", lr, 1e-4)
    variables = model.init(jax.random.key(seed), jnp.asarray(xs[:1]),
                           train=False)
    state = TrainState.create(variables["params"],
                              variables.get("batch_stats", {}), tx)
    step, _ = make_single_steps(model, tx, "dice_bce_mc", "dice_bce_mc", 3)
    rng = np.random.RandomState(seed)
    key = jax.random.key(seed + 1)
    for _ in range(epochs):
        perm = rng.permutation(len(xs))
        for i in range(0, len(xs), batch):
            idx = perm[i:i + batch]
            key, sub = jax.random.split(key)
            state, _ = step(state, jnp.asarray(xs[idx]),
                            jnp.asarray(ys[idx], jnp.float32), lr, sub)
    out = model.apply({"params": state.params,
                       "batch_stats": state.batch_stats},
                      jnp.asarray(vx), train=False)
    pred = np.argmax(np.asarray(out, np.float32), axis=-1)
    return dice_multiclass(pred, vy, 3)


# ---------------------------------------------------------------- multitask MAE

def _count_mae(pred1, pred2, y1, y2):
    """val count MAE: sum(ReLU(out))/200 vs sum(label)/200, mean over heads."""
    maes = []
    for p, y in ((pred1, y1), (pred2, y2)):
        c_pred = np.maximum(p, 0).sum(axis=(1, 2, 3)) / 200.0
        c_gt = y.sum(axis=(1, 2, 3)) / 200.0
        maes.append(np.abs(c_pred - c_gt).mean())
    return float(np.mean(maes))


def multitask_torch(train, val, epochs, base, lr, batch, seed):
    import torch

    _torch_setup()
    from Model import UNet_multitask

    torch.manual_seed(seed)
    xs, y1s, y2s = train
    vx, vy1, vy2 = val
    model = UNet_multitask(3, 1, base, usa_cuda=False)
    opt = torch.optim.Adam(model.parameters(), lr=lr, weight_decay=1e-4)
    xs_t = torch.from_numpy(xs.transpose(0, 3, 1, 2))
    y1_t = torch.from_numpy(y1s.transpose(0, 3, 1, 2))
    y2_t = torch.from_numpy(y2s.transpose(0, 3, 1, 2))
    mse = torch.nn.MSELoss()
    model.train()
    for _ in range(epochs):
        perm = torch.randperm(len(xs_t))
        for i in range(0, len(xs_t), batch):
            idx = perm[i:i + batch]
            opt.zero_grad()
            o1, o2 = model(xs_t[idx])
            # Trainer.py:881-890 — ReLU on both heads, loss1 + loss2
            loss = mse(torch.relu(o1), y1_t[idx]) + \
                mse(torch.relu(o2), y2_t[idx])
            loss.backward()
            opt.step()
    model.eval()
    with torch.no_grad():
        o1, o2 = model(torch.from_numpy(vx.transpose(0, 3, 1, 2)))
        o1 = torch.relu(o1).numpy().transpose(0, 2, 3, 1)
        o2 = torch.relu(o2).numpy().transpose(0, 2, 3, 1)
    return _count_mae(o1, o2, vy1, vy2)


def multitask_ours(train, val, epochs, base, lr, batch, seed):
    import jax
    import jax.numpy as jnp

    from unet_torch_tpu.models.unet import UNetMultitask
    from unet_torch_tpu.train.optim import make_optimizer
    from unet_torch_tpu.train.state import TrainState
    from unet_torch_tpu.train.steps import make_multitask_steps

    xs, y1s, y2s = train
    vx, vy1, vy2 = val
    model = UNetMultitask(3, 1, base)
    tx = make_optimizer("Adam", lr, 1e-4)
    variables = model.init(jax.random.key(seed), jnp.asarray(xs[:1]),
                           train=False)
    state = TrainState.create(variables["params"],
                              variables.get("batch_stats", {}), tx)
    step, _ = make_multitask_steps(model, tx, "mse", 1, combine="sum")
    rng = np.random.RandomState(seed)
    key = jax.random.key(seed + 1)
    no_ratio = jnp.asarray(False)
    for _ in range(epochs):
        perm = rng.permutation(len(xs))
        for i in range(0, len(xs), batch):
            idx = perm[i:i + batch]
            key, sub = jax.random.split(key)
            state, *_ = step(state, jnp.asarray(xs[idx]),
                             jnp.asarray(y1s[idx][..., 0]),
                             jnp.asarray(y2s[idx][..., 0]),
                             lr, sub, no_ratio)
    o1, o2 = model.apply({"params": state.params,
                          "batch_stats": state.batch_stats},
                         jnp.asarray(vx), train=False)
    o1 = np.maximum(np.asarray(o1), 0)
    o2 = np.maximum(np.asarray(o2), 0)
    return _count_mae(o1, o2, vy1, vy2)


# ------------------------------------------------------- TransUnet trained

def _small_tu_mods(cfg):
    """Shrink R50-ViT-B/16 to a CPU-trainable hybrid (same structure: ResNetV2
    stem + 3 stages + skips, pre-LN transformer, DecoderCup): hidden 64,
    2 layers, 4 heads, mlp 128, (1,1,1) bottleneck units, 64^2 grid (4,4).
    Applied identically to the reference CONFIGS entry and ours."""
    cfg.hidden_size = 64
    cfg.transformer.num_layers = 2
    cfg.transformer.num_heads = 4
    cfg.transformer.mlp_dim = 128
    cfg.patches.grid = (4, 4)
    cfg.resnet.num_layers = (1, 1, 1)
    cfg.n_classes = 3
    cfg.n_skip = 3
    return cfg


def tu_torch(train, val, epochs, lr, batch, seed):
    import copy

    import torch

    _torch_setup()
    import loss as ref_loss
    from TransUnet.vit_seg_modeling import CONFIGS, VisionTransformer

    ref_loss.CLASS_NUMBER = 3
    torch.manual_seed(seed)
    (xs, ys), (vx, vy) = train, val
    cfg = _small_tu_mods(copy.deepcopy(CONFIGS["R50-ViT-B_16"]))
    model = VisionTransformer(cfg, img_size=64, num_classes=3)
    opt = torch.optim.Adam(model.parameters(), lr=lr, weight_decay=1e-4)
    xs_t = torch.from_numpy(xs.transpose(0, 3, 1, 2))
    ys_t = torch.from_numpy(ys).float()
    model.train()
    for _ in range(epochs):
        perm = torch.randperm(len(xs_t))
        for i in range(0, len(xs_t), batch):
            idx = perm[i:i + batch]
            opt.zero_grad()
            ref_loss.calc_loss(model(xs_t[idx]), ys_t[idx],
                               loss_type="dice_bce_mc").backward()
            opt.step()
    model.eval()
    with torch.no_grad():
        pred = model(torch.from_numpy(vx.transpose(0, 3, 1, 2))).argmax(1)
    return dice_multiclass(pred.numpy(), vy, 3)


def tu_ours(train, val, epochs, lr, batch, seed, fused_head=False):
    import copy

    import jax
    import jax.numpy as jnp

    from unet_torch_tpu.models.transunet.configs import CONFIGS
    from unet_torch_tpu.models.transunet.vit import VisionTransformer
    from unet_torch_tpu.train.optim import make_optimizer
    from unet_torch_tpu.train.state import TrainState
    from unet_torch_tpu.train.steps import make_single_steps

    (xs, ys), (vx, vy) = train, val
    cfg = _small_tu_mods(copy.deepcopy(CONFIGS["R50-ViT-B_16"]))
    model = VisionTransformer(cfg, 64, 3)
    tx = make_optimizer("Adam", lr, 1e-4)
    variables = model.init(jax.random.key(seed), jnp.asarray(xs[:1]),
                           train=False)
    state = TrainState.create(variables["params"],
                              variables.get("batch_stats", {}), tx)
    step, _ = make_single_steps(model, tx, "dice_bce_mc", "dice_bce_mc", 3,
                                fused_head=fused_head)
    rng = np.random.RandomState(seed)
    key = jax.random.key(seed + 1)
    for _ in range(epochs):
        perm = rng.permutation(len(xs))
        for i in range(0, len(xs), batch):
            idx = perm[i:i + batch]
            key, sub = jax.random.split(key)
            state, _ = step(state, jnp.asarray(xs[idx]),
                            jnp.asarray(ys[idx], jnp.float32), lr, sub)
    out = model.apply({"params": state.params,
                       "batch_stats": state.batch_stats},
                      jnp.asarray(vx), train=False)
    pred = np.argmax(np.asarray(out, np.float32), axis=-1)
    return dice_multiclass(pred, vy, 3)


# ---------------------------------------------------------------- topo (ours)

def topo_ours(train, val, epochs, base, lr, batch, seed, use_topo,
              loss_type="TopoLoss", pair_downsample=1, pipeline_depth=0,
              window=64):
    """Warm-up dice_bce then topo loss (singe_train_wup semantics,
    Trainer.py:291-479); returns component-count MRE on val.

    Arms beyond the default serial/global loss:
      pipeline_depth=d  run the topo phase through TopoPipeline(depth=d)
                        (the production trainer path, train/trainer.py:383) —
                        pairing indices are d updates stale
      pair_downsample   PH pairing on a ds x-max-pooled likelihood
      loss_type         "TopoCount" = localized per-window constraint
    """
    import cv2

    import jax
    import jax.numpy as jnp

    from unet_torch_tpu.models.unet import UNet
    from unet_torch_tpu.train.optim import make_optimizer
    from unet_torch_tpu.train.state import TrainState
    from unet_torch_tpu.train.steps import make_topo_steps

    (xs, ys, dots), (vx, vy, vdots) = train, val
    model = UNet(3, 1, base)
    tx = make_optimizer("Adam", lr, 1e-4)
    variables = model.init(jax.random.key(seed), jnp.asarray(xs[:1]),
                           train=False)
    state = TrainState.create(variables["params"],
                              variables.get("batch_stats", {}), tx)
    (warm_step, _), (topo_step, _), TopoPipeline = make_topo_steps(
        model, tx, loss_type, 1, pair_downsample=pair_downsample,
        window=window)
    rng = np.random.RandomState(seed)
    key = jax.random.key(seed + 1)
    warm_epochs = 5 if use_topo else epochs
    for ep in range(1, epochs + 1):
        perm = rng.permutation(len(xs))
        pipe = (TopoPipeline(depth=pipeline_depth)
                if pipeline_depth and ep > warm_epochs else None)
        for i in range(0, len(xs), batch):
            idx = perm[i:i + batch]
            bx = jnp.asarray(xs[idx])
            by = jnp.asarray(ys[idx], jnp.float32)
            bd = jnp.asarray(dots[idx], jnp.float32)
            key, sub = jax.random.split(key)
            if ep <= warm_epochs:
                state, _ = warm_step(state, bx, by, bd, lr, sub)
            elif pipe is not None:
                state, _ = pipe.step(state, bx, by, bd, lr, sub)
            else:
                state, _ = topo_step(state, bx, by, bd, lr, sub)
        if pipe is not None:
            state, _ = pipe.flush(state)
    out = model.apply({"params": state.params,
                       "batch_stats": state.batch_stats},
                      jnp.asarray(vx), train=False)
    prob = 1.0 / (1.0 + np.exp(-np.asarray(out)[..., 0]))
    mres = []
    for p, d in zip(prob, vdots):
        n_pred = cv2.connectedComponents(
            (p > 0.5).astype(np.uint8))[0] - 1
        n_gt = float(d.sum())
        mres.append(abs(n_pred - n_gt) / max(n_gt, 1.0))
    return float(np.mean(mres))


def make_binary_data(n_train=32, n_val=48, size=64, seed=0):
    from unet_torch_tpu.data.synthetic import make_blob_sample

    rng = np.random.RandomState(seed)
    xs, ys, ds = [], [], []
    for _ in range(n_train + n_val):
        img, mask, dots, _ = make_blob_sample(rng, size, 6, 3)
        im = (img.astype(np.float64) - img.mean((0, 1))) / img.std((0, 1))
        xs.append(im.astype(np.float32))
        ys.append((mask > 0).astype(np.int64))
        ds.append(dots.astype(np.float32))
    xs, ys, ds = np.stack(xs), np.stack(ys), np.stack(ds)
    return ((xs[:n_train], ys[:n_train], ds[:n_train]),
            (xs[n_train:], ys[n_train:], ds[n_train:]))


# -------------------------------------------------------------------- driver

def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--experiments", default="mc,multitask,bf16,topo")
    # 'fusedhead' (opt-in): trained-outcome A/B for the r5 default flip
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--epochs", type=int, default=80)
    ap.add_argument("--base", type=int, default=8)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--out", default="PARITY_SUITE.json")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")

    wanted = args.experiments.split(",")
    seeds = range(args.seeds)
    results = {}

    if "mc" in wanted:
        train, val = make_data(n_train=32, n_val=48)
        ref = [mc_torch(train, val, args.epochs, args.base, args.lr,
                        args.batch, s) for s in seeds]
        ours = [mc_ours(train, val, args.epochs, args.base, args.lr,
                        args.batch, s) for s in seeds]
        results["mc_dice_bce_mc"] = {
            "torch_dice": round(float(np.mean(ref)), 4),
            "ours_dice": round(float(np.mean(ours)), 4),
            "abs_gap": round(abs(float(np.mean(ref)) -
                                 float(np.mean(ours))), 4),
            "per_seed_torch": [round(v, 4) for v in ref],
            "per_seed_ours": [round(v, 4) for v in ours]}
        print("mc:", json.dumps(results["mc_dice_bce_mc"]), flush=True)

    if "unet_attention" in wanted:
        train, val = make_data(n_train=32, n_val=48)
        ref = [att_torch(train, val, args.epochs, args.base, args.lr,
                         args.batch, s) for s in seeds]
        ours = [att_ours(train, val, args.epochs, args.base, args.lr,
                         args.batch, s) for s in seeds]
        results["unet_attention_dice_bce_mc"] = {
            "note": "reference UNet_attention (Model.py:294-391) — never "
                    "reachable from the ref CLI (train.py:267-271 bug), "
                    "trained here directly; ours: models/unet.py::"
                    "UNetAttention",
            "torch_dice": round(float(np.mean(ref)), 4),
            "ours_dice": round(float(np.mean(ours)), 4),
            "abs_gap": round(abs(float(np.mean(ref)) -
                                 float(np.mean(ours))), 4),
            "per_seed_torch": [round(v, 4) for v in ref],
            "per_seed_ours": [round(v, 4) for v in ours]}
        print("unet_attention:",
              json.dumps(results["unet_attention_dice_bce_mc"]), flush=True)

    if "multitask" in wanted:
        train, val = make_density_data()
        ref = [multitask_torch(train, val, args.epochs, args.base, args.lr,
                               args.batch, s) for s in seeds]
        ours = [multitask_ours(train, val, args.epochs, args.base, args.lr,
                               args.batch, s) for s in seeds]
        gt_mean = float(np.mean(val[1].sum(axis=(1, 2, 3)) / 200.0 +
                                val[2].sum(axis=(1, 2, 3)) / 200.0) / 2)
        results["multitask_count_mae"] = {
            "torch_mae": round(float(np.mean(ref)), 4),
            "ours_mae": round(float(np.mean(ours)), 4),
            "mean_gt_count": round(gt_mean, 2),
            "per_seed_torch": [round(v, 4) for v in ref],
            "per_seed_ours": [round(v, 4) for v in ours]}
        print("multitask:", json.dumps(results["multitask_count_mae"]),
              flush=True)

    if "bf16" in wanted:
        train, val = make_data(n_train=32, n_val=48)
        f32 = [mc_ours(train, val, args.epochs, args.base, args.lr,
                       args.batch, s, dtype="float32") for s in seeds]
        bf16 = [mc_ours(train, val, args.epochs, args.base, args.lr,
                        args.batch, s, dtype="bfloat16") for s in seeds]
        results["bf16_vs_f32"] = {
            "f32_dice": round(float(np.mean(f32)), 4),
            "bf16_dice": round(float(np.mean(bf16)), 4),
            "abs_gap": round(abs(float(np.mean(f32)) -
                                 float(np.mean(bf16))), 4),
            "per_seed_f32": [round(v, 4) for v in f32],
            "per_seed_bf16": [round(v, 4) for v in bf16]}
        print("bf16:", json.dumps(results["bf16_vs_f32"]), flush=True)

    if "transunet" in wanted:
        train, val = make_data(n_train=32, n_val=48)
        ref = [tu_torch(train, val, args.epochs, args.lr, args.batch, s)
               for s in seeds]
        ours = [tu_ours(train, val, args.epochs, args.lr, args.batch, s)
                for s in seeds]
        results["transunet_dice_bce_mc"] = {
            "note": "R50-ViT-B/16 shrunk to hidden 64 / 2 layers / (1,1,1) "
                    "resnet units, 64^2, identical mods both frameworks "
                    "(ref train.py:219-238 TransUnet mode)",
            "torch_dice": round(float(np.mean(ref)), 4),
            "ours_dice": round(float(np.mean(ours)), 4),
            "abs_gap": round(abs(float(np.mean(ref)) -
                                 float(np.mean(ours))), 4),
            "per_seed_torch": [round(v, 4) for v in ref],
            "per_seed_ours": [round(v, 4) for v in ours]}
        print("transunet:", json.dumps(results["transunet_dice_bce_mc"]),
              flush=True)

    if "fusedhead" in wanted:
        # trained-outcome evidence for the fused planes head default (r5):
        # same data/seeds, W-folded model both arms, loss on the C-minor
        # logits vs on the folded class planes (value-equivalent up to
        # summation order — this verifies converged outcomes match too)
        train, val = make_data(n_train=32, n_val=48)
        plain = [mc_ours(train, val, args.epochs, args.base, args.lr,
                         args.batch, s, fold=True, fused_head=False)
                 for s in seeds]
        fused = [mc_ours(train, val, args.epochs, args.base, args.lr,
                         args.batch, s, fold=True, fused_head=True)
                 for s in seeds]
        results["fusedhead_vs_cminor"] = {
            "cminor_dice": round(float(np.mean(plain)), 4),
            "fused_dice": round(float(np.mean(fused)), 4),
            "abs_gap": round(abs(float(np.mean(plain)) -
                                 float(np.mean(fused))), 4),
            "per_seed_cminor": [round(v, 4) for v in plain],
            "per_seed_fused": [round(v, 4) for v in fused]}
        print("fusedhead:", json.dumps(results["fusedhead_vs_cminor"]),
              flush=True)

    # the serial/global topo arm is the shared control of four experiments —
    # run it once per invocation
    _topo_serial_cache = {}

    def topo_serial_arm():
        if "arm" not in _topo_serial_cache:
            train, val = make_binary_data()
            _topo_serial_cache["data"] = (train, val)
            _topo_serial_cache["arm"] = [
                topo_ours(train, val, args.epochs, args.base, args.lr,
                          args.batch, s, use_topo=True) for s in seeds]
        return _topo_serial_cache["data"], _topo_serial_cache["arm"]

    if "topo" in wanted:
        (train, val), topo = topo_serial_arm()
        plain = [topo_ours(train, val, args.epochs, args.base, args.lr,
                           args.batch, s, use_topo=False) for s in seeds]
        results["topo_count_mre"] = {
            "note": "reference topo implementations are deleted from the "
                    "snapshot (SURVEY.md §0) — no torch side exists; this "
                    "verifies our topo loss trains and improves counting",
            "dice_bce_only_mre": round(float(np.mean(plain)), 4),
            "topo_warmup_mre": round(float(np.mean(topo)), 4),
            "per_seed_plain": [round(v, 4) for v in plain],
            "per_seed_topo": [round(v, 4) for v in topo]}
        print("topo:", json.dumps(results["topo_count_mre"]), flush=True)

    if "topo_pipelined" in wanted:
        # VERDICT r4 item 3: the production trainer runs the topo phase
        # through TopoPipeline (depth-2 stale pairing indices,
        # train/trainer.py:383-384) while the quality evidence ran the
        # serial exact step — measure the staleness cost at convergence.
        (train, val), serial = topo_serial_arm()
        piped = [topo_ours(train, val, args.epochs, args.base, args.lr,
                           args.batch, s, use_topo=True, pipeline_depth=2)
                 for s in seeds]
        results["topo_pipelined_vs_serial"] = {
            "note": "serial exact two-phase step vs TopoPipeline(depth=2) "
                    "— the production trainer/bench path; pairing indices "
                    "are <=2 updates stale (train/steps.py::TopoPipeline)",
            "serial_mre": round(float(np.mean(serial)), 4),
            "pipelined_mre": round(float(np.mean(piped)), 4),
            "per_seed_serial": [round(v, 4) for v in serial],
            "per_seed_pipelined": [round(v, 4) for v in piped]}
        print("topo_pipelined:",
              json.dumps(results["topo_pipelined_vs_serial"]), flush=True)

    if "topo_coarse" in wanted:
        # VERDICT r4 item 4 (quality side): PH pairing on a 2x/4x
        # max-pooled likelihood — host union-find cost shrinks ~ds^2;
        # does counting quality hold?
        (train, val), ds1 = topo_serial_arm()
        arms = {"ds1": ds1}
        for ds in (2, 4):
            vals = [topo_ours(train, val, args.epochs, args.base, args.lr,
                              args.batch, s, use_topo=True,
                              pair_downsample=ds) for s in seeds]
            arms[f"ds{ds}"] = vals
            print(f"  topo ds{ds}: {float(np.mean(vals)):.4f}", flush=True)
        results["topo_coarse_pairing"] = {
            "note": "PH0 pairing on a ds x-max-pooled likelihood "
                    "(losses/topo.py::downsample_max), gradients through "
                    "the window-max pixels; ds=1 is the exact default",
            **{f"{k}_mre": round(float(np.mean(v)), 4)
               for k, v in arms.items()},
            **{f"per_seed_{k}": [round(x, 4) for x in v]
               for k, v in arms.items()}}
        print("topo_coarse:", json.dumps(results["topo_coarse_pairing"]),
              flush=True)

    if "topocount" in wanted:
        # VERDICT r4 item 7: the localized per-window TopoCount flavor
        # (losses/topo.py::topocount_loss_from_pairing, Abousamra-style)
        # vs the global Hu-style persistence loss, same seeds/data.
        # window=32 => 4 windows on the 64^2 fixture (the 512^2-default
        # window of 64 would degenerate to one global window here).
        (train, val), global_arm = topo_serial_arm()
        local_arm = [topo_ours(train, val, args.epochs, args.base,
                               args.lr, args.batch, s, use_topo=True,
                               loss_type="TopoCount", window=32)
                     for s in seeds]
        results["topocount_localized"] = {
            "note": "TopoCount = localized per-window PH0 constraint "
                    "(window=32 => 2x2 windows at 64^2), vs the global "
                    "persistence-matching TopoLoss; both after dice_bce "
                    "warm-up, metric = component-count MRE",
            "global_mre": round(float(np.mean(global_arm)), 4),
            "topocount_mre": round(float(np.mean(local_arm)), 4),
            "per_seed_global": [round(v, 4) for v in global_arm],
            "per_seed_topocount": [round(v, 4) for v in local_arm]}
        print("topocount:", json.dumps(results["topocount_localized"]),
              flush=True)

    # protocol is recorded PER EXPERIMENT: entries in the merged JSON may
    # come from runs with different seed/epoch settings, so a single shared
    # block would misdocument every entry the current run didn't produce
    proto = {"seeds": args.seeds, "epochs": args.epochs, "base": args.base,
             "lr": args.lr, "batch": args.batch, "size": 64,
             "n_train": 32, "n_val": 48}
    for entry in results.values():
        entry["protocol"] = dict(proto)

    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            args.out)
    existing = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            existing = json.load(f)
    existing.pop("protocol", None)  # legacy shared block
    existing.update(results)
    with open(out_path, "w") as f:
        json.dump(existing, f, indent=2)
    print(json.dumps(existing, indent=2))


if __name__ == "__main__":
    main()
