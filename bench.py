#!/usr/bin/env python
"""Benchmark suite: training throughput of every model family on one TPU chip
vs the PyTorch reference executed in place on CPU (BASELINE.json north star).

Prints ONE JSON line to stdout:
  {"metric", "value", "unit", "vs_baseline",   # headline: UNet-64 bf16 b16
   "suite": [one entry per config with its own torch-CPU baseline]}

torch-CPU baselines are PINNED CONSTANTS committed in BASELINE_MEASURED.json
(keyed per config, with the measurement provenance).  A driver-invoked run
never re-measures them — re-measuring on the contended 1-vCPU host both
costs 10-20 min (it caused the r3 rc=124 timeout) and drifts 25%
run-to-run, corrupting vs_baseline.  Refresh manually with
`python bench.py --remeasure-baselines [key ...]`.

The suite JSON is written incrementally to BENCH_PARTIAL.json after every
config, and the final one-line JSON is also emitted on SIGTERM/SIGINT so a
timed-out run still yields every number measured so far.

Progress goes to stderr.  Select configs with BENCH_CONFIGS=name1,name2
(default: all).
"""

from __future__ import annotations

import json
import os
import sys
import time

SIZE = 512
N_CLASSES = 3
CHANNELS = 3
HERE = os.path.dirname(os.path.abspath(__file__))
BASELINE_CACHE = os.path.join(HERE, "BASELINE_MEASURED.json")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# --------------------------------------------------------------------------
# torch-CPU baselines (reference code run in place from /root/reference)
# --------------------------------------------------------------------------

def _torch_setup():
    import types

    sys.path.insert(0, os.path.join(HERE, "benchmarks"))
    import torchvision_stub

    torchvision_stub.install()
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import torch

    torch.set_num_threads(os.cpu_count() or 8)
    return torch


def _time_torch_steps(step_fn, steps):
    step_fn()  # warmup
    t0 = time.perf_counter()
    for _ in range(steps):
        step_fn()
    return time.perf_counter() - t0


def baseline_unet_ce(steps=2, batch=2):
    torch = _torch_setup()
    from Model import UNet as TorchUNet

    torch.manual_seed(0)
    model = TorchUNet(CHANNELS, N_CLASSES, 64, usa_cuda=False)
    model.train()
    opt = torch.optim.Adam(model.parameters(), lr=1e-3)
    ce = torch.nn.CrossEntropyLoss()
    x = torch.randn(batch, CHANNELS, SIZE, SIZE)
    y = torch.randint(0, N_CLASSES, (batch, SIZE, SIZE))

    def step():
        opt.zero_grad()
        loss = ce(model(x), y)
        loss.backward()
        opt.step()

    dt = _time_torch_steps(step, steps)
    return steps * batch / dt


def baseline_unet_mc(steps=2, batch=2):
    torch = _torch_setup()
    import loss as ref_loss
    from Model import UNet as TorchUNet

    ref_loss.CLASS_NUMBER = N_CLASSES
    torch.manual_seed(0)
    model = TorchUNet(CHANNELS, N_CLASSES, 64, usa_cuda=False)
    model.train()
    opt = torch.optim.Adam(model.parameters(), lr=1e-3)
    x = torch.randn(batch, CHANNELS, SIZE, SIZE)
    y = torch.randint(0, N_CLASSES, (batch, SIZE, SIZE)).float()

    def step():
        opt.zero_grad()
        ref_loss.calc_loss(model(x), y, loss_type="dice_bce_mc").backward()
        opt.step()

    dt = _time_torch_steps(step, steps)
    return steps * batch / dt


def baseline_multitask(steps=2, batch=2):
    torch = _torch_setup()
    from Model import UNet_multitask

    torch.manual_seed(0)
    model = UNet_multitask(CHANNELS, 1, 64, usa_cuda=False)
    model.train()
    opt = torch.optim.Adam(model.parameters(), lr=1e-3)
    mse = torch.nn.MSELoss()
    x = torch.randn(batch, CHANNELS, SIZE, SIZE)
    y1 = torch.rand(batch, 1, SIZE, SIZE)
    y2 = torch.rand(batch, 1, SIZE, SIZE)

    def step():
        opt.zero_grad()
        o1, o2 = model(x)
        (mse(torch.relu(o1), y1) + mse(torch.relu(o2), y2)).backward()
        opt.step()

    dt = _time_torch_steps(step, steps)
    return steps * batch / dt


def baseline_transunet(steps=1, batch=1):
    torch = _torch_setup()
    import loss as ref_loss
    from TransUnet.vit_seg_modeling import CONFIGS, VisionTransformer

    ref_loss.CLASS_NUMBER = N_CLASSES
    torch.manual_seed(0)
    import copy

    cfg = copy.deepcopy(CONFIGS["R50-ViT-B_16"])
    cfg.n_classes = N_CLASSES
    cfg.n_skip = 3
    cfg.patches.grid = (SIZE // 16, SIZE // 16)
    model = VisionTransformer(cfg, img_size=SIZE, num_classes=N_CLASSES)
    model.train()
    opt = torch.optim.Adam(model.parameters(), lr=1e-3)
    x = torch.randn(batch, CHANNELS, SIZE, SIZE)
    y = torch.randint(0, N_CLASSES, (batch, SIZE, SIZE)).float()

    def step():
        opt.zero_grad()
        ref_loss.calc_loss(model(x), y, loss_type="dice_bce_mc").backward()
        opt.step()

    dt = _time_torch_steps(step, steps)
    return steps * batch / dt


def baseline_cltr(steps=1, batch=1):
    torch = _torch_setup()
    # the reference matcher hardcodes .cuda() (CLTR/matcher.py:74); run the
    # code unmodified on CPU by making .cuda a no-op for this process
    torch.Tensor.cuda = lambda self, *a, **k: self
    import yaml

    from CLTR.build_model import buildCLTR
    from CLTR.misc import NestedTensor

    with open("/root/reference/CLTR/CLTRconfig.yml") as f:
        args = yaml.safe_load(f)
    torch.manual_seed(0)
    model, criterion, _ = buildCLTR(args)
    model.train()
    opt = torch.optim.Adam(model.parameters(), lr=1e-4)
    x = torch.randn(batch, 3, 256, 256)
    targets = [{"labels": torch.ones(24, dtype=torch.long),
                "points_macher": torch.rand(24, 3),
                "points": torch.rand(24, 3)} for _ in range(batch)]

    def step():
        opt.zero_grad()
        out = model(NestedTensor(x, torch.zeros(batch, 256, 256,
                                                dtype=torch.bool)))
        loss_dict = criterion(out, targets)
        sum(loss_dict[k] * criterion.weight_dict[k]
            for k in loss_dict if k in criterion.weight_dict).backward()
        opt.step()

    dt = _time_torch_steps(step, steps)
    return steps * batch / dt


def baseline_unet_infer(steps=3, batch=2):
    """Reference eval forward (test_single_mc semantics: model -> softmax ->
    argmax, no grad; ref test_mc3serousv5.py:878-887) on CPU torch."""
    torch = _torch_setup()
    from Model import UNet as TorchUNet

    torch.manual_seed(0)
    model = TorchUNet(CHANNELS, N_CLASSES, 64, usa_cuda=False)
    model.eval()
    x = torch.randn(batch, CHANNELS, SIZE, SIZE)

    def step():
        with torch.no_grad():
            torch.argmax(torch.softmax(model(x), dim=1), dim=1)

    dt = _time_torch_steps(step, steps)
    return steps * batch / dt


def baseline_transunet_infer(steps=1, batch=1):
    torch = _torch_setup()
    import copy

    from TransUnet.vit_seg_modeling import CONFIGS, VisionTransformer

    torch.manual_seed(0)
    cfg = copy.deepcopy(CONFIGS["R50-ViT-B_16"])
    cfg.n_classes = N_CLASSES
    cfg.n_skip = 3
    cfg.patches.grid = (SIZE // 16, SIZE // 16)
    model = VisionTransformer(cfg, img_size=SIZE, num_classes=N_CLASSES)
    model.eval()
    x = torch.randn(batch, CHANNELS, SIZE, SIZE)

    def step():
        with torch.no_grad():
            torch.argmax(torch.softmax(model(x), dim=1), dim=1)

    dt = _time_torch_steps(step, steps)
    return steps * batch / dt


def baseline_eval_suite(n_images=4):
    """Reference-semantics whole-eval wall-clock on CPU torch: serial
    batch-1 softmax->argmax forward (ref test_mc3serousv5.py:859-887) + the
    same Results2Class accumulator/CSV/plot suite ours runs (CSV-for-CSV
    pinned against the reference classes — tests/test_reports_vs_reference
    .py), over synthetic 512² images.  n_images is small because the torch
    CPU forward alone is ~6 s/img on this host."""
    import shutil
    import tempfile

    torch = _torch_setup()
    import numpy as np

    from Model import UNet as TorchUNet

    from unet_torch_tpu.data.synthetic import write_synthetic_dataset
    from unet_torch_tpu.eval.reports import (
        Results2Class,
        preprocess_eval,
        zoom_resize,
    )

    torch.manual_seed(0)
    model = TorchUNet(CHANNELS, N_CLASSES, 64, usa_cuda=False)
    model.eval()
    tmp = tempfile.mkdtemp(prefix="bench_eval_ref_")
    try:
        data_dir = os.path.join(tmp, "data")
        write_synthetic_dataset(data_dir, n_images=n_images, size=SIZE,
                                n_classes=N_CLASSES, seed=0)
        images = sorted(
            os.path.join(data_dir, f) for f in os.listdir(data_dir)
            if f.endswith(".png") and "_label" not in f
            and "_gt_dot" not in f)
        import cv2

        os.makedirs(os.path.join(tmp, "out"), exist_ok=True)
        t0 = time.perf_counter()
        res = Results2Class(os.path.join(tmp, "out"), True)
        for img_path in images:
            img_org = cv2.imread(img_path)  # BGR, as _load_eval_image(ch=3)
            x = preprocess_eval(img_org, (SIZE, SIZE))  # NHWC float32
            with torch.no_grad():
                out = model(torch.from_numpy(
                    np.ascontiguousarray(x.transpose(0, 3, 1, 2))))
                pred = torch.argmax(torch.softmax(out, dim=1), dim=1)[0]
            pred = np.uint8(pred.numpy())
            h, w = img_org.shape[:2]
            if (h, w) != (SIZE, SIZE):
                pred = zoom_resize(pred, h, w, order=0)
            label = cv2.imread(img_path.replace(".png", "_label_mc.png"), 0)
            gt_dot = cv2.imread(img_path.replace(".png", "_gt_dot.png"), 0)
            res.imageNames.append(os.path.basename(img_path))
            res.compare_images(img_org, label, pred, gt_dot)
        res.save()
        return n_images / (time.perf_counter() - t0)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


BASELINES = {
    "unet_ce": baseline_unet_ce,
    "unet_mc": baseline_unet_mc,
    "multitask": baseline_multitask,
    "transunet": baseline_transunet,
    "cltr": baseline_cltr,
    "unet_infer": baseline_unet_infer,
    "transunet_infer": baseline_transunet_infer,
    "eval_suite": baseline_eval_suite,
}


def _load_baseline_cache():
    if not os.path.exists(BASELINE_CACHE):
        return {}
    with open(BASELINE_CACHE) as f:
        cache = json.load(f)
    return cache.get("baselines", cache)  # provenance-wrapped or flat legacy


def get_baseline(key):
    """Pinned lookup ONLY — a missing key returns None (vs_baseline null)
    rather than triggering a 40 s/step torch-CPU measurement mid-suite.
    Refresh the pins manually with `python bench.py --remeasure-baselines`."""
    cache = _load_baseline_cache()
    if key in cache:
        return cache[key]
    log(f"  baseline {key} not pinned in BASELINE_MEASURED.json — "
        f"vs_baseline will be null (refresh with --remeasure-baselines)")
    return None


def remeasure_baselines(keys=None):
    """Manual refresh path: measure the requested torch-CPU baselines (all by
    default) and rewrite BASELINE_MEASURED.json with provenance."""
    import platform

    cache = _load_baseline_cache()
    for key in keys or BASELINES:
        log(f"measuring torch-CPU baseline {key}...")
        cache[key] = BASELINES[key]()
        log(f"  {key}: {cache[key]:.4f} img/s")
    out = {
        "baselines": cache,
        "provenance": {
            "config": {"size": SIZE, "n_classes": N_CLASSES,
                       "channels": CHANNELS},
            "host": f"{platform.machine()} {os.cpu_count()}-vcpu",
            "note": "pinned torch-CPU img/s; re-measure ONLY via "
                    "`python bench.py --remeasure-baselines` on an idle host",
        },
    }
    with open(BASELINE_CACHE, "w") as f:
        json.dump(out, f, indent=2)
    log(f"wrote {BASELINE_CACHE}")


# --------------------------------------------------------------------------
# TPU measurements
# --------------------------------------------------------------------------

def _run_tpu_steps(train_fn, state, args, steps):
    """Common warmup + timed loop; float() forces a real sync through the
    donation chain (block_until_ready does not flush the axon async queue)."""
    for _ in range(2):
        state, loss = train_fn(state, *args)
        float(loss)
    t0 = time.perf_counter()
    for _ in range(steps):
        state, loss = train_fn(state, *args)
    float(loss)
    return time.perf_counter() - t0


def _make_unet_state(batch, dtype, base=64, remat=False, n_classes=N_CLASSES,
                     loss="CE", fused_head=False):
    import numpy as np

    import jax
    import jax.numpy as jnp

    from unet_torch_tpu.models.unet import UNet
    from unet_torch_tpu.train.optim import make_optimizer
    from unet_torch_tpu.train.state import TrainState
    from unet_torch_tpu.train.steps import make_single_steps

    model = UNet(CHANNELS, n_classes, base, remat=remat, fold=not remat,
                 dtype=dtype)
    tx = make_optimizer("Adam", 1e-3, 0.0)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(batch, SIZE, SIZE, CHANNELS), jnp.float32)
    y = jnp.asarray(rng.randint(0, n_classes, (batch, SIZE, SIZE)),
                    jnp.float32)
    variables = model.init(jax.random.key(0), x[:1], train=False)
    state = TrainState.create(variables["params"],
                              variables.get("batch_stats", {}), tx)
    step, _ = make_single_steps(model, tx, loss, loss, n_classes,
                                fused_head=fused_head)
    return step, state, (x, y, 1e-3, jax.random.key(1))


def tpu_unet(batch=16, dtype_name="bfloat16", remat=False, loss="CE",
             steps=20, fused_head=True):
    import jax.numpy as jnp

    dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32
    step, state, args = _make_unet_state(batch, dtype, remat=remat, loss=loss,
                                         fused_head=fused_head)
    dt = _run_tpu_steps(step, state, args, steps)
    return steps * batch / dt


def _make_multitask_state(batch, fused_head=False):
    import numpy as np

    import jax
    import jax.numpy as jnp

    from unet_torch_tpu.models.unet import UNetMultitask
    from unet_torch_tpu.train.optim import make_optimizer
    from unet_torch_tpu.train.state import TrainState
    from unet_torch_tpu.train.steps import make_multitask_steps

    model = UNetMultitask(CHANNELS, 1, 64, fold=True, dtype=jnp.bfloat16)
    tx = make_optimizer("Adam", 1e-3, 0.0)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(batch, SIZE, SIZE, CHANNELS), jnp.float32)
    y1 = jnp.asarray(rng.rand(batch, SIZE, SIZE), jnp.float32)
    y2 = jnp.asarray(rng.rand(batch, SIZE, SIZE), jnp.float32)
    variables = model.init(jax.random.key(0), x[:1], train=False)
    state = TrainState.create(variables["params"],
                              variables.get("batch_stats", {}), tx)
    step, _ = make_multitask_steps(model, tx, "mse", 1, combine="sum",
                                   fused_head=fused_head)
    key = jax.random.key(1)
    no_ratio = jnp.asarray(False)

    def fn(state, *a):
        state, loss, _l1, _l2 = step(state, *a)
        return state, loss

    return fn, state, (x, y1, y2, 1e-3, key, no_ratio)


def tpu_multitask(batch=8, steps=10, fused_head=True):
    fn, state, args = _make_multitask_state(batch, fused_head=fused_head)
    dt = _run_tpu_steps(fn, state, args, steps)
    return steps * batch / dt


def _make_transunet_state(batch):
    import numpy as np

    import jax
    import jax.numpy as jnp

    from unet_torch_tpu.models.transunet import build_transunet
    from unet_torch_tpu.train.optim import make_optimizer
    from unet_torch_tpu.train.state import TrainState
    from unet_torch_tpu.train.steps import make_single_steps

    model = build_transunet("TransUnet", img_size=SIZE, n_channels=CHANNELS,
                            num_classes=N_CLASSES, dtype=jnp.bfloat16)
    tx = make_optimizer("Adam", 1e-3, 0.0)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(batch, SIZE, SIZE, CHANNELS), jnp.float32)
    y = jnp.asarray(rng.randint(0, N_CLASSES, (batch, SIZE, SIZE)),
                    jnp.float32)
    variables = model.init(jax.random.key(0), x[:1], train=False)
    state = TrainState.create(variables["params"],
                              variables.get("batch_stats", {}), tx)
    step, _ = make_single_steps(model, tx, "dice_bce_mc", "dice_bce_mc",
                                N_CLASSES)
    return step, state, (x, y, 1e-3, jax.random.key(1))


def tpu_transunet(batch=8, steps=10):
    # batch sweep (r3): b4 31.0, b8 47.7, b16 43.2 img/s — b8 is the knee
    # (b4 under-occupies the MXU; b16 trips memory-pressure remat).
    step, state, args = _make_transunet_state(batch)
    dt = _run_tpu_steps(step, state, args, steps)
    return steps * batch / dt


def _make_cltr_state(batch, precision="bf16"):
    import numpy as np

    import jax
    import jax.numpy as jnp

    from unet_torch_tpu.models.cltr import build_cltr
    from unet_torch_tpu.models.cltr.criterion import pad_targets
    from unet_torch_tpu.train.cltr_steps import make_cltr_fused_step
    from unet_torch_tpu.train.optim import make_optimizer
    from unet_torch_tpu.train.state import TrainState

    model, criterion, _ = build_cltr({"precision": precision})
    tx = make_optimizer("Adam", 1e-4, 0.0)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(batch, 256, 256, 3), jnp.float32)
    targets = [{"labels": np.ones(24, np.int64),
                "points_macher": rng.rand(24, 3).astype(np.float32),
                "points": rng.rand(24, 3).astype(np.float32)}
               for _ in range(batch)]
    labels, points, _mp, valid = pad_targets(targets, 32, 3)
    variables = model.init(jax.random.key(0), x[:1], train=False)
    state = TrainState.create(variables["params"],
                              variables.get("batch_stats", {}), tx)
    fused = make_cltr_fused_step(model, criterion, tx)

    def fn(state, *a):
        state, loss, _ = fused(state, *a)
        return state, loss

    return fn, state, (x, jnp.asarray(labels), jnp.asarray(points),
                       jnp.asarray(valid), 1e-4, jax.random.key(1))


def tpu_cltr(batch=16, steps=10, precision="bf16"):
    # batch sweep (r3): b4 35.7, b8 40.1, b16 35.4 img/s — b8 optimal.
    # r4: transformer compute dtype configurable; criterion/softmax/points
    # stay f32 (models/cltr/model.py).
    fn, state, args = _make_cltr_state(batch, precision)
    dt = _run_tpu_steps(fn, state, args, steps)
    return steps * batch / dt


def _median_infer_windows(predict, variables, x, batch, steps, repeats=3):
    """Median of `repeats` independent timed windows (one compile+warm call
    first).  The forward path is short enough that a single short window is
    both noisy AND dispatch-diluted through the axon tunnel (r4 read
    192-224 for UNet; honest 60-step windows read ~270) — the median of
    several longer windows makes a real ~5% regression visible."""
    import numpy as np

    np.asarray(predict(variables, x))  # compile + warm
    vals = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(steps):
            pred = predict(variables, x)
        np.asarray(pred)
        vals.append(steps * batch / (time.perf_counter() - t0))
    return float(np.median(vals))


def tpu_unet_infer(batch=16, steps=60, repeats=5):
    """Inference path (the driver target is train+infer, BASELINE.json:2):
    jit'd eval forward (train=False, running BN stats), class-map
    postprocess on device (class_argmax == the reference's softmax->argmax)
    — the same signature eval/reports.py::make_predict_fn batches tiles
    through — honest sync via device_get; median of `repeats` windows."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from unet_torch_tpu.eval.metrics import class_argmax
    from unet_torch_tpu.models.unet import UNet

    model = UNet(CHANNELS, N_CLASSES, 64, fold=True, dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(batch, SIZE, SIZE, CHANNELS), jnp.float32)
    variables = model.init(jax.random.key(0), x[:1], train=False)

    # variables as an ARGUMENT, not a closure: closed-over params are baked
    # into the serialized HLO as literals, which blows the axon tunnel's
    # remote-compile request limit on big models (HTTP 413 on TransUnet)
    @jax.jit
    def predict(variables, x):
        out = model.apply(variables, x, train=False)
        return class_argmax(out)

    return _median_infer_windows(predict, variables, x, batch, steps, repeats)


def tpu_transunet_infer(batch=16, steps=15, repeats=3):
    """TransUnet R50-ViT-B/16 512^2 eval forward throughput (median of
    `repeats` windows — see _median_infer_windows)."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from unet_torch_tpu.eval.metrics import class_argmax
    from unet_torch_tpu.models.transunet import build_transunet

    model = build_transunet("TransUnet", img_size=SIZE, n_channels=CHANNELS,
                            num_classes=N_CLASSES, dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(batch, SIZE, SIZE, CHANNELS), jnp.float32)
    variables = model.init(jax.random.key(0), x[:1], train=False)

    # params as an argument — see tpu_unet_infer (HTTP 413 otherwise)
    @jax.jit
    def predict(variables, x):
        out = model.apply(variables, x, train=False)
        return class_argmax(out)

    return _median_infer_windows(predict, variables, x, batch, steps, repeats)


def tpu_eval_suite(n_images=64, warm=16):
    """Whole-eval-suite wall-clock (VERDICT r4 #9): test_single_mc over
    n_images synthetic 512² images — cv2 decode + zoom/z-norm preprocess +
    pipelined batched device forward (eval/reports.py::_batched_eval) + host
    postprocess (contours, σ-grid matching, GAME) + the full CSV/plot
    artifact suite (ref test_mc3serousv5.py:859-900).  Guards the r6 eval
    pipelining + params-as-args work, which no bench entry covered.

    A warm pass over `warm` images runs first so the jit compile (cached
    server-side on axon) and the matplotlib font cache don't pollute the
    steady-state number."""
    import shutil
    import tempfile
    import types

    import numpy as np

    import jax
    import jax.numpy as jnp

    from unet_torch_tpu.data.synthetic import write_synthetic_dataset
    from unet_torch_tpu.eval.reports import test_single_mc
    from unet_torch_tpu.models.unet import UNet
    from unet_torch_tpu.train.optim import make_optimizer
    from unet_torch_tpu.train.state import TrainState

    model = UNet(CHANNELS, N_CLASSES, 64, fold=True, dtype=jnp.bfloat16)
    variables = model.init(
        jax.random.key(0),
        jnp.zeros((1, SIZE, SIZE, CHANNELS), jnp.float32), train=False)
    state = TrainState.create(variables["params"],
                              variables.get("batch_stats", {}),
                              make_optimizer("Adam", 1e-3, 0.0))
    trainer = types.SimpleNamespace(model=model, state=state)

    tmp = tempfile.mkdtemp(prefix="bench_eval_")
    try:
        data_dir = os.path.join(tmp, "data")
        write_synthetic_dataset(data_dir, n_images=n_images, size=SIZE,
                                n_classes=N_CLASSES, seed=0)
        images = sorted(
            os.path.join(data_dir, f) for f in os.listdir(data_dir)
            if f.endswith(".png") and "_label" not in f
            and "_gt_dot" not in f)
        assert len(images) == n_images
        test_single_mc(trainer, (SIZE, SIZE), 3, N_CLASSES,
                       images[:warm], os.path.join(tmp, "warm"))
        t0 = time.perf_counter()
        test_single_mc(trainer, (SIZE, SIZE), 3, N_CLASSES,
                       images, os.path.join(tmp, "timed"))
        return n_images / (time.perf_counter() - t0)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def tpu_topo(batch=8, steps=10, pair_downsample=1, loss_type="TopoLoss",
             depth=2):
    """Two-phase topo step (jit forward -> host PH pairing -> jit update) —
    the honest number includes the host pairing cost.

    pair_downsample=ds pools the likelihood ds x before the host pairing
    (host union-find cost and the ~8MB D2H likelihood both shrink ~ds^2 —
    the r4 topo floor was the 1-vCPU host pairing at ~360 ms/batch)."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from unet_torch_tpu.models.unet import UNet
    from unet_torch_tpu.train.optim import make_optimizer
    from unet_torch_tpu.train.state import TrainState
    from unet_torch_tpu.train.steps import make_topo_steps

    model = UNet(CHANNELS, 1, 64, fold=True, dtype=jnp.bfloat16)
    tx = make_optimizer("Adam", 1e-3, 0.0)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(batch, SIZE, SIZE, CHANNELS), jnp.float32)
    y = jnp.asarray((rng.rand(batch, SIZE, SIZE) > 0.7), jnp.float32)
    dots = jnp.asarray(rng.rand(batch, SIZE, SIZE) > 0.999, jnp.float32)
    variables = model.init(jax.random.key(0), x[:1], train=False)
    state = TrainState.create(variables["params"],
                              variables.get("batch_stats", {}), tx)
    (_w, _we), (topo_step, _te), TopoPipeline = make_topo_steps(
        model, tx, loss_type, 1, pair_downsample=pair_downsample)
    key = jax.random.key(1)
    # pipelined path (trainer default): host pairing of batch k overlaps the
    # device update of batch k-1
    pipe = TopoPipeline(depth=depth)
    for _ in range(3):  # primes the pipeline + compiles both jit signatures
        state, loss = pipe.step(state, x, y, dots, 1e-3, key)
        if loss is not None:
            float(loss)
    t0 = time.perf_counter()
    for _ in range(steps):
        state, loss = pipe.step(state, x, y, dots, 1e-3, key)
    float(loss)
    return steps * batch / (time.perf_counter() - t0)


CONFIGS = [
    # (name, tpu_fn, baseline_key)
    # Ordered so a timed-out run loses the least: headline first, then one
    # entry per model family, infer, topo, and the A/B controls last.
    # fused planes head default-on (r5 A/B: 92.8 -> 94.5 img/s)
    ("unet64_512px_bf16_b16", lambda: tpu_unet(16, "bfloat16"), "unet_ce"),
    ("unet64_512px_bf16_b16_dice_bce_mc",
     lambda: tpu_unet(16, "bfloat16", loss="dice_bce_mc", steps=10),
     "unet_mc"),
    # fused planes heads default-on (r5 A/B: 55.5 -> 57.5 img/s)
    ("multitask_unet64_512px_bf16_b8", tpu_multitask, "multitask"),
    ("transunet_r50vitb16_512px_bf16_b8", tpu_transunet, "transunet"),
    # b16 became the knee once the Pallas auction removed the matcher wall
    # (b8 126.4 / b16 127.2 / b32 117.5 img/s)
    ("cltr_2000q_256px_bf16_b16_fused", tpu_cltr, "cltr"),
    ("unet64_512px_bf16_b16_infer", tpu_unet_infer, "unet_infer"),
    ("transunet_r50vitb16_512px_bf16_b16_infer", tpu_transunet_infer,
     "transunet_infer"),
    ("unet64_512px_topo_two_phase_b8", tpu_topo, None),
    # whole-eval-suite wall-clock: decode + pipelined device forward + host
    # matching/CSV/plots (guards the r6 eval pipelining work)
    ("eval_suite_mc_64img_512px", tpu_eval_suite, "eval_suite"),
    ("unet64_512px_f32_b8", lambda: tpu_unet(8, "float32", steps=10),
     "unet_ce"),
    ("unet64_512px_bf16_b32_remat",
     lambda: tpu_unet(32, "bfloat16", remat=True, steps=10), "unet_ce"),
    # A/B control: the loss on the C-minor logits tensor
    ("unet64_512px_bf16_b16_nofusedhead",
     lambda: tpu_unet(16, "bfloat16", fused_head=False), "unet_ce"),
    # A/B control (r5: fused 93.2 vs C-minor 91.4 img/s)
    ("unet64_512px_bf16_b16_dice_bce_mc_nofusedhead",
     lambda: tpu_unet(16, "bfloat16", loss="dice_bce_mc", steps=10,
                      fused_head=False),
     "unet_mc"),
    # A/B control: both (B,512,512,1) head tensors materialised
    ("multitask_unet64_512px_bf16_b8_nofusedhead",
     lambda: tpu_multitask(fused_head=False), "multitask"),
]


def _axon_reachable(timeout_s: int = 150) -> bool:
    """Probe the tunneled backend in a bounded subprocess.

    An axon outage makes `jax.devices()` block ~4 min before raising
    UNAVAILABLE (CLAUDE.md); probing in-process would also poison this
    process's cached backend.  A subprocess with a hard timeout gives a
    clean yes/no."""
    import subprocess

    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; assert jax.devices(); print('up')"],
            capture_output=True, timeout=timeout_s)
        return r.returncode == 0 and b"up" in r.stdout
    except subprocess.TimeoutExpired:
        return False


def _wait_for_axon() -> bool:
    """Retry the probe for up to BENCH_WAIT_S seconds (default 30 min).

    The tunnel has multi-hour outages; the driver runs this script once at
    round end, so a bounded wait beats either hanging forever or instantly
    recording an all-error suite."""
    budget = float(os.environ.get("BENCH_WAIT_S", "1800"))
    t0 = time.monotonic()
    while True:
        if _axon_reachable():
            return True
        waited = time.monotonic() - t0
        if waited >= budget:
            return False
        log(f"axon tunnel unreachable ({waited:.0f}s elapsed); "
            f"retrying in 120s (budget {budget:.0f}s)")
        time.sleep(min(120.0, budget - waited))


PARTIAL_PATH = os.path.join(HERE, "BENCH_PARTIAL.json")
_emitted = False


def _assemble(suite):
    headline = next((s for s in suite
                     if s.get("metric") == "unet64_512px_bf16_b16"), None)
    if headline is None:
        headline = next((s for s in suite if "value" in s), {})
    return {
        "metric": "unet64_512px_bf16_train_images_per_sec_per_chip",
        "value": headline.get("value") if headline else None,
        "unit": "images/sec",
        "vs_baseline": headline.get("vs_baseline") if headline else None,
        "suite": suite,
    }


def _emit_final(suite, note=None):
    """Print the ONE JSON line exactly once — also reachable from the
    SIGTERM handler so `timeout`-killed runs still deliver their numbers."""
    global _emitted
    if _emitted:
        return
    _emitted = True
    out = _assemble(suite)
    if note:
        out["note"] = note
    print(json.dumps(out), flush=True)


def _install_timeout_guard(suite):
    import signal

    def handler(signum, frame):
        log(f"signal {signum}: emitting partial suite "
            f"({len(suite)} entries measured)")
        _emit_final(suite, note=f"partial: killed by signal {signum}")
        os._exit(0)

    for sig in (signal.SIGTERM, signal.SIGINT, signal.SIGHUP):
        signal.signal(sig, handler)


def main():
    if "--remeasure-baselines" in sys.argv:
        keys = [a for a in sys.argv[2:] if not a.startswith("-")] or None
        remeasure_baselines(keys)
        return
    only = os.environ.get("BENCH_CONFIGS")
    wanted = set(only.split(",")) if only else None
    suite = []
    _install_timeout_guard(suite)
    if not _wait_for_axon():
        log("axon tunnel unavailable for the whole BENCH_WAIT_S budget")
        out = _assemble(suite)
        out["error"] = ("axon TPU tunnel unavailable (probe timed out for "
                        "the whole BENCH_WAIT_S budget); no measurements "
                        "taken")
        global _emitted
        _emitted = True
        print(json.dumps(out), flush=True)
        return
    for name, fn, baseline_key in CONFIGS:
        if wanted and name not in wanted:
            continue
        log(f"bench {name} ...")
        try:
            ips = fn()
        except Exception as e:  # record, keep the suite running
            log(f"  FAILED: {e!r}")
            suite.append({"metric": name, "error": str(e)})
            continue
        baseline = get_baseline(baseline_key) if baseline_key else None
        entry = {
            "metric": name,
            "value": round(ips, 3),
            "unit": "images/sec/chip",
            "vs_baseline": round(ips / baseline, 3) if baseline else None,
            "torch_cpu_img_per_sec": round(baseline, 4) if baseline else None,
        }
        log(f"  {ips:.2f} img/s  (vs baseline: {entry['vs_baseline']})")
        suite.append(entry)
        # checkpoint after EVERY config: a killed run keeps its numbers
        with open(PARTIAL_PATH, "w") as f:
            json.dump(_assemble(suite), f, indent=2)
    _emit_final(suite)


if __name__ == "__main__":
    main()
