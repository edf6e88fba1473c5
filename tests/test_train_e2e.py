"""End-to-end: synthetic dataset -> CLI train -> checkpoints/logs/eval CSVs.

This is the stage-2 "minimum end-to-end slice" proof (SURVEY.md §7): one model
trains through the jit'd step, checkpoints with the reference naming contract,
and the post-train eval emits the reference's CSV artifacts.
"""

import os

import numpy as np
import pytest
import yaml

from unet_torch_tpu.data.synthetic import write_synthetic_dataset


@pytest.fixture(scope="module")
def dataset_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth")
    for split in ("train", "val", "test"):
        write_synthetic_dataset(str(root / split), n_images=3, size=64,
                                n_classes=3, seed=hash(split) % 1000)
    return root


def _base_cfg(root, save_dir, model_type="single", loss="dice_bce_mc",
              epochs=2):
    return {
        "model_config": {
            "model": "UNet1",
            "initial_filter_size": [8],
            "kernel": [3],
            "drop_out_rate": [0.2],
            "input_size": [64, 64],
            "channel": 3,
            "num_class": 3,
            "model_type": model_type,
            "dropout": False,
            "anydepth": False,
        },
        "train_config": {
            "loss": loss,
            "accuracy": loss,
            "optimizer": "Adam",
            "lr_rate": [0.001],
            "adaptive_lr": True,
            "weight_decay": [0.0001],
            "batch_size": [2],
            "epochs": epochs,
            "early_stop": 25,
            "num_workers": 0,
            "seed": [7],
            "use_cuda": False,
        },
        "dataset_config": {
            "train_path": [str(root / "train")],
            "val_path": [str(root / "val")],
            "test_path": [str(root / "test")],
            "augmentation": True,
            "save_dir": save_dir,
            "class_names": ["background", "other", "immune"],
        },
        "resume": {"flag": False, "path": "", "epoch": 1},
    }


def test_train_single_e2e(dataset_root, tmp_path):
    from unet_torch_tpu.cli.config import Config
    from unet_torch_tpu.cli.train_cli import run_training

    save_dir = str(tmp_path / "run")
    cfg = Config.from_dict(_base_cfg(dataset_root, save_dir))
    trainers, results = run_training(cfg)

    seed_dir = os.path.join(save_dir, "run_seed7")
    # reference artifact contract
    assert os.path.exists(os.path.join(save_dir, "config.json"))
    assert os.path.exists(os.path.join(seed_dir, "logs.txt"))
    assert os.path.exists(os.path.join(seed_dir, "models", "best.pt"))
    assert os.path.exists(os.path.join(seed_dir, "models", "last_epoch.pt"))
    assert os.path.exists(os.path.join(seed_dir, "total.png"))
    # post-train eval CSVs
    for csv in ("resultsData.csv", "resultsMatching.csv",
                "resultsGridCount.csv", "results.csv"):
        assert os.path.exists(os.path.join(seed_dir, csv)), csv
    # cross-seed aggregation
    assert os.path.exists(os.path.join(save_dir, "results.csv"))
    assert 7 in results and "Cell MAE" in results[7]

    tr = trainers[7]
    assert len(tr.train_loss_list) == 2
    assert np.isfinite(tr.train_loss_list).all()


def test_train_loss_decreases(dataset_root, tmp_path):
    """Training on one batch repeatedly must reduce the loss (optimizer sanity)."""
    import jax.numpy as jnp

    from unet_torch_tpu.core.mesh import make_mesh
    from unet_torch_tpu.core.rng import RngStream
    from unet_torch_tpu.models.unet import UNet
    from unet_torch_tpu.train.optim import make_optimizer
    from unet_torch_tpu.train.state import TrainState
    from unet_torch_tpu.train.steps import make_single_steps
    import jax

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 32, 32, 3), jnp.float32)
    y = jnp.asarray(rng.randint(0, 3, (2, 32, 32)), jnp.float32)

    model = UNet(3, 3, base=4)
    tx = make_optimizer("Adam", 1e-3, 0.0)
    variables = model.init(jax.random.key(0), x, train=False)
    state = TrainState.create(variables["params"],
                              variables.get("batch_stats", {}), tx)
    train_step, eval_step = make_single_steps(model, tx, "dice_bce_mc",
                                              "dice_bce_mc", 3)
    stream = RngStream(jax.random.key(1))
    losses = []
    for _ in range(10):
        state, loss = train_step(state, x, y, 1e-3, stream.next())
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_resume_from_checkpoint(dataset_root, tmp_path):
    from unet_torch_tpu.cli.config import Config
    from unet_torch_tpu.cli.train_cli import run_training

    save_dir = str(tmp_path / "run1")
    raw = _base_cfg(dataset_root, save_dir, epochs=1)
    raw["dataset_config"]["test_path"] = []
    cfg = Config.from_dict(raw)
    run_training(cfg)
    ckpt_path = os.path.join(save_dir, "run1_seed7", "models",
                             "last_epoch.pt")
    assert os.path.exists(ckpt_path)

    raw2 = _base_cfg(dataset_root, str(tmp_path / "run2"), epochs=3)
    raw2["dataset_config"]["test_path"] = []
    raw2["resume"] = {"flag": True, "path": ckpt_path, "epoch": 2}
    trainers, _ = run_training(Config.from_dict(raw2))
    tr = trainers[7]
    # started at epoch 2 of 3 -> two epochs ran
    assert len(tr.train_loss_list) == 2


def test_train_fused_head_e2e(dataset_root, tmp_path):
    """`model_config.fused_head: true` trains through the CLI: the jit'd step
    takes the folded class-planes path (64² is fold-eligible) and the run
    still produces finite, decreasing-ish losses and the checkpoint
    artifacts.  Step-level value equivalence with the standard path is
    test_folded.py's job."""
    from unet_torch_tpu.cli.config import Config
    from unet_torch_tpu.cli.train_cli import run_training

    save_dir = str(tmp_path / "run_fh")
    raw = _base_cfg(dataset_root, save_dir, epochs=1)
    raw["model_config"]["fused_head"] = True
    raw["dataset_config"]["test_path"] = []  # skip eval suite: train only
    trainers, _ = run_training(Config.from_dict(raw))
    tr = trainers[7]
    assert tr.fused_head is True
    assert np.isfinite(tr.train_loss_list).all()
    assert os.path.exists(os.path.join(save_dir, "run_fh_seed7", "models",
                                       "last_epoch.pt"))
