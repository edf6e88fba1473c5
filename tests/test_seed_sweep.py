"""Multi-seed sweep: per-seed dirs + cross-seed results.csv rows
(train.py:182-188, 371-385 parity)."""

import os

import pytest

from unet_torch_tpu.data.synthetic import write_synthetic_dataset


def test_two_seed_sweep(tmp_path):
    import pandas as pd

    from unet_torch_tpu.cli.config import Config
    from unet_torch_tpu.cli.train_cli import run_training

    root = tmp_path / "d"
    for split in ("train", "val", "test"):
        write_synthetic_dataset(str(root / split), n_images=2, size=48,
                                n_classes=3, seed=6)
    cfg = Config.from_dict({
        "model_config": {
            "initial_filter_size": [4], "kernel": [3], "drop_out_rate": [0.2],
            "input_size": [48, 48], "channel": 3, "num_class": 3,
            "model_type": "single", "dropout": False, "anydepth": False,
        },
        "train_config": {
            "loss": "dice_bce_mc", "accuracy": "dice_bce_mc",
            "optimizer": "Adam", "lr_rate": [0.001], "adaptive_lr": False,
            "weight_decay": [0.0], "batch_size": [2], "epochs": 1,
            "early_stop": 25, "num_workers": 0, "seed": [11, 15],
            "use_cuda": False,
        },
        "dataset_config": {
            "train_path": [str(root / "train")],
            "val_path": [str(root / "val")],
            "test_path": [str(root / "test")],
            "augmentation": False, "save_dir": str(tmp_path / "run"),
            "class_names": [],
        },
        "resume": {"flag": False, "path": "", "epoch": 1},
    })
    trainers, results = run_training(cfg)
    assert set(trainers) == {11, 15}
    for seed in (11, 15):
        assert os.path.isdir(os.path.join(str(tmp_path / "run"),
                                          f"run_seed{seed}"))
    df = pd.read_csv(os.path.join(str(tmp_path / "run"), "results.csv"),
                     index_col=0)
    assert sorted(df.index.tolist()) == [11, 15]
