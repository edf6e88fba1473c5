"""Topo warm-up trainer (singe_train_wup parity) end-to-end via the CLI."""

import numpy as np
import pytest

from unet_torch_tpu.data.synthetic import write_synthetic_dataset


def test_topo_wup_e2e(tmp_path):
    from unet_torch_tpu.cli.config import Config
    from unet_torch_tpu.cli.train_cli import run_training

    root = tmp_path / "d"
    for split in ("train", "val"):
        write_synthetic_dataset(str(root / split), n_images=2, size=48,
                                n_classes=2, seed=1)
    cfg = Config.from_dict({
        "model_config": {
            "initial_filter_size": [4], "kernel": [3], "drop_out_rate": [0.2],
            "input_size": [48, 48], "channel": 3, "num_class": 1,
            "model_type": "single", "dropout": False, "anydepth": False,
        },
        "train_config": {
            # 7 epochs: 5 warm-up (dice_bce) + 2 topological (Trainer.py:344)
            "loss": "TopoLoss", "accuracy": "TopoLoss", "optimizer": "Adam",
            "lr_rate": [0.001], "adaptive_lr": False, "weight_decay": [0.0],
            "batch_size": [2], "epochs": 7, "early_stop": 50,
            "num_workers": 0, "seed": [5], "use_cuda": False,
        },
        "dataset_config": {
            "train_path": [str(root / "train")],
            "val_path": [str(root / "val")],
            "test_path": [], "augmentation": False,
            "save_dir": str(tmp_path / "run"), "class_names": [],
        },
        "resume": {"flag": False, "path": "", "epoch": 1},
    })
    trainers, _ = run_training(cfg)
    tr = trainers[5]
    assert len(tr.train_loss_list) == 7
    assert np.isfinite(tr.train_loss_list).all()
    # MRAccuracy val scores recorded each epoch (Trainer.py:382)
    assert len(tr.val_score_list) == 7
