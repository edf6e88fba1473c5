"""CLTR through the full train CLI (config -> datasets -> fused loop)."""

import os
import shutil

import numpy as np

from unet_torch_tpu.data.synthetic import write_synthetic_dataset


def test_cltr_cli_e2e(tmp_path):
    from unet_torch_tpu.cli.config import Config
    from unet_torch_tpu.cli.train_cli import run_training

    gen = str(tmp_path / "gen")
    write_synthetic_dataset(gen, n_images=2, size=64, n_classes=3, seed=3)
    img_dir = str(tmp_path / "imgs")
    tsv_dir = str(tmp_path / "tsv")
    os.makedirs(img_dir)
    os.makedirs(tsv_dir)
    for i in range(2):
        shutil.copy(f"{gen}/img{i}.png", f"{img_dir}/img{i}.png")
        shutil.copy(f"{gen}/img{i}.tsv", f"{tsv_dir}/img{i}.tsv")

    cfg = Config.from_dict({
        "model_config": {
            "initial_filter_size": [8], "kernel": [3], "drop_out_rate": [0.1],
            "input_size": [64, 64], "channel": 3, "num_class": 2,
            "model_type": "CLTR", "dropout": False, "anydepth": False,
        },
        "train_config": {
            "loss": "cltr", "accuracy": "cltr", "optimizer": "Adam",
            "lr_rate": [0.0001], "adaptive_lr": False, "weight_decay": [0.0],
            "batch_size": [2], "epochs": 1, "early_stop": 20,
            "num_workers": 0, "seed": [2], "use_cuda": False,
        },
        "dataset_config": {
            "train_path": [img_dir], "val_path": [img_dir], "test_path": [],
            "dot_annotation_path": tsv_dir + "/",
            "augmentation": False, "save_dir": str(tmp_path / "run"),
            "class_names": [],
        },
        "resume": {"flag": False, "path": "", "epoch": 1},
        # tiny CLTR for test speed (reference reads CLTR/CLTRconfig.yml)
        "cltr_config": {
            "num_queries": 8, "hidden_dim": 32, "nheads": 4,
            "enc_layers": 1, "dec_layers": 2, "dim_feedforward": 64,
            "dropout": 0.0, "crop_size": 32, "num_knn": 4,
            "dot_shape": [64, 64],
        },
    })
    trainers, _ = run_training(cfg)
    tr = trainers[2]
    assert len(tr.train_loss_list) == 1
    assert np.isfinite(tr.train_loss_list).all()
    assert os.path.exists(os.path.join(str(tmp_path / "run"), "run_seed2",
                                       "models", "last_epoch.pt"))