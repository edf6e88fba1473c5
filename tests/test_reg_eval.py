"""Regression eval suites: CSV column parity + e2e through the CLI."""

import os

import numpy as np
import pytest

from unet_torch_tpu.data.synthetic import write_synthetic_dataset

EXPECTED_DATA_COLUMNS = [
    "sample name", "cell count Gold", "cell count Pred", "cell abs diff",
    "cell accuracy", "cell accuracy RD", "cell accuracy RD Perantage",
    "immune count Gold", "immune count Pred", "immune abs diff",
    "immune accuracy", "immune accuracy RD", "immune accuracy RD Perantage",
    "ratio Gold", "ratio Pred", "ratio abs diff", "ratio accuracy",
    "ratio accuracy RD", "ratio accuracy RD Perantage",
]


def test_mt_reg_eval_artifacts(tmp_path):
    import pandas as pd

    from unet_torch_tpu.cli.config import Config
    from unet_torch_tpu.cli.train_cli import run_training

    root = tmp_path / "d"
    for split in ("train", "val", "test"):
        write_synthetic_dataset(str(root / split), n_images=2, size=64,
                                n_classes=3, seed=4)
    cfg = Config.from_dict({
        "model_config": {
            "initial_filter_size": [4], "kernel": [3], "drop_out_rate": [0.2],
            "input_size": [64, 64], "channel": 3, "num_class": 1,
            "model_type": "multi_task_reg", "dropout": False,
            "anydepth": False,
        },
        "train_config": {
            "loss": "mse", "accuracy": "mse", "optimizer": "Adam",
            "lr_rate": [0.001], "adaptive_lr": False, "weight_decay": [0.0],
            "batch_size": [2], "epochs": 1, "early_stop": 25,
            "num_workers": 0, "seed": [4], "use_cuda": False,
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
    _trainers, results = run_training(cfg)
    out = os.path.join(str(tmp_path / "run"), "run_seed4")
    # exact reference CSV suite (test_mc3serousv5.py:1138-1263)
    df = pd.read_csv(os.path.join(out, "resultsData.csv"))
    assert list(df.columns) == EXPECTED_DATA_COLUMNS
    mean = pd.read_csv(os.path.join(out, "resultsDataMean.csv"))
    assert "Cell MAE" in mean.columns and "Ratio pearson r" in mean.columns
    grid = pd.read_csv(os.path.join(out, "resultsGridCount.csv"),
                       index_col=0)
    assert list(grid.index) == ["G(1)", "G(2)", "G(3)"]
    match = pd.read_csv(os.path.join(out, "resultsMatching.csv"),
                        index_col=0)
    assert list(match.index) == ["sigma(5)", "sigma(20)", "sigma(5)_09",
                                 "sigma(20)_09"]
    for png in ("resultsData_immune.png", "resultsData_other.png"):
        assert os.path.exists(os.path.join(out, png))
    assert "Cell MAE" in results[4]
    # <25-count filter artifacts (ref test_reg3serousv5mt.py:553-624)
    filt = pd.read_csv(os.path.join(out, "resultsDataFiltered.csv"))
    assert list(filt.columns) == EXPECTED_DATA_COLUMNS
    mfilt = pd.read_csv(os.path.join(out, "resultsDataMeanFiltered.csv"))
    assert list(mfilt.columns) == [
        "Cell Absolute Difference", "Cell Accuracy", "Cell Accuracy RD",
        "Cell Accuracy RPD", "Immune Absolute Difference", "Immune Accuracy",
        "Immune Accuracy RD", "Immune Accuracy RPD",
        "Ratio Absolute Difference", "Ratio Accuracy", "Ratio Accuracy RD",
        "Ratio Accuracy RPD"]


def test_filtered_csv_drops_below_25(tmp_path):
    """The filter drops rows where immune GT *or* immune Pred < 25
    (ref test_reg3serousv5mt.py:553-556)."""
    import pandas as pd

    from unet_torch_tpu.eval.reports import TwoChannelRegResults

    res = TwoChannelRegResults(str(tmp_path))

    def dots(n):
        d = np.zeros((64, 64))
        d.flat[:n] = 1.0
        return d

    # (gt_immune, pred_immune): keep only the (30, 40) row
    for k, (gi, pi) in enumerate([(30, 40), (10, 40), (30, 5)]):
        res.sample_list.append(f"s{k}.png")
        res.add(pred_other=dots(50), pred_immune=dots(pi),
                gt_dot_other=dots(50), gt_dot_immune=dots(gi))
    res.save()
    filt = pd.read_csv(tmp_path / "resultsDataFiltered.csv")
    assert list(filt["sample name"]) == ["s0.png"]
    assert filt["immune count Gold"][0] == 30.0
    full = pd.read_csv(tmp_path / "resultsData.csv")
    assert len(full) == 3
    mfilt = pd.read_csv(tmp_path / "resultsDataMeanFiltered.csv")
    assert mfilt["Immune Absolute Difference"][0] == 10.0


def test_tsv_gt_dots(tmp_path):
    from unet_torch_tpu.eval.reports import create_label_coordinates_2class

    tsv = tmp_path / "a.tsv"
    tsv.write_text("x\ty\tclass\n10\t20\tTumor\n30\t40\tImmune cells\n"
                   "50\t60\tStroma\n")
    other, immune = create_label_coordinates_2class(str(tsv), (64, 64))
    assert other.sum() == 2 and immune.sum() == 1
    assert immune[19, 14] == 1  # (40/2-1, 30/2-1)


def test_results2class_csv_column_spellings(tmp_path):
    """results.csv uses 'Ratio Accuracy MRE max'/'Ratio Accuracy RPD' while
    resultsC.csv uses 'Ratio MRE max'/'Ratio RPD' — the reference writes the
    same row under two spellings (ref test_mc3serousv5.py:736-737, 752-753)."""
    import pandas as pd

    from unet_torch_tpu.eval.reports import Results2Class

    res = Results2Class(str(tmp_path), save_image=False)
    rng = np.random.default_rng(0)
    for k in range(2):
        res.imageNames.append(f"im{k}.png")
        gt_dot = np.zeros((64, 64), np.uint8)
        gt_dot[10 + k, 10] = 1
        gt_dot[30, 30 + k] = 2
        pred = rng.integers(0, 3, (64, 64)).astype(np.uint8)
        res.compare_images(np.zeros((64, 64), np.uint8), pred.copy(),
                           pred, gt_dot)
    res.save()
    first = pd.read_csv(tmp_path / "results.csv")
    second = pd.read_csv(tmp_path / "resultsC.csv")
    tail = ["Ratio MAE", "Ratio MRE", "Ratio Accuracy MRE max",
            "Ratio Accuracy RPD", "Ratio pearson r"]
    assert list(first.columns)[-5:] == tail
    assert list(second.columns)[-5:] == ["Ratio MAE", "Ratio MRE",
                                         "Ratio MRE max", "Ratio RPD",
                                         "Ratio pearson r"]
    assert first["Ratio Accuracy RPD"][0] == second["Ratio RPD"][0]
