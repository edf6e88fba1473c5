"""Eval CLI + box_ops + spatial sharding tests."""

import os

import numpy as np
import pytest

from unet_torch_tpu.data.synthetic import write_synthetic_dataset


def test_box_ops_roundtrip_and_iou():
    import jax.numpy as jnp

    from unet_torch_tpu.models.cltr.box_ops import (
        box_cxcywh_to_xyxy,
        box_iou,
        box_xyxy_to_cxcywh,
        generalized_box_iou,
        masks_to_boxes,
    )

    boxes = jnp.asarray([[0.5, 0.5, 0.2, 0.4], [0.3, 0.7, 0.1, 0.1]])
    xyxy = box_cxcywh_to_xyxy(boxes)
    np.testing.assert_allclose(np.asarray(box_xyxy_to_cxcywh(xyxy)),
                               np.asarray(boxes), atol=1e-6)
    same = jnp.asarray([[0., 0., 1., 1.]])
    iou, _ = box_iou(same, same)
    assert float(iou[0, 0]) == 1.0
    giou = generalized_box_iou(same, jnp.asarray([[1., 1., 2., 2.]]))
    assert float(giou[0, 0]) < 0  # disjoint boxes have negative GIoU

    masks = np.zeros((1, 8, 8), bool)
    masks[0, 2:5, 3:7] = True
    np.testing.assert_array_equal(masks_to_boxes(masks)[0], [3, 2, 6, 4])


def test_spatial_sharding_matches_replicated(mesh):
    """Height-sharded conv forward == replicated forward (XLA halo exchange)."""
    import jax
    import jax.numpy as jnp

    from unet_torch_tpu.models.unet import UNet
    from unet_torch_tpu.parallel.spatial import shard_spatial, spatial_sharding

    model = UNet(1, 2, base=4)
    rng = np.random.RandomState(0)
    x = np.asarray(rng.randn(2, 64, 64, 1), np.float32)
    variables = model.init(jax.random.key(0), jnp.asarray(x), train=False)

    @jax.jit
    def fwd(v, xx):
        return model.apply(v, xx, train=False)

    ref = np.asarray(fwd(variables, jnp.asarray(x)))
    # mesh is (data=8, model=1) in conftest; build a spatial mesh (2, 4)
    from unet_torch_tpu.core.mesh import make_mesh

    smesh = make_mesh(n_data=2, n_model=4)
    xs, = shard_spatial(smesh, (jnp.asarray(x),))
    assert xs.sharding == spatial_sharding(smesh)
    out = np.asarray(fwd(variables, xs))
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_eval_cli_end_to_end(tmp_path):
    """Train 1 epoch via the train CLI, then evaluate the checkpoint via the
    eval CLI — the full reference workflow without hardcoded paths."""
    from unet_torch_tpu.cli.config import Config
    from unet_torch_tpu.cli.test_cli import run_eval
    from unet_torch_tpu.cli.train_cli import run_training

    root = tmp_path / "d"
    for split in ("train", "val", "test"):
        write_synthetic_dataset(str(root / split), n_images=2, size=64,
                                n_classes=3, seed=2)
    raw = {
        "model_config": {
            "initial_filter_size": [4], "kernel": [3], "drop_out_rate": [0.2],
            "input_size": [64, 64], "channel": 3, "num_class": 3,
            "model_type": "single", "dropout": False, "anydepth": False,
        },
        "train_config": {
            "loss": "dice_bce_mc", "accuracy": "dice_bce_mc",
            "optimizer": "Adam", "lr_rate": [0.001], "adaptive_lr": False,
            "weight_decay": [0.0], "batch_size": [2], "epochs": 1,
            "early_stop": 25, "num_workers": 0, "seed": [9],
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
    }
    cfg = Config.from_dict(raw)
    run_training(cfg)
    ckpt_path = os.path.join(str(tmp_path / "run"), "run_seed9", "models",
                             "best.pt")
    assert os.path.exists(ckpt_path)

    results = run_eval(cfg, ckpt_path, mode="auto",
                       out_dir=str(tmp_path / "eval_out"))
    assert "Cell MAE" in results
    assert os.path.exists(tmp_path / "eval_out" / "resultsData.csv")
