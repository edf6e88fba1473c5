"""CLTR train loop end-to-end on a tiny model + synthetic point data."""

import numpy as np
import pytest

from unet_torch_tpu.core.mesh import make_mesh
from unet_torch_tpu.data.datasets import DataPointReg
from unet_torch_tpu.data.loader import NumpyLoader
from unet_torch_tpu.data.synthetic import write_synthetic_dataset
from unet_torch_tpu.models.cltr import (
    ConditionalDETR,
    SetCriterion,
    build_weight_dict,
)
from unet_torch_tpu.train.cltr_loop import cltr_collate, cltr_train_loop
from unet_torch_tpu.train.trainer import Trainer


def test_cltr_loop_e2e(tmp_path):
    import jax

    import shutil

    gen = str(tmp_path / "gen")
    write_synthetic_dataset(gen, n_images=2, size=64, n_classes=3, seed=0)
    # CLTR data dirs hold only images + tsv (the reference's DataPointReg
    # excludes just '_label'); copy the images to a clean dir
    root = str(tmp_path / "data")
    import os

    os.makedirs(root)
    for i in range(2):
        shutil.copy(f"{gen}/img{i}.png", f"{root}/img{i}.png")
    tsv_files = {f"img{i}": f"{gen}/img{i}.tsv" for i in range(2)}

    train_ds = DataPointReg([root], tsv_files, ch=3, augmentation=False,
                            crop_size=32, num_knn=4, train=True,
                            dot_shape=(64, 64))
    val_ds = DataPointReg([root], tsv_files, ch=3, augmentation=False,
                          crop_size=32, num_knn=4, train=False,
                          dot_shape=(64, 64))

    model = ConditionalDETR(num_queries=8, hidden_dim=32, nheads=4,
                            enc_layers=1, dec_layers=2, dim_feedforward=64,
                            dropout_rate=0.0)
    mesh = make_mesh(n_data=1, devices=jax.devices()[:1])
    loaders = {
        "train": NumpyLoader(train_ds, 2, shuffle=True,
                             collate_fn=cltr_collate),
        "val": NumpyLoader(val_ds, 1, shuffle=False,
                           collate_fn=lambda items: items[0]),
    }
    trainer = Trainer(model, "CLTR", mesh, str(tmp_path / "out"), loaders,
                      2, "Adam", 1e-4, 0.0, patience=10, num_epochs=2,
                      loss_function="cltr", accuracy_metric="cltr",
                      num_classes=2)
    trainer.criterion = SetCriterion(
        num_classes=2, weight_dict=build_weight_dict(dec_layers=2))
    cltr_train_loop(trainer)

    assert len(trainer.train_loss_list) == 2
    assert np.isfinite(trainer.train_loss_list).all()
    assert (tmp_path / "out" / "models" / "last_epoch.pt").exists()


@pytest.mark.slow  # dp-mesh CLTR is covered every round by the driver's
# dryrun_multichip cltr config, which since r5 also asserts |dloss|<1e-5
def test_cltr_loop_dp_mesh(tmp_path):
    """Production-loop mesh placement: on a multi-device dp mesh the loop
    replicates the created state and routes batches through shard_batch
    (non-divisible patch-list batches replicate — still one global batch)."""
    import os
    import shutil

    import jax

    gen = str(tmp_path / "gen")
    write_synthetic_dataset(gen, n_images=2, size=64, n_classes=3, seed=1)
    root = str(tmp_path / "data")
    os.makedirs(root)
    for i in range(2):
        shutil.copy(f"{gen}/img{i}.png", f"{root}/img{i}.png")
    tsv_files = {f"img{i}": f"{gen}/img{i}.tsv" for i in range(2)}

    train_ds = DataPointReg([root], tsv_files, ch=3, augmentation=False,
                            crop_size=32, num_knn=4, train=True,
                            dot_shape=(64, 64))
    val_ds = DataPointReg([root], tsv_files, ch=3, augmentation=False,
                          crop_size=32, num_knn=4, train=False,
                          dot_shape=(64, 64))
    model = ConditionalDETR(num_queries=8, hidden_dim=32, nheads=4,
                            enc_layers=1, dec_layers=1, dim_feedforward=32,
                            dropout_rate=0.0)
    mesh = make_mesh(n_data=len(jax.devices()))
    loaders = {
        "train": NumpyLoader(train_ds, 2, shuffle=True,
                             collate_fn=cltr_collate),
        "val": NumpyLoader(val_ds, 1, shuffle=False,
                           collate_fn=lambda items: items[0]),
    }
    trainer = Trainer(model, "CLTR", mesh, str(tmp_path / "out"), loaders,
                      2, "Adam", 1e-4, 0.0, patience=10, num_epochs=1,
                      loss_function="cltr", accuracy_metric="cltr",
                      num_classes=2)
    trainer.criterion = SetCriterion(
        num_classes=2, weight_dict=build_weight_dict(dec_layers=1))
    cltr_train_loop(trainer)

    assert len(trainer.train_loss_list) == 1
    assert np.isfinite(trainer.train_loss_list).all()
    # the state was actually placed on the mesh
    leaf = jax.tree_util.tree_leaves(trainer.state.params)[0]
    assert len(leaf.sharding.device_set) == len(jax.devices())
