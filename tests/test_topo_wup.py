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


def test_topo_warm_step_fused_head_equivalence():
    """make_topo_steps(fused_head=True) fuses only the warm-up dice_bce step
    (folded planes); one SGD warm step matches the standard path."""
    import jax
    import jax.numpy as jnp
    import jax.tree_util as jtu
    import numpy as np

    from unet_torch_tpu.models.unet import UNet
    from unet_torch_tpu.train.optim import make_optimizer
    from unet_torch_tpu.train.state import TrainState
    from unet_torch_tpu.train.steps import make_topo_steps

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 32, 32, 3), jnp.float32)
    y = jnp.asarray(rng.randint(0, 2, (2, 32, 32)), jnp.float32)
    dot = jnp.asarray(rng.randint(0, 2, (2, 32, 32)), jnp.float32)
    m = UNet(3, 1, 8, fold=True)
    tx = make_optimizer("SGD", 1e-3, 0.0)
    v = m.init(jax.random.key(0), x, train=False)

    def run(fused):
        vv = jax.tree.map(jnp.array, v)
        st = TrainState.create(vv["params"], vv.get("batch_stats", {}), tx)
        (warm, _), _, _ = make_topo_steps(m, tx, "TopoLoss", 1,
                                          fused_head=fused)
        st, loss = warm(st, x, y, dot, 1e-3, jax.random.key(1))
        return float(loss), st

    l0, st0 = run(False)
    l1, st1 = run(True)
    np.testing.assert_allclose(l0, l1, rtol=1e-5)
    for (_, a), (_, b) in zip(jtu.tree_leaves_with_path(st0.params),
                              jtu.tree_leaves_with_path(st1.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=5e-6)
