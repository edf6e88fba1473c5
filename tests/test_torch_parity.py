"""Pixel-level parity: the reference's torch UNet vs ours with TRANSPLANTED
weights — same input, same output (BASELINE.json "checkpoint outputs at
pixel-level fidelity").

The torch model is the reference's own Model.py executed from /root/reference.
"""

import sys
import types

import numpy as np
import pytest


@pytest.fixture(scope="module")
def torch_unet():
    import torch

    sys.modules.setdefault("torchvision", types.ModuleType("torchvision"))
    sys.path.insert(0, "/root/reference")
    from Model import UNet as TorchUNet

    torch.manual_seed(0)
    model = TorchUNet(3, 3, 8, usa_cuda=False)
    model.eval()
    return model


def _torch_state_to_flax(model, params, batch_stats):
    """Copy the torch UNet state_dict into our flax trees (the framework's
    importer, ckpt/torch_import.py)."""
    from unet_torch_tpu.ckpt.torch_import import load_torch_unet

    return load_torch_unet(model.state_dict(), params, batch_stats)


def test_unet_forward_matches_torch(torch_unet):
    import torch

    import jax
    import jax.numpy as jnp

    from unet_torch_tpu.models.unet import UNet

    model = UNet(3, 3, base=8)
    x_np = np.random.RandomState(0).randn(2, 64, 64, 3).astype(np.float32)
    variables = model.init(jax.random.key(0), jnp.asarray(x_np), train=False)
    params, batch_stats = _torch_state_to_flax(
        torch_unet, variables["params"], variables["batch_stats"])

    ours = np.asarray(model.apply(
        {"params": params, "batch_stats": batch_stats},
        jnp.asarray(x_np), train=False))
    with torch.no_grad():
        theirs = torch_unet(
            torch.from_numpy(x_np.transpose(0, 3, 1, 2))
        ).numpy().transpose(0, 2, 3, 1)

    np.testing.assert_allclose(ours, theirs, atol=2e-4, rtol=1e-3)


def test_unet_train_mode_bn_matches_torch(torch_unet):
    """Train-mode forward (batch statistics) also matches."""
    import torch

    import jax
    import jax.numpy as jnp

    from unet_torch_tpu.models.unet import UNet

    model = UNet(3, 3, base=8)
    x_np = np.random.RandomState(1).randn(2, 64, 64, 3).astype(np.float32)
    variables = model.init(jax.random.key(0), jnp.asarray(x_np), train=False)
    params, batch_stats = _torch_state_to_flax(
        torch_unet, variables["params"], variables["batch_stats"])

    ours, _ = model.apply(
        {"params": params, "batch_stats": batch_stats},
        jnp.asarray(x_np), train=True, mutable=["batch_stats"])
    torch_unet.train()
    with torch.no_grad():
        theirs = torch_unet(
            torch.from_numpy(x_np.transpose(0, 3, 1, 2))
        ).numpy().transpose(0, 2, 3, 1)
    torch_unet.eval()
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=5e-4, rtol=1e-2)

def test_unet_multitask_import_matches_torch():
    import torch

    sys.modules.setdefault("torchvision", types.ModuleType("torchvision"))
    sys.path.insert(0, "/root/reference")
    from Model import UNet_multitask as TorchMT

    import jax
    import jax.numpy as jnp

    from unet_torch_tpu.ckpt.torch_import import load_torch_unet
    from unet_torch_tpu.models.unet import UNetMultitask

    torch.manual_seed(1)
    tm = TorchMT(3, 2, 8, usa_cuda=False)
    tm.eval()
    model = UNetMultitask(3, 2, base=8)
    x_np = np.random.RandomState(2).randn(1, 32, 32, 3).astype(np.float32)
    variables = model.init(jax.random.key(0), jnp.asarray(x_np), train=False)
    params, bs = load_torch_unet(tm.state_dict(), variables["params"],
                                 variables["batch_stats"],
                                 heads=("_decod1", "_decod2"))
    o1, o2 = model.apply({"params": params, "batch_stats": bs},
                         jnp.asarray(x_np), train=False)
    with torch.no_grad():
        t1, t2 = tm(torch.from_numpy(x_np.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(np.asarray(o1),
                               t1.numpy().transpose(0, 2, 3, 1), atol=2e-4,
                               rtol=1e-3)
    np.testing.assert_allclose(np.asarray(o2),
                               t2.numpy().transpose(0, 2, 3, 1), atol=2e-4,
                               rtol=1e-3)


def test_unet_attention_forward_matches_torch():
    """UNet_attention pixel parity with transplanted reference weights
    (Model.py:294-391 incl. the Attention_block gate math :257-291)."""
    import torch

    sys.modules.setdefault("torchvision", types.ModuleType("torchvision"))
    sys.path.insert(0, "/root/reference")
    from Model import UNet_attention as TorchAtt

    import jax
    import jax.numpy as jnp

    from unet_torch_tpu.ckpt.torch_import import load_torch_unet_attention
    from unet_torch_tpu.models.unet import UNetAttention

    torch.manual_seed(2)
    theirs_model = TorchAtt(3, 3, 8, usa_cuda=False)
    theirs_model.eval()

    model = UNetAttention(3, 3, base=8)
    x_np = np.random.RandomState(3).randn(2, 64, 64, 3).astype(np.float32)
    variables = model.init(jax.random.key(0), jnp.asarray(x_np), train=False)
    params, batch_stats = load_torch_unet_attention(
        theirs_model.state_dict(), variables["params"],
        variables["batch_stats"])

    ours = np.asarray(model.apply(
        {"params": params, "batch_stats": batch_stats},
        jnp.asarray(x_np), train=False))
    with torch.no_grad():
        theirs = theirs_model(
            torch.from_numpy(x_np.transpose(0, 3, 1, 2))
        ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, theirs, atol=2e-4, rtol=1e-3)
