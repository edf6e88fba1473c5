"""torchvision-resnet50 state_dict importer -> CLTR backbone mapping check.

torchvision is absent in this image, so a synthetic state_dict with the exact
key layout and shapes stands in; the check is that every tensor lands on the
right parameter and the loaded model runs.
"""

import numpy as np

import jax
import jax.numpy as jnp

from unet_torch_tpu.ckpt.torch_import import load_torchvision_resnet50
from unet_torch_tpu.models.cltr.backbone import ResNet50


def synthetic_resnet50_state_dict(rng):
    sd = {}

    def bn(prefix, c):
        sd[f"{prefix}.weight"] = rng.rand(c).astype(np.float32) + 0.5
        sd[f"{prefix}.bias"] = rng.randn(c).astype(np.float32)
        sd[f"{prefix}.running_mean"] = rng.randn(c).astype(np.float32) * 0.1
        sd[f"{prefix}.running_var"] = rng.rand(c).astype(np.float32) + 0.5

    sd["conv1.weight"] = rng.randn(64, 3, 7, 7).astype(np.float32) * 0.05
    bn("bn1", 64)
    widths = (64, 128, 256, 512)
    layers = (3, 4, 6, 3)
    cin = 64
    for li, (w, n) in enumerate(zip(widths, layers), start=1):
        for b in range(n):
            src = f"layer{li}.{b}"
            sd[f"{src}.conv1.weight"] = rng.randn(w, cin, 1, 1).astype(
                np.float32) * 0.05
            sd[f"{src}.conv2.weight"] = rng.randn(w, w, 3, 3).astype(
                np.float32) * 0.05
            sd[f"{src}.conv3.weight"] = rng.randn(w * 4, w, 1, 1).astype(
                np.float32) * 0.05
            bn(f"{src}.bn1", w)
            bn(f"{src}.bn2", w)
            bn(f"{src}.bn3", w * 4)
            if b == 0:
                sd[f"{src}.downsample.0.weight"] = rng.randn(
                    w * 4, cin, 1, 1).astype(np.float32) * 0.05
                bn(f"{src}.downsample.1", w * 4)
            cin = w * 4
    return sd


def test_resnet50_import_mapping_and_forward():
    rng = np.random.RandomState(0)
    sd = synthetic_resnet50_state_dict(rng)
    model = ResNet50()
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.key(0), x)
    params, bs = load_torchvision_resnet50(sd, variables["params"],
                                           variables["batch_stats"])
    np.testing.assert_array_equal(
        params["conv1"]["kernel"], sd["conv1.weight"].transpose(2, 3, 1, 0))
    np.testing.assert_array_equal(
        bs["layer3_block2"]["bn2"]["running_mean"],
        sd["layer3.2.bn2.running_mean"])
    np.testing.assert_array_equal(
        params["layer2_block0"]["downsample_conv"]["kernel"],
        sd["layer2.0.downsample.0.weight"].transpose(2, 3, 1, 0))
    out = model.apply({"params": params, "batch_stats": bs}, x)
    assert out.shape == (1, 2, 2, 2048)
    assert np.isfinite(np.asarray(out)).all()


def test_pretrained_resnet50_file_into_cltr(tmp_path):
    """cltr_config.pretrained_resnet50 capability: a torch-saved torchvision
    state_dict loads into the ConditionalDETR backbone subtree (the TPU path
    for ref CLTR/backbone.py:73 pretrained=True)."""
    import torch

    from unet_torch_tpu.ckpt.torch_import import (
        load_pretrained_resnet50_into_cltr,
    )
    from unet_torch_tpu.models.cltr.model import ConditionalDETR

    rng = np.random.RandomState(1)
    sd = synthetic_resnet50_state_dict(rng)
    path = str(tmp_path / "resnet50.pt")
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, path)

    model = ConditionalDETR(num_queries=4, hidden_dim=32, nheads=4,
                            enc_layers=1, dec_layers=1, dim_feedforward=32)
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.key(0), x, train=False)
    params, bs = load_pretrained_resnet50_into_cltr(
        path, variables["params"], variables.get("batch_stats", {}))
    np.testing.assert_array_equal(
        params["backbone"]["conv1"]["kernel"],
        sd["conv1.weight"].transpose(2, 3, 1, 0))
    np.testing.assert_array_equal(
        bs["backbone"]["layer4_block2"]["bn3"]["running_var"],
        sd["layer4.2.bn3.running_var"])
    out = model.apply({"params": params, "batch_stats": bs}, x, train=False)
    assert np.isfinite(np.asarray(out["pred_logits"])).all()


def test_resnet50_checkpoint_prefix_stripping(tmp_path):
    """DETR-style 'backbone.0.body.' prefixed checkpoints load too."""
    import torch

    from unet_torch_tpu.ckpt.torch_import import load_resnet50_checkpoint

    rng = np.random.RandomState(2)
    sd = synthetic_resnet50_state_dict(rng)
    path = str(tmp_path / "wrapped.pt")
    torch.save({f"backbone.0.body.{k}": torch.from_numpy(v)
                for k, v in sd.items()}, path)
    loaded = load_resnet50_checkpoint(path)
    assert set(loaded) == set(sd)
    np.testing.assert_array_equal(loaded["conv1.weight"], sd["conv1.weight"])
