"""TransUnet pixel-level parity: the reference's torch VisionTransformer with
transplanted weights vs our Flax implementation (hybrid R50 path: StdConv,
GroupNorm, ViT encoder, DecoderCup, align-corners upsampling)."""

import sys
import types

import numpy as np
import pytest


def _small_torch_config(img_size=64):
    sys.modules.setdefault("torchvision", types.ModuleType("torchvision"))
    sys.path.insert(0, "/root/reference")
    from TransUnet import vit_seg_configs as ref_configs

    c = ref_configs.get_r50_b16_config()
    c.hidden_size = 16
    c.transformer.mlp_dim = 32
    c.transformer.num_heads = 2
    c.transformer.num_layers = 2
    c.transformer.dropout_rate = 0.0
    c.n_classes = 3
    c.n_skip = 3
    c.patches.grid = (img_size // 16, img_size // 16)
    c.resnet.num_layers = (1, 1, 1)
    c.skip_channels = [512, 256, 64, 16]
    return c


def _our_config(img_size=64):
    import copy

    from unet_torch_tpu.models.transunet import CONFIGS

    c = copy.deepcopy(CONFIGS["R50-ViT-B_16"])
    c.hidden_size = 16
    c.transformer.mlp_dim = 32
    c.transformer.num_heads = 2
    c.transformer.num_layers = 2
    c.transformer.dropout_rate = 0.0
    c.n_classes = 3
    c.n_skip = 3
    c.patches.grid = (img_size // 16, img_size // 16)
    c.resnet.num_layers = (1, 1, 1)
    return c


def _conv(w):
    return w.detach().numpy().transpose(2, 3, 1, 0)


def _lin(w):
    return w.detach().numpy().T


def _transplant(tm, params, batch_stats, n_layers):
    import jax

    params = jax.tree_util.tree_map(np.asarray, params)
    batch_stats = jax.tree_util.tree_map(np.asarray, batch_stats)
    t = params["transformer"]
    emb = t["embeddings"]

    te = tm.transformer.embeddings
    emb["patch_embeddings"]["kernel"] = _conv(te.patch_embeddings.weight)
    emb["patch_embeddings"]["bias"] = \
        te.patch_embeddings.bias.detach().numpy()
    emb["position_embeddings"] = te.position_embeddings.detach().numpy()

    hm = emb["hybrid_model"]
    root = te.hybrid_model.root
    hm["root_conv"]["kernel"] = _conv(root.conv.weight)
    hm["root_gn"]["scale"] = root.gn.weight.detach().numpy()
    hm["root_gn"]["bias"] = root.gn.bias.detach().numpy()
    for bidx, block in enumerate(te.hybrid_model.body, start=1):
        for uidx, unit in enumerate(block, start=1):
            ours = hm[f"block{bidx}_unit{uidx}"]
            for conv in ("conv1", "conv2", "conv3"):
                ours[conv]["kernel"] = _conv(getattr(unit, conv).weight)
            for gn in ("gn1", "gn2", "gn3"):
                ours[gn]["scale"] = getattr(unit, gn).weight.detach().numpy()
                ours[gn]["bias"] = getattr(unit, gn).bias.detach().numpy()
            if hasattr(unit, "downsample"):
                ours["downsample"]["kernel"] = _conv(unit.downsample.weight)
                ours["gn_proj"]["scale"] = \
                    unit.gn_proj.weight.detach().numpy()
                ours["gn_proj"]["bias"] = unit.gn_proj.bias.detach().numpy()

    enc = t["encoder"]
    for i, blk in enumerate(tm.transformer.encoder.layer):
        ob = enc[f"encoderblock_{i}"]
        ob["attention_norm"]["scale"] = \
            blk.attention_norm.weight.detach().numpy()
        ob["attention_norm"]["bias"] = \
            blk.attention_norm.bias.detach().numpy()
        ob["ffn_norm"]["scale"] = blk.ffn_norm.weight.detach().numpy()
        ob["ffn_norm"]["bias"] = blk.ffn_norm.bias.detach().numpy()
        for name in ("query", "key", "value", "out"):
            lin = getattr(blk.attn, name)
            ob["attn"][name]["kernel"] = _lin(lin.weight)
            ob["attn"][name]["bias"] = lin.bias.detach().numpy()
        ob["ffn"]["fc1"]["kernel"] = _lin(blk.ffn.fc1.weight)
        ob["ffn"]["fc1"]["bias"] = blk.ffn.fc1.bias.detach().numpy()
        ob["ffn"]["fc2"]["kernel"] = _lin(blk.ffn.fc2.weight)
        ob["ffn"]["fc2"]["bias"] = blk.ffn.fc2.bias.detach().numpy()
    enc["encoder_norm"]["scale"] = \
        tm.transformer.encoder.encoder_norm.weight.detach().numpy()
    enc["encoder_norm"]["bias"] = \
        tm.transformer.encoder.encoder_norm.bias.detach().numpy()

    def copy_conv2drelu(torch_seq, ours_p, ours_b):
        ours_p["conv"]["kernel"] = _conv(torch_seq[0].weight)
        ours_p["bn"]["scale"] = torch_seq[1].weight.detach().numpy()
        ours_p["bn"]["bias"] = torch_seq[1].bias.detach().numpy()
        ours_b["bn"]["mean"] = torch_seq[1].running_mean.detach().numpy()
        ours_b["bn"]["var"] = torch_seq[1].running_var.detach().numpy()

    dec_p, dec_b = params["decoder"], batch_stats["decoder"]
    copy_conv2drelu(tm.decoder.conv_more, dec_p["conv_more"],
                    dec_b["conv_more"])
    for i, blk in enumerate(tm.decoder.blocks):
        copy_conv2drelu(blk.conv1, dec_p[f"block_{i}"]["conv1"],
                        dec_b[f"block_{i}"]["conv1"])
        copy_conv2drelu(blk.conv2, dec_p[f"block_{i}"]["conv2"],
                        dec_b[f"block_{i}"]["conv2"])
    params["segmentation_head"]["conv"]["kernel"] = _conv(
        tm.segmentation_head[0].weight)
    params["segmentation_head"]["conv"]["bias"] = \
        tm.segmentation_head[0].bias.detach().numpy()
    return params, batch_stats


def test_transunet_forward_matches_torch():
    import torch

    sys.modules.setdefault("torchvision", types.ModuleType("torchvision"))
    sys.path.insert(0, "/root/reference")
    from TransUnet.vit_seg_modeling import VisionTransformer as TorchViT

    import jax
    import jax.numpy as jnp

    from unet_torch_tpu.models.transunet import VisionTransformer

    torch.manual_seed(0)
    tcfg = _small_torch_config()
    tm = TorchViT(tcfg, img_size=64, num_classes=3)
    tm.eval()

    ocfg = _our_config()
    model = VisionTransformer(ocfg, img_size=64, num_classes=3)
    x_np = np.random.RandomState(0).randn(1, 64, 64, 3).astype(np.float32)
    variables = model.init(jax.random.key(0), jnp.asarray(x_np), train=False)
    params, bs = _transplant(tm, variables["params"],
                             variables["batch_stats"],
                             ocfg.transformer.num_layers)

    ours = np.asarray(model.apply({"params": params, "batch_stats": bs},
                                  jnp.asarray(x_np), train=False))
    with torch.no_grad():
        theirs = tm(torch.from_numpy(x_np.transpose(0, 3, 1, 2))
                    ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, theirs, atol=5e-4, rtol=1e-3)


def test_transunet_statedict_importer_matches_torch():
    """The framework's keyed importer (ckpt/torch_import.load_torch_transunet)
    produces the same pixel-parity as the module-traversal transplant."""
    import torch

    sys.modules.setdefault("torchvision", types.ModuleType("torchvision"))
    sys.path.insert(0, "/root/reference")
    from TransUnet.vit_seg_modeling import VisionTransformer as TorchViT

    import jax
    import jax.numpy as jnp

    from unet_torch_tpu.ckpt.torch_import import load_torch_transunet
    from unet_torch_tpu.models.transunet import VisionTransformer

    torch.manual_seed(3)
    tm = TorchViT(_small_torch_config(), img_size=64, num_classes=3)
    tm.eval()
    model = VisionTransformer(_our_config(), img_size=64, num_classes=3)
    x_np = np.random.RandomState(5).randn(1, 64, 64, 3).astype(np.float32)
    variables = model.init(jax.random.key(0), jnp.asarray(x_np), train=False)
    params, bs = load_torch_transunet(tm.state_dict(), variables["params"],
                                      variables["batch_stats"])
    ours = np.asarray(model.apply({"params": params, "batch_stats": bs},
                                  jnp.asarray(x_np), train=False))
    with torch.no_grad():
        theirs = tm(torch.from_numpy(x_np.transpose(0, 3, 1, 2))
                    ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, theirs, atol=5e-4, rtol=1e-3)
