"""Import reference-trained torch checkpoints (Model.py UNet family).

Users migrating from the reference bring `models/best.pt` files produced by
torch.save(state_dict) (/root/reference/Trainer.py:761-765).  This module maps
those tensors into our flax trees — verified to pixel-level output parity in
tests/test_torch_parity.py.

Conventions: conv kernels OIHW -> HWIO; ConvTranspose2d computes the conv
gradient, so its (I,O,kh,kw) kernels additionally need a spatial flip for
flax's ConvTranspose; BN weight/bias -> scale/bias, running stats ->
batch_stats.
"""

from __future__ import annotations

import numpy as np


def _conv(w):
    return np.asarray(w).transpose(2, 3, 1, 0)


def _convT(w):
    return np.asarray(w).transpose(2, 3, 0, 1)[::-1, ::-1].copy()


def _copy_doubleconv(sd, prefix, p, bs):
    for i, (ci, bi) in enumerate((("0", "1"), ("3", "4"))):
        p[f"Conv_{i}"]["kernel"] = _conv(sd[f"{prefix}.{ci}.weight"])
        bn = f"BatchNorm_{i}"
        p[bn]["scale"] = np.asarray(sd[f"{prefix}.{bi}.weight"])
        p[bn]["bias"] = np.asarray(sd[f"{prefix}.{bi}.bias"])
        bs[bn]["mean"] = np.asarray(sd[f"{prefix}.{bi}.running_mean"])
        bs[bn]["var"] = np.asarray(sd[f"{prefix}.{bi}.running_var"])


def load_torchvision_resnet50(state_dict, params, batch_stats,
                              prefix: str = ""):
    """Map a torchvision resnet50 state_dict into our CLTR backbone trees
    (models/cltr/backbone.py::ResNet50) — frozen-BN tensors land in
    batch_stats, matching the reference's FrozenBatchNorm2d buffers
    (CLTR/backbone.py:26-62).

    ``prefix`` strips a leading key prefix (e.g. "backbone.0.body.").
    """
    import jax

    sd = {}
    for k, v in state_dict.items():
        if prefix and not k.startswith(prefix):
            continue
        sd[k[len(prefix):]] = (v.detach().numpy() if hasattr(v, "detach")
                               else np.asarray(v))
    params = jax.tree_util.tree_map(np.asarray, params)
    batch_stats = jax.tree_util.tree_map(np.asarray, batch_stats)

    def bn(src, dst):
        dst["weight"] = sd[f"{src}.weight"]
        dst["bias"] = sd[f"{src}.bias"]
        dst["running_mean"] = sd[f"{src}.running_mean"]
        dst["running_var"] = sd[f"{src}.running_var"]

    params["conv1"]["kernel"] = _conv(sd["conv1.weight"])
    bn("bn1", batch_stats["bn1"])
    layers = (3, 4, 6, 3)
    for li, n in enumerate(layers, start=1):
        for b in range(n):
            key = f"layer{li}_block{b}"
            src = f"layer{li}.{b}"
            for ci in ("conv1", "conv2", "conv3"):
                params[key][ci]["kernel"] = _conv(sd[f"{src}.{ci}.weight"])
            for bi in ("bn1", "bn2", "bn3"):
                bn(f"{src}.{bi}", batch_stats[key][bi])
            if f"{src}.downsample.0.weight" in sd:
                params[key]["downsample_conv"]["kernel"] = _conv(
                    sd[f"{src}.downsample.0.weight"])
                bn(f"{src}.downsample.1", batch_stats[key]["downsample_bn"])
    return params, batch_stats


def load_resnet50_checkpoint(path: str) -> dict:
    """Read a torchvision-resnet50 state_dict from disk: a torch.save file
    (what `torchvision.models.resnet50(pretrained=True)` users export) or an
    .npz archive.  Keys with a DETR-style "backbone.0.body." prefix are
    stripped so checkpoints saved from the reference's wrapped backbone
    (/root/reference/CLTR/backbone.py:73,100) load too."""
    if path.endswith(".npz"):
        sd = dict(np.load(path))
    else:
        import torch

        obj = torch.load(path, map_location="cpu", weights_only=False)
        if hasattr(obj, "state_dict"):
            obj = obj.state_dict()
        if isinstance(obj, dict) and "state_dict" in obj and isinstance(
                obj["state_dict"], dict):
            obj = obj["state_dict"]
        sd = {k: v.detach().numpy() if hasattr(v, "detach") else
              np.asarray(v) for k, v in obj.items()}
    for prefix in ("backbone.0.body.", "body.", "module."):
        if any(k.startswith(prefix) for k in sd):
            sd = {k[len(prefix):]: v for k, v in sd.items()
                  if k.startswith(prefix)}
    return sd


def load_pretrained_resnet50_into_cltr(path: str, params, batch_stats):
    """Install pretrained resnet50 weights under the ConditionalDETR
    'backbone' subtree (the capability of ref CLTR/backbone.py:73
    `pretrained=True`, done as an explicit checkpoint path — no network
    downloads on TPU pods)."""
    sd = load_resnet50_checkpoint(path)
    params = dict(params)
    batch_stats = dict(batch_stats)
    bp, bb = load_torchvision_resnet50(sd, params["backbone"],
                                       batch_stats.get("backbone", {}))
    params["backbone"] = bp
    batch_stats["backbone"] = bb
    return params, batch_stats


def load_torch_transunet(state_dict, params, batch_stats):
    """Map a reference TransUnet (vit_seg_modeling.VisionTransformer)
    state_dict into our flax trees.  Verified to pixel-level output parity in
    tests/test_transunet_torch_parity.py (module-traversal variant of the
    same mapping)."""
    import jax

    sd = {k: (v.detach().numpy() if hasattr(v, "detach") else np.asarray(v))
          for k, v in state_dict.items()}
    params = jax.tree_util.tree_map(np.asarray, params)
    batch_stats = jax.tree_util.tree_map(np.asarray, batch_stats)

    def lin(w):
        return np.asarray(w).T

    t = params["transformer"]
    emb = t["embeddings"]
    emb["patch_embeddings"]["kernel"] = _conv(
        sd["transformer.embeddings.patch_embeddings.weight"])
    emb["patch_embeddings"]["bias"] = \
        sd["transformer.embeddings.patch_embeddings.bias"]
    emb["position_embeddings"] = \
        sd["transformer.embeddings.position_embeddings"]

    if "hybrid_model" in emb:
        hm = emb["hybrid_model"]
        base = "transformer.embeddings.hybrid_model"
        hm["root_conv"]["kernel"] = _conv(sd[f"{base}.root.conv.weight"])
        hm["root_gn"]["scale"] = sd[f"{base}.root.gn.weight"]
        hm["root_gn"]["bias"] = sd[f"{base}.root.gn.bias"]
        for key in list(hm):
            if not key.startswith("block"):
                continue
            bidx, uidx = key.replace("block", "").split("_unit")
            tbase = f"{base}.body.block{bidx}.unit{uidx}"
            unit = hm[key]
            for conv in ("conv1", "conv2", "conv3"):
                unit[conv]["kernel"] = _conv(sd[f"{tbase}.{conv}.weight"])
            for gn in ("gn1", "gn2", "gn3"):
                unit[gn]["scale"] = sd[f"{tbase}.{gn}.weight"]
                unit[gn]["bias"] = sd[f"{tbase}.{gn}.bias"]
            if "downsample" in unit:
                unit["downsample"]["kernel"] = _conv(
                    sd[f"{tbase}.downsample.weight"])
                unit["gn_proj"]["scale"] = sd[f"{tbase}.gn_proj.weight"]
                unit["gn_proj"]["bias"] = sd[f"{tbase}.gn_proj.bias"]

    enc = t["encoder"]
    i = 0
    while f"encoderblock_{i}" in enc:
        ob = enc[f"encoderblock_{i}"]
        tb = f"transformer.encoder.layer.{i}"
        for ln_ours, ln_theirs in (("attention_norm", "attention_norm"),
                                   ("ffn_norm", "ffn_norm")):
            ob[ln_ours]["scale"] = sd[f"{tb}.{ln_theirs}.weight"]
            ob[ln_ours]["bias"] = sd[f"{tb}.{ln_theirs}.bias"]
        for name in ("query", "key", "value", "out"):
            ob["attn"][name]["kernel"] = lin(sd[f"{tb}.attn.{name}.weight"])
            ob["attn"][name]["bias"] = sd[f"{tb}.attn.{name}.bias"]
        for fc in ("fc1", "fc2"):
            ob["ffn"][fc]["kernel"] = lin(sd[f"{tb}.ffn.{fc}.weight"])
            ob["ffn"][fc]["bias"] = sd[f"{tb}.ffn.{fc}.bias"]
        i += 1
    enc["encoder_norm"]["scale"] = \
        sd["transformer.encoder.encoder_norm.weight"]
    enc["encoder_norm"]["bias"] = sd["transformer.encoder.encoder_norm.bias"]

    def conv2drelu(prefix, p, b):
        p["conv"]["kernel"] = _conv(sd[f"{prefix}.0.weight"])
        p["bn"]["scale"] = sd[f"{prefix}.1.weight"]
        p["bn"]["bias"] = sd[f"{prefix}.1.bias"]
        b["bn"]["mean"] = sd[f"{prefix}.1.running_mean"]
        b["bn"]["var"] = sd[f"{prefix}.1.running_var"]

    for dec_name in [k for k in params if k.startswith("decoder")]:
        suffix = dec_name.replace("decoder", "")
        tdec = f"decoder{suffix}"
        dec_p, dec_b = params[dec_name], batch_stats[dec_name]
        conv2drelu(f"{tdec}.conv_more", dec_p["conv_more"],
                   dec_b["conv_more"])
        bi = 0
        while f"block_{bi}" in dec_p:
            conv2drelu(f"{tdec}.blocks.{bi}.conv1",
                       dec_p[f"block_{bi}"]["conv1"],
                       dec_b[f"block_{bi}"]["conv1"])
            conv2drelu(f"{tdec}.blocks.{bi}.conv2",
                       dec_p[f"block_{bi}"]["conv2"],
                       dec_b[f"block_{bi}"]["conv2"])
            bi += 1
    for head_name in [k for k in params if k.startswith("segmentation_head")]:
        suffix = head_name.replace("segmentation_head", "")
        params[head_name]["conv"]["kernel"] = _conv(
            sd[f"segmentation_head{suffix}.0.weight"])
        params[head_name]["conv"]["bias"] = \
            sd[f"segmentation_head{suffix}.0.bias"]
    return params, batch_stats


def load_torch_unet(state_dict, params, batch_stats, heads=("",)):
    """Map a reference UNet/UNet_multitask state_dict into (params,
    batch_stats) trees created by our UNet/UNetMultitask.init.

    heads: ("",) for UNet; ("_decod1", "_decod2") for UNet_multitask
    (Model.py:202-229 naming).  Tensors may be torch Tensors or numpy arrays.
    Returns new (params, batch_stats).
    """
    import jax

    sd = {k: (v.detach().numpy() if hasattr(v, "detach") else np.asarray(v))
          for k, v in state_dict.items()}
    params = jax.tree_util.tree_map(np.asarray, params)
    batch_stats = jax.tree_util.tree_map(np.asarray, batch_stats)

    enc_p, enc_b = params["encoder"], batch_stats["encoder"]
    _copy_doubleconv(sd, "inc.double_conv", enc_p["inc"], enc_b["inc"])
    for i in range(1, 5):
        _copy_doubleconv(sd, f"down{i}.maxpool_conv.1.double_conv",
                         enc_p[f"down{i}"]["DoubleConv_0"],
                         enc_b[f"down{i}"]["DoubleConv_0"])

    for suffix, dec_name in zip(
            heads, ("decoder",) if heads == ("",) else
            tuple(f"decoder{i}" for i in range(1, len(heads) + 1))):
        dec_p, dec_b = params[dec_name], batch_stats[dec_name]
        for i in range(1, 5):
            up = dec_p[f"up{i}"]
            up["ConvTranspose_0"]["kernel"] = _convT(
                sd[f"up{i}{suffix}.up.weight"])
            up["ConvTranspose_0"]["bias"] = np.asarray(
                sd[f"up{i}{suffix}.up.bias"])
            _copy_doubleconv(sd, f"up{i}{suffix}.conv.double_conv",
                             up["DoubleConv_0"],
                             dec_b[f"up{i}"]["DoubleConv_0"])
        dec_p["outc"]["Conv_0"]["kernel"] = _conv(
            sd[f"outc{suffix}.conv.weight"])
        dec_p["outc"]["Conv_0"]["bias"] = np.asarray(
            sd[f"outc{suffix}.conv.bias"])
    return params, batch_stats


def load_torch_unet_attention(state_dict, params, batch_stats):
    """Map a reference UNet_attention state_dict (Model.py:294-391) into the
    trees created by our models/unet.py::UNetAttention.init.

    Encoder and up/outc blocks share the plain-UNet layout; each
    Attention_block (Model.py:257-291) contributes an up-ConvTranspose plus
    three (1x1 conv + BN) projections (W_q / W_x / psi) mapped onto our
    nn/blocks.py::AttentionGate submodule names.
    """
    import jax

    sd = {k: (v.detach().numpy() if hasattr(v, "detach") else np.asarray(v))
          for k, v in state_dict.items()}
    params = jax.tree_util.tree_map(np.asarray, params)
    batch_stats = jax.tree_util.tree_map(np.asarray, batch_stats)

    enc_p, enc_b = params["encoder"], batch_stats["encoder"]
    _copy_doubleconv(sd, "inc.double_conv", enc_p["inc"], enc_b["inc"])
    for i in range(1, 5):
        _copy_doubleconv(sd, f"down{i}.maxpool_conv.1.double_conv",
                         enc_p[f"down{i}"]["DoubleConv_0"],
                         enc_b[f"down{i}"]["DoubleConv_0"])

    for i in range(1, 5):
        up = params[f"up{i}"]
        up["ConvTranspose_0"]["kernel"] = _convT(sd[f"up{i}.up.weight"])
        up["ConvTranspose_0"]["bias"] = np.asarray(sd[f"up{i}.up.bias"])
        _copy_doubleconv(sd, f"up{i}.conv.double_conv",
                         up["DoubleConv_0"],
                         batch_stats[f"up{i}"]["DoubleConv_0"])
    params["outc"]["Conv_0"]["kernel"] = _conv(sd["outc.conv.weight"])
    params["outc"]["Conv_0"]["bias"] = np.asarray(sd["outc.conv.bias"])

    # attention gates: ref names them 'attenion{1..4}' (sic, Model.py:324)
    for i in range(1, 5):
        src = f"attenion{i}"
        gp, gb = params[f"att{i}"], batch_stats[f"att{i}"]
        gp["ConvTranspose_0"]["kernel"] = _convT(sd[f"{src}.up.weight"])
        gp["ConvTranspose_0"]["bias"] = np.asarray(sd[f"{src}.up.bias"])
        for ours, theirs in (("W_q", "W_q"), ("W_x", "W_x"), ("psi", "psi")):
            gp[f"{ours}_conv"]["kernel"] = _conv(sd[f"{src}.{theirs}.0.weight"])
            gp[f"{ours}_conv"]["bias"] = np.asarray(
                sd[f"{src}.{theirs}.0.bias"])
            gp[f"{ours}_bn"]["scale"] = np.asarray(
                sd[f"{src}.{theirs}.1.weight"])
            gp[f"{ours}_bn"]["bias"] = np.asarray(sd[f"{src}.{theirs}.1.bias"])
            gb[f"{ours}_bn"]["mean"] = np.asarray(
                sd[f"{src}.{theirs}.1.running_mean"])
            gb[f"{ours}_bn"]["var"] = np.asarray(
                sd[f"{src}.{theirs}.1.running_var"])
    return params, batch_stats
