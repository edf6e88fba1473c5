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
