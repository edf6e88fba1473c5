"""Conditional-DETR transformer pixel parity vs the reference's torch code
(CLTR/transformer.py + the vendored attention) with transplanted weights —
validates the d_model*2 cross-attention, query_scale modulation and
reference-point machinery."""

import sys
import types

import numpy as np
import pytest


@pytest.fixture(scope="module")
def torch_transformer():
    import torch

    sys.modules.setdefault("torchvision", types.ModuleType("torchvision"))
    sys.path.insert(0, "/root/reference")
    from CLTR.transformer import Transformer as TorchTransformer

    torch.manual_seed(0)
    # the reference's gen_sineembed is hardcoded to 256 dims
    tm = TorchTransformer(d_model=256, nhead=8, num_encoder_layers=1,
                          num_decoder_layers=2, dim_feedforward=64,
                          dropout=0.0, return_intermediate_dec=True)
    tm.eval()
    return tm


def _lin(w):
    return w.detach().numpy().T


def _copy_mlp(torch_mlp, ours):
    for i, layer in enumerate(torch_mlp.layers):
        ours[f"layer{i}"]["kernel"] = _lin(layer.weight)
        ours[f"layer{i}"]["bias"] = layer.bias.detach().numpy()


def _transplant(tm, params):
    import jax

    params = jax.tree_util.tree_map(np.asarray, params)
    _copy_mlp(tm.decoder.ref_point_head, params["ref_point_head"])
    _copy_mlp(tm.decoder.query_scale, params["query_scale"])

    for i, layer in enumerate(tm.encoder.layers):
        ours = params[f"encoder_layer{i}"]
        E = layer.self_attn.embed_dim
        in_w = layer.self_attn.in_proj_weight.detach().numpy()
        in_b = layer.self_attn.in_proj_bias.detach().numpy()
        for j, name in enumerate(("q_proj", "k_proj", "v_proj")):
            ours["self_attn"][name]["kernel"] = in_w[j * E:(j + 1) * E].T
            ours["self_attn"][name]["bias"] = in_b[j * E:(j + 1) * E]
        ours["self_attn"]["out_proj"]["kernel"] = _lin(
            layer.self_attn.out_proj.weight)
        ours["self_attn"]["out_proj"]["bias"] = \
            layer.self_attn.out_proj.bias.detach().numpy()
        for lin_name in ("linear1", "linear2"):
            ours[lin_name]["kernel"] = _lin(getattr(layer, lin_name).weight)
            ours[lin_name]["bias"] = \
                getattr(layer, lin_name).bias.detach().numpy()
        for norm in ("norm1", "norm2"):
            ours[norm]["scale"] = getattr(layer, norm).weight.detach().numpy()
            ours[norm]["bias"] = getattr(layer, norm).bias.detach().numpy()

    for i, layer in enumerate(tm.decoder.layers):
        ours = params[f"decoder_layer{i}"]
        projs = ["sa_qcontent_proj", "sa_qpos_proj", "sa_kcontent_proj",
                 "sa_kpos_proj", "sa_v_proj", "ca_qcontent_proj",
                 "ca_kcontent_proj", "ca_kpos_proj", "ca_v_proj",
                 "ca_qpos_sine_proj"]
        if getattr(layer, "ca_qpos_proj", None) is not None:
            projs.append("ca_qpos_proj")
        for name in projs:
            lin = getattr(layer, name)
            ours[name]["kernel"] = _lin(lin.weight)
            ours[name]["bias"] = lin.bias.detach().numpy()
        for attn in ("self_attn", "cross_attn"):
            t_attn = getattr(layer, attn)
            ours[attn]["out_proj"]["kernel"] = _lin(t_attn.out_proj.weight)
            ours[attn]["out_proj"]["bias"] = \
                t_attn.out_proj.bias.detach().numpy()
        for lin_name in ("linear1", "linear2"):
            ours[lin_name]["kernel"] = _lin(getattr(layer, lin_name).weight)
            ours[lin_name]["bias"] = \
                getattr(layer, lin_name).bias.detach().numpy()
        for norm in ("norm1", "norm2", "norm3"):
            ours[norm]["scale"] = getattr(layer, norm).weight.detach().numpy()
            ours[norm]["bias"] = getattr(layer, norm).bias.detach().numpy()

    params["decoder_norm"]["scale"] = tm.decoder.norm.weight.detach().numpy()
    params["decoder_norm"]["bias"] = tm.decoder.norm.bias.detach().numpy()
    return params


def test_cltr_transformer_matches_torch(torch_transformer):
    import torch

    import jax
    import jax.numpy as jnp

    from unet_torch_tpu.models.cltr.transformer import Transformer

    tm = torch_transformer
    B, C, H, W, Q = 2, 256, 4, 4, 6
    rng = np.random.RandomState(0)
    src = rng.randn(B, H, W, C).astype(np.float32)
    pos = rng.randn(B, H, W, C).astype(np.float32)
    query_embed = rng.randn(Q, C).astype(np.float32)
    mask = np.zeros((B, H, W), bool)

    model = Transformer(d_model=256, nhead=8, num_encoder_layers=1,
                        num_decoder_layers=2, dim_feedforward=64,
                        dropout_rate=0.0)
    variables = model.init(jax.random.key(0), jnp.asarray(src),
                           jnp.asarray(mask), jnp.asarray(query_embed),
                           jnp.asarray(pos), train=False)
    params = _transplant(tm, variables["params"])
    hs_ours, ref_ours = model.apply({"params": params}, jnp.asarray(src),
                                    jnp.asarray(mask),
                                    jnp.asarray(query_embed),
                                    jnp.asarray(pos), train=False)

    with torch.no_grad():
        hs_t, ref_t = tm(
            torch.from_numpy(src.transpose(0, 3, 1, 2)),
            torch.from_numpy(mask),
            torch.from_numpy(query_embed),
            torch.from_numpy(pos.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(np.asarray(ref_ours), ref_t.numpy(),
                               atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(hs_ours), hs_t.numpy(),
                               atol=2e-4, rtol=1e-3)
