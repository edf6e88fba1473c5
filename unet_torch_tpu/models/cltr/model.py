"""ConditionalDETR point-detection model (CLTR) — Flax.

Capability parity with /root/reference/CLTR/conditional_detr.py:30-107:
ResNet-50 frozen-BN backbone -> 1x1 input_proj -> conditional-DETR transformer
-> per-query class logits + channel_point regression with inverse-sigmoid
reference-point offsets; 2000 queries; aux outputs per decoder layer.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from unet_torch_tpu.models.cltr.backbone import ResNet50
from unet_torch_tpu.models.cltr.position_encoding import (
    PositionEmbeddingLearned,
    sine_position_embedding,
)
from unet_torch_tpu.models.cltr.transformer import MLP, Transformer


def inverse_sigmoid(x, eps=1e-5):
    """ref misc.py:506-510."""
    x = jnp.clip(x, 0, 1)
    x1 = jnp.clip(x, eps, None)
    x2 = jnp.clip(1 - x, eps, None)
    return jnp.log(x1 / x2)


class ConditionalDETR(nn.Module):
    num_classes: int = 2
    num_queries: int = 2000
    channel_point: int = 3
    hidden_dim: int = 256
    nheads: int = 8
    enc_layers: int = 6
    dec_layers: int = 6
    dim_feedforward: int = 2048
    dropout_rate: float = 0.1
    aux_loss: bool = True
    position_embedding: str = "sine"
    dtype: jnp.dtype = jnp.float32
    # torchvision resnet50 unit counts (ref backbone.py:73); parity probes
    # shrink this identically on both frameworks
    backbone_layers: tuple = (3, 4, 6, 3)

    @nn.compact
    def __call__(self, images, mask=None, *, train: bool = False):
        """images: (B, H, W, 3); mask: (B, H, W) bool, True on padding.

        Returns {'pred_logits': (B,Q,num_classes), 'pred_points':
        (B,Q,channel_point), 'aux_outputs': [...]} (ref :63-99).
        """
        feat = ResNet50(dtype=self.dtype,
                        layers=tuple(self.backbone_layers),
                        name="backbone")(images)
        b, fh, fw, _ = feat.shape
        if mask is None:
            fmask = jnp.zeros((b, fh, fw), bool)
        else:
            # nearest-resize the padding mask to the feature resolution
            fmask = jax.image.resize(mask.astype(jnp.float32), (b, fh, fw),
                                     "nearest") > 0.5
        if self.position_embedding == "sine":
            pos = sine_position_embedding(fmask, self.hidden_dim // 2)
        else:
            pos = PositionEmbeddingLearned(self.hidden_dim // 2,
                                           name="pos_embed")(feat)

        src = nn.Conv(self.hidden_dim, (1, 1), dtype=self.dtype,
                      name="input_proj")(feat)
        query_embed = self.param(
            "query_embed", nn.initializers.normal(1.0),
            (self.num_queries, self.hidden_dim))
        hs, reference = Transformer(
            self.hidden_dim, self.nheads, self.enc_layers, self.dec_layers,
            self.dim_feedforward, self.dropout_rate, dtype=self.dtype,
            name="transformer")(
            src, fmask, query_embed, pos, train=train)

        ref_before_sigmoid = inverse_sigmoid(reference)  # (B, Q, 2)
        # focal-loss prior bias (ref :54-57).  Heads run in the compute
        # dtype; logits/points are emitted f32 — the criterion (focal loss,
        # sigmoid point coords) stays full-precision end-to-end.
        prior_prob = 0.01
        bias_value = -math.log((1 - prior_prob) / prior_prob)
        class_embed = nn.Dense(
            self.num_classes, dtype=self.dtype,
            bias_init=nn.initializers.constant(bias_value),
            name="class_embed")
        point_embed = MLP(self.hidden_dim, self.channel_point, 3,
                          last_zero_init=True, dtype=self.dtype,
                          name="point_embed")

        outputs_coords = []
        outputs_classes = []
        for lvl in range(hs.shape[0]):
            tmp = point_embed(hs[lvl]).astype(jnp.float32)
            tmp = tmp.at[..., :2].add(ref_before_sigmoid)
            outputs_coords.append(jax.nn.sigmoid(tmp))
            outputs_classes.append(
                class_embed(hs[lvl]).astype(jnp.float32))

        out = {"pred_logits": outputs_classes[-1],
               "pred_points": outputs_coords[-1]}
        if self.aux_loss:
            out["aux_outputs"] = [
                {"pred_logits": c, "pred_points": p}
                for c, p in zip(outputs_classes[:-1], outputs_coords[:-1])]
        return out


def build_cltr(args: dict):
    """buildCLTR equivalent (ref build_model.py:13-18 + conditional_detr.py
    build :340-397): returns (model, criterion, postprocess)."""
    from unet_torch_tpu.models.cltr.criterion import (
        PostProcess,
        SetCriterion,
        build_weight_dict,
    )

    model = ConditionalDETR(
        num_classes=2,
        num_queries=args.get("num_queries", 2000),
        channel_point=args.get("channel_point", 3),
        hidden_dim=args.get("hidden_dim", 256),
        nheads=args.get("nheads", 8),
        enc_layers=args.get("enc_layers", 6),
        dec_layers=args.get("dec_layers", 6),
        dim_feedforward=args.get("dim_feedforward", 2048),
        dropout_rate=args.get("dropout", 0.1),
        aux_loss=args.get("aux_loss", True),
        position_embedding=args.get("position_embedding", "sine"),
        dtype=jnp.bfloat16 if str(args.get("precision", "f32")).lower()
        in ("bf16", "bfloat16") else jnp.float32,
        backbone_layers=tuple(args.get("backbone_layers", (3, 4, 6, 3))),
    )
    weight_dict = build_weight_dict(
        cls_loss_coef=args.get("cls_loss_coef", 2),
        point_loss_coef=args.get("point_loss_coef", 5),
        dec_layers=args.get("dec_layers", 6),
        aux_loss=args.get("aux_loss", True))
    criterion = SetCriterion(
        num_classes=2, weight_dict=weight_dict,
        focal_alpha=args.get("focal_alpha", 0.25),
        cost_class=args.get("set_cost_class", 2),
        cost_point=args.get("set_cost_point", 5))
    return model, criterion, {"point": PostProcess()}


def build_cltr_default():
    """Default config (CLTR/CLTRconfig.yml) model only — used by the train CLI."""
    import yaml

    return build_cltr({})[0]
