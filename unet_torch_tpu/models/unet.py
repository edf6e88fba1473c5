"""U-Net model family — Flax, NHWC.

Capability parity with the reference models (cited below); TPU-first design:
inputs/outputs are NHWC, the whole forward is one traced jit region, and
`jax.checkpoint` (rematerialisation) can wrap encoder stages to trade FLOPs for HBM
(the reference has a dead `use_checkpointing` hook, Model.py:155-165 — ours works).

  UNet            4-down/4-up encoder-decoder           /root/reference/Model.py:95-169
  UNet_multitask  shared encoder + two decoders/heads   /root/reference/Model.py:172-254
  UNet_attention  UNet + 4 attention gates on skips     /root/reference/Model.py:294-391

Channel codes (Model.py:99-104): -1 -> 1 input channel (HED hematoxylin),
-2 -> 3 channels (Macenko-normalised RGB).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from unet_torch_tpu.nn.blocks import AttentionGate, DoubleConv, Down, OutConv, Up


def resolve_channels(n_channels: int) -> int:
    if n_channels == -2:
        return 3
    if n_channels == -1:
        return 1
    return n_channels


class UNetEncoder(nn.Module):
    base: int
    dropout: bool = False
    dropout_p: float = 0.5
    remat: bool = False
    dtype: jnp.dtype = jnp.float32
    fold: bool = False

    @nn.compact
    def __call__(self, x, *, train: bool) -> Sequence[jnp.ndarray]:
        # Rematerialise stages in the backward pass when remat=True: HBM is
        # the usual bottleneck; recomputing conv activations is cheap on the
        # MXU.  (The reference's use_checkpointing is dead code,
        # Model.py:155-165 — ours works and is config-exposed.)
        conv_cls = (nn.remat(DoubleConv, static_argnums=(2,))
                    if self.remat else DoubleConv)
        down_cls = (nn.remat(Down, static_argnums=(2,))
                    if self.remat else Down)
        if self.fold:
            # W-folded level 1 (nn/folded.py): inc runs on (B,H,W/2,2C)
            # activations, down1 pools the folded tensor directly; x1 is
            # returned FOLDED for the matching folded decoder.
            from unet_torch_tpu.nn.folded import FoldedDoubleConv, fold
            inc = FoldedDoubleConv(self.base, x.shape[-1], dtype=self.dtype,
                                   name="inc")
            x1 = inc(fold(x), train=train)
            x2 = down_cls(self.base * 2, self.dropout, self.dropout_p,
                          dtype=self.dtype, folded_input=True,
                          name="down1")(x1, train)
        else:
            inc = conv_cls(self.base, dtype=self.dtype, name="inc")
            x1 = inc(x, train)
            x2 = down_cls(self.base * 2, self.dropout, self.dropout_p,
                          dtype=self.dtype, name="down1")(x1, train)
        downs = [
            down_cls(self.base * m, self.dropout, self.dropout_p,
                     dtype=self.dtype, name=f"down{i + 2}")
            for i, m in enumerate((4, 8, 16))
        ]
        x3 = downs[0](x2, train)
        x4 = downs[1](x3, train)
        x5 = downs[2](x4, train)
        return x1, x2, x3, x4, x5


class UNetDecoder(nn.Module):
    base: int
    n_classes: int
    dropout: bool = False
    dropout_p: float = 0.5
    remat: bool = False
    dtype: jnp.dtype = jnp.float32
    fold: bool = False
    # selective-precision rung: compute dtype of the final 1x1 head (outc)
    # only — lets a bf16 model emit f32 logits (flax promotes the conv's
    # input to head_dtype) without paying f32 through the decoder.  None =
    # follow `dtype`.
    head_dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, feats, *, train: bool, planes: bool = False):
        up_cls = nn.remat(Up, static_argnums=(3,)) if self.remat else Up
        head_dtype = self.head_dtype or self.dtype
        x1, x2, x3, x4, x5 = feats
        x = up_cls(self.base * 8, self.dropout, self.dropout_p,
                   dtype=self.dtype, name="up1")(x5, x4, train)
        x = up_cls(self.base * 4, self.dropout, self.dropout_p,
                   dtype=self.dtype, name="up2")(x, x3, train)
        x = up_cls(self.base * 2, self.dropout, self.dropout_p,
                   dtype=self.dtype, name="up3")(x, x2, train)
        if self.fold:
            # x1 arrives W-folded from the folded encoder (nn/folded.py).
            from unet_torch_tpu.nn.folded import FoldedUp, _FoldedOutConvWrap
            x = FoldedUp(self.base, self.dropout, self.dropout_p,
                         dtype=self.dtype, name="up4")(x, x1, train)
            return _FoldedOutConvWrap(self.n_classes, self.base,
                                      dtype=head_dtype, name="outc")(x, planes)
        x = up_cls(self.base, self.dropout, self.dropout_p,
                   dtype=self.dtype, name="up4")(x, x1, train)
        return OutConv(self.n_classes, dtype=head_dtype, name="outc")(x)


class UNet(nn.Module):
    """Vanilla U-Net. Input (B,H,W,C_in) -> logits (B,H,W,n_classes)."""

    n_channels: int
    n_classes: int
    base: int = 64
    dropout: bool = False
    dropout_p: float = 0.5
    remat: bool = False
    dtype: jnp.dtype = jnp.float32
    fold: bool = False
    head_dtype: jnp.dtype | None = None  # see UNetDecoder.head_dtype

    def supports_planes(self, x_shape) -> bool:
        """True when __call__(planes=True) would emit folded class planes
        for this input shape (the fused-head path in train/steps.py must
        mirror the trace-time fold decision below)."""
        return (self.fold and not self.remat
                and x_shape[1] % 16 == 0 and x_shape[2] % 16 == 0)

    @nn.compact
    def __call__(self, x, *, train: bool = False, planes: bool = False):
        # W-folding needs every pyramid level even (H, W divisible by 16) and
        # is not composed with remat; param trees are identical either way, so
        # the fallback branch shares the same checkpoint.  planes=True (only
        # meaningful when folding is active) returns (2*n_classes, B, H, W/2)
        # class planes instead of (B,H,W,n_classes) logits — see
        # nn/folded.py::FoldedOutConv.
        fold = self.supports_planes(x.shape)
        feats = UNetEncoder(self.base, self.dropout, self.dropout_p, self.remat,
                            dtype=self.dtype, fold=fold,
                            name="encoder")(x, train=train)
        return UNetDecoder(self.base, self.n_classes, self.dropout,
                           self.dropout_p, remat=self.remat,
                           dtype=self.dtype, fold=fold,
                           head_dtype=self.head_dtype,
                           name="decoder")(feats, train=train,
                                           planes=fold and planes)


class UNetMultitask(nn.Module):
    """Shared encoder + two independent decoders; returns (logits1, logits2)."""

    n_channels: int
    n_classes: int
    base: int = 64
    dropout: bool = False
    dropout_p: float = 0.5
    dtype: jnp.dtype = jnp.float32
    fold: bool = False

    def supports_planes(self, x_shape) -> bool:
        """True when __call__(planes=True) emits folded class planes per head
        for this input shape (mirrors the trace-time fold decision below)."""
        return self.fold and x_shape[1] % 16 == 0 and x_shape[2] % 16 == 0

    @nn.compact
    def __call__(self, x, *, train: bool = False, planes: bool = False):
        fold = self.supports_planes(x.shape)
        feats = UNetEncoder(self.base, dtype=self.dtype, fold=fold,
                            name="encoder")(x, train=train)
        out1 = UNetDecoder(self.base, self.n_classes, dtype=self.dtype,
                           fold=fold, name="decoder1")(feats, train=train,
                                                       planes=fold and planes)
        out2 = UNetDecoder(self.base, self.n_classes, dtype=self.dtype,
                           fold=fold, name="decoder2")(feats, train=train,
                                                       planes=fold and planes)
        return out1, out2


class UNetAttention(nn.Module):
    """U-Net with attention gates applied to each skip before the Up block."""

    n_channels: int
    n_classes: int
    base: int = 64
    dropout: bool = False
    dropout_p: float = 0.5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        b = self.base
        x1, x2, x3, x4, x5 = UNetEncoder(
            b, self.dropout, self.dropout_p, dtype=self.dtype, name="encoder"
        )(x, train=train)

        att4 = AttentionGate(b * 4, dtype=self.dtype, name="att4")
        att3 = AttentionGate(b * 2, dtype=self.dtype, name="att3")
        att2 = AttentionGate(b, dtype=self.dtype, name="att2")
        att1 = AttentionGate(b // 2, dtype=self.dtype, name="att1")

        x4a = att4(x5, x4, train=train)
        x = Up(b * 8, self.dropout, self.dropout_p, dtype=self.dtype, name="up1")(
            x5, x4a, train=train)
        x3a = att3(x, x3, train=train)
        x = Up(b * 4, self.dropout, self.dropout_p, dtype=self.dtype, name="up2")(
            x, x3a, train=train)
        x2a = att2(x, x2, train=train)
        x = Up(b * 2, self.dropout, self.dropout_p, dtype=self.dtype, name="up3")(
            x, x2a, train=train)
        x1a = att1(x, x1, train=train)
        x = Up(b, self.dropout, self.dropout_p, dtype=self.dtype, name="up4")(
            x, x1a, train=train)
        return OutConv(self.n_classes, dtype=self.dtype, name="outc")(x)


def build_model(model_type: str, *, n_channels: int, n_classes: int, base: int = 64,
                dropout: bool = False, dropout_p: float = 0.5,
                dtype=jnp.float32, **kw):
    """Model factory for the UNet family (TransUnet/CLTR have their own builders).

    Mirrors the reference's model_type dispatch (/root/reference/train.py:190-295),
    including constructing the `attention` model that the reference forgets to build
    (train.py:267-271 — latent bug there; capability honoured here).
    """
    n_in = resolve_channels(n_channels)
    if model_type in ("single", "regression", "TransUnet_unet_fallback"):
        return UNet(n_in, n_classes, base, dropout, dropout_p, dtype=dtype, **kw)
    if model_type in ("multi_task", "multi_task_reg"):
        return UNetMultitask(n_in, n_classes, base, dropout, dropout_p,
                             dtype=dtype, **kw)
    if model_type == "attention":
        kw.pop("fold", None)  # attention gates read the skip unfolded
        return UNetAttention(n_in, n_classes, base, dropout, dropout_p,
                             dtype=dtype, **kw)
    raise ValueError(f"Invalid model_type {model_type!r}")
