"""U-Net building blocks — Flax, NHWC, TPU-first.

Capability parity with the reference blocks (all cited), but designed for XLA/MXU:
  * NHWC layout (channels-last) so convs tile directly onto the MXU.
  * BatchNorm runs over the *global* batch under pjit (the whole computation is
    expressed globally; XLA lowers the reduction to a cross-chip psum when the batch
    axis is sharded) — no SyncBN machinery needed.
  * Transposed conv k=2 s=2 is expressed as `flax.linen.ConvTranspose`, which XLA
    lowers to an lhs-dilated convolution (no scatter).

Reference blocks:
  DoubleConv  (conv3x3 pad1 no-bias -> BN -> ReLU) x2   /root/reference/Model.py:7-26
  Down        maxpool2 (+opt dropout) -> DoubleConv      /root/reference/Model.py:29-47
  Up          convT k2 s2 C->C/2, pad-to-match, concat skip, (opt dropout), DoubleConv
                                                         /root/reference/Model.py:50-83
  OutConv     1x1 conv to n_classes                      /root/reference/Model.py:86-92
  Attention_block  additive attention gate               /root/reference/Model.py:257-291
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

# torch's kaiming_normal_ default (fan_in, gain=sqrt(2)) used at Model.py:167-169.
kaiming_normal = nn.initializers.variance_scaling(2.0, "fan_in", "normal")


def torch_uniform_init(fan_in: int):
    """U(-1/sqrt(fan_in), 1/sqrt(fan_in)) — torch's default Conv bias init and,
    equivalently, kaiming_uniform_(a=sqrt(5)) for weights (torch _ConvNd
    reset_parameters).  The reference's weights_init (Model.py:167-169) touches
    only nn.Conv2d *weights*, so ConvTranspose2d kernels and every bias keep
    these torch defaults — matched here for trained-outcome parity."""
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def torch_convt_kernel_init(key, shape, dtype=jnp.float32):
    """torch ConvTranspose2d default weight init.

    torch weight shape is (in, out, kH, kW) and _calculate_fan_in_and_fan_out
    takes dim 1 as the input-fmap count, so fan_in = out_channels * kH * kW;
    kaiming_uniform_(a=sqrt(5)) then gives bound = 1/sqrt(fan_in).  Flax kernel
    shape is (kH, kW, in, out) -> fan_in = shape[-1] * prod(spatial)."""
    fan_in = shape[-1] * math.prod(shape[:-2])
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class DoubleConv(nn.Module):
    """(Conv3x3 pad=1 bias=False -> BatchNorm -> ReLU) * 2, optional mid width."""

    features: int
    mid_features: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool):
        mid = self.mid_features or self.features
        for feats in (mid, self.features):
            x = nn.Conv(
                feats,
                (3, 3),
                padding=1,
                use_bias=False,
                kernel_init=kaiming_normal,
                dtype=self.dtype,
            )(x)
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,  # torch BatchNorm2d momentum=0.1 == flax momentum 0.9
                epsilon=1e-5,
                dtype=jnp.float32,  # keep batch stats in f32 even under bf16 compute
            )(x)
            x = nn.relu(x)
        return x


class Down(nn.Module):
    """2x2 max-pool (stride 2), optional dropout, then DoubleConv."""

    features: int
    dropout: bool = False
    dropout_p: float = 0.5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool):
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        if self.dropout:
            x = nn.Dropout(self.dropout_p, deterministic=not train)(x)
        return DoubleConv(self.features, dtype=self.dtype)(x, train=train)


class Up(nn.Module):
    """ConvTranspose k=2 s=2 halving channels, pad to skip size, concat, DoubleConv.

    Channel flow mirrors Model.py:50-83: input C -> up to C/2, concat skip (C/2)
    -> C -> DoubleConv -> out_features.
    """

    features: int
    dropout: bool = False
    dropout_p: float = 0.5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x1, x2, *, train: bool):
        c = x1.shape[-1]
        x1 = nn.ConvTranspose(
            c // 2, (2, 2), strides=(2, 2), dtype=self.dtype,
            kernel_init=torch_convt_kernel_init,
            bias_init=torch_uniform_init((c // 2) * 4),
        )(x1)
        # Pad x1 spatially to match the skip feature (reference pads with F.pad,
        # split as [d//2, d - d//2] per axis: Model.py:69-73).
        dh = x2.shape[1] - x1.shape[1]
        dw = x2.shape[2] - x1.shape[2]
        if dh or dw:
            x1 = jnp.pad(
                x1,
                ((0, 0), (dh // 2, dh - dh // 2), (dw // 2, dw - dw // 2), (0, 0)),
            )
        x = jnp.concatenate([x2, x1], axis=-1)
        if self.dropout:
            x = nn.Dropout(self.dropout_p, deterministic=not train)(x)
        return DoubleConv(self.features, dtype=self.dtype)(x, train=train)


class OutConv(nn.Module):
    """1x1 conv head to n_classes (Model.py:86-92)."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(
            self.features, (1, 1), kernel_init=kaiming_normal,
            bias_init=torch_uniform_init(x.shape[-1]), dtype=self.dtype
        )(x)


class AttentionGate(nn.Module):
    """Additive attention gate (Model.py:257-291).

    q: coarse gating feature (C_q, H, W); x: skip feature (C_x, 2H, 2W).
    up(q) -> W_q, W_x 1x1+BN -> ReLU(Q1+X1) -> psi 1x1+BN+sigmoid -> x * A.
    """

    hidden: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q, x, *, train: bool):
        cq = q.shape[-1]
        q = nn.ConvTranspose(cq, (2, 2), strides=(2, 2), dtype=self.dtype,
                             kernel_init=torch_convt_kernel_init,
                             bias_init=torch_uniform_init(cq * 4))(q)

        def proj(v, feats, name):
            v = nn.Conv(
                feats,
                (1, 1),
                use_bias=True,
                kernel_init=kaiming_normal,
                bias_init=torch_uniform_init(v.shape[-1]),
                dtype=self.dtype,
                name=f"{name}_conv",
            )(v)
            return nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                dtype=jnp.float32,
                name=f"{name}_bn",
            )(v)

        q1 = proj(q, self.hidden, "W_q")
        x1 = proj(x, self.hidden, "W_x")
        e = nn.relu(q1 + x1)
        a = jax.nn.sigmoid(proj(e, 1, "psi"))
        return x * a
