"""Fused conv3x3 + BatchNorm(affine) + ReLU — Pallas TPU kernel.

The reference's hot block is (conv3x3 -> BN -> ReLU) x2 (Model.py:7-26); the
BASELINE north star names "fused NHWC Pallas conv/norm/activation kernels".
This kernel computes a 3x3 SAME conv as nine shifted (TH*W, Cin)x(Cin, Cout)
MXU matmuls accumulated in VMEM, then applies the folded BN affine and ReLU in
registers before the single HBM write — one read of x, one write of y, zero
materialised intermediates.

Scope: *inference* fusion. Train-mode BN needs global batch statistics (a
cross-batch reduction XLA already fuses well); folding running stats into
(scale, bias) is the standard serving transform:
    scale = gamma / sqrt(var + eps);  bias = beta - mean * scale.

The jnp fallback (`fused_conv3x3_bn_relu_reference`) is the correctness oracle
and the non-TPU path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def fold_bn(gamma, beta, mean, var, eps=1e-5):
    scale = gamma / jnp.sqrt(var + eps)
    return scale, beta - mean * scale


def fused_conv3x3_bn_relu_reference(x, w, scale, bias):
    """x (B,H,W,Cin), w (3,3,Cin,Cout), scale/bias (Cout,)."""
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return jnp.maximum(y * scale + bias, 0.0)


@functools.partial(jax.jit, static_argnames=("th", "interpret"))
def fused_conv3x3_bn_relu_pallas(x, w, scale, bias, th: int = 8,
                                 interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, wdt, cin = x.shape
    cout = w.shape[-1]
    # pad H to a tile multiple plus SAME halos; pad W by the 1-px halo
    h_pad = (-h) % th
    xp = jnp.pad(x, ((0, 0), (1, 1 + h_pad), (1, 1), (0, 0)))
    hp = h + h_pad

    def kernel(x_ref, w_ref, s_ref, b_ref, o_ref):
        acc = jnp.zeros((th * wdt, cout), jnp.float32)
        xt = x_ref[0]  # (th+2, wdt+2, cin)
        for dy in range(3):
            for dx in range(3):
                patch = xt[dy:dy + th, dx:dx + wdt, :].reshape(
                    th * wdt, cin)
                acc += jax.lax.dot_general(
                    patch, w_ref[dy, dx], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
        out = jnp.maximum(acc * s_ref[0] + b_ref[0], 0.0)
        o_ref[0] = out.reshape(th, wdt, cout).astype(o_ref.dtype)

    out = pl.pallas_call(
        kernel,
        grid=(b, hp // th),
        in_specs=[
            # overlapping H tiles (1-row halos): pl.Element gives the
            # index_map element-level starts (TPU requires all dims Element
            # when any is)
            pl.BlockSpec((pl.Element(1), pl.Element(th + 2),
                          pl.Element(wdt + 2), pl.Element(cin)),
                         lambda i, j: (i, j * th, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, cin, cout), lambda i, j: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, wdt, cout), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hp, wdt, cout), x.dtype),
        interpret=interpret,
    )(xp, w, scale.reshape(1, -1), bias.reshape(1, -1))
    return out[:, :h]


@functools.partial(jax.jit, static_argnames=("th", "interpret"))
def fused_conv3x3_bn_relu_pallas_v2(x, w, scale, bias, th: int = 16,
                                    interpret: bool = False):
    """Column-packed variant: three (TH*W, 3*Cin) x (3*Cin, Cout) matmuls
    (K=3*Cin) instead of nine K=Cin ones — deeper MXU contraction.

    NOTE: interpret-mode verified; currently fails Mosaic compilation on the
    real TPU backend (round-2 item) — use v1 or the XLA reference on TPU."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, wdt, cin = x.shape
    cout = w.shape[-1]
    h_pad = (-h) % th
    xp = jnp.pad(x, ((0, 0), (1, 1 + h_pad), (1, 1), (0, 0)))
    hp = h + h_pad
    # w (3,3,cin,cout) -> per-dy (3*cin, cout), dx-major to match the concat
    w2 = w.reshape(3, 3 * cin, cout)

    def kernel(x_ref, w_ref, s_ref, b_ref, o_ref):
        xt = x_ref[0]  # (th+2, wdt+2, cin)
        acc = jnp.zeros((th * wdt, cout), jnp.float32)
        for dy in range(3):
            rows = xt[dy:dy + th]
            packed = jnp.concatenate(
                [rows[:, 0:wdt, :], rows[:, 1:wdt + 1, :],
                 rows[:, 2:wdt + 2, :]], axis=-1).reshape(th * wdt, 3 * cin)
            acc += jax.lax.dot_general(
                packed, w_ref[dy], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        out = jnp.maximum(acc * s_ref[0] + b_ref[0], 0.0)
        o_ref[0] = out.reshape(th, wdt, cout).astype(o_ref.dtype)

    out = pl.pallas_call(
        kernel,
        grid=(b, hp // th),
        in_specs=[
            pl.BlockSpec((pl.Element(1), pl.Element(th + 2),
                          pl.Element(wdt + 2), pl.Element(cin)),
                         lambda i, j: (i, j * th, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3 * cin, cout), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, wdt, cout), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hp, wdt, cout), x.dtype),
        interpret=interpret,
    )(xp, w2, scale.reshape(1, -1), bias.reshape(1, -1))
    return out[:, :h]


def fused_conv3x3_bn_relu(x, w, scale, bias, use_pallas=None,
                          interpret=False):
    if use_pallas is None:
        use_pallas = jax.default_backend() not in ("cpu", "gpu")
    if not use_pallas:
        return fused_conv3x3_bn_relu_reference(x, w, scale, bias)
    return fused_conv3x3_bn_relu_pallas(x, w, scale, bias,
                                        interpret=interpret)
