"""Precision policy.

TPU-first defaults: bfloat16 compute (MXU-native) with float32 parameters and
float32 accumulation.  The reference trains everything in float32
(`/root/reference/train.py:305` — torch.cuda.FloatTensor); we keep an `f32` policy
for bit-parity experiments and use `bf16` for speed.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Precision:
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16
    output_dtype: jnp.dtype = jnp.float32

    @staticmethod
    def bf16() -> "Precision":
        return Precision()

    @staticmethod
    def f32() -> "Precision":
        return Precision(compute_dtype=jnp.float32)


DEFAULT_PRECISION = Precision.f32()  # flipped to bf16 by config `precision: bf16`


def resolve_precision(name: str | None) -> Precision:
    if name in (None, "f32", "float32", "fp32"):
        return Precision.f32()
    if name in ("bf16", "bfloat16"):
        return Precision.bf16()
    raise ValueError(f"Unknown precision {name!r}")
