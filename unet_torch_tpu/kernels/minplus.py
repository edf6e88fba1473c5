"""Min-plus "matmul" Pallas kernel — the core of the exact Euclidean distance
transform used by the Hausdorff DT loss (losses/functional.py).

EDT²(i,j) = min_l [ f(i,l) + (j-l)² ] is a (tropical-semiring) matrix product:
C[i,j] = min_k (A[i,k] + B[k,j]).  The MXU cannot evaluate it (it is not a
ring matmul), so XLA lowers the naive jnp formulation to a large broadcasted
add + reduce that materialises an (M,K,N) intermediate in HBM for big shapes.
This kernel tiles the contraction on the VPU with an on-chip running minimum:
one (TM,K)+(K,TN) read per tile, no 3D intermediate.

Falls back to the jnp formulation off-TPU; the fallback is the test oracle.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def minplus_reference(a, b):
    """C[i,j] = min_k A[i,k] + B[k,j].  a: (M,K), b: (K,N)."""
    return jnp.min(a[:, :, None] + b[None, :, :], axis=1)


def _pad_to(x, m, axis, value):
    pad = (-x.shape[axis]) % m
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


@functools.partial(jax.jit, static_argnames=("tm", "tn", "tk", "interpret"))
def minplus_pallas(a, b, tm=128, tn=128, tk=128, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m0, k0 = a.shape
    n0 = b.shape[1]
    big = float(jnp.finfo(jnp.float32).max) / 4
    a = _pad_to(_pad_to(a.astype(jnp.float32), tm, 0, big), tk, 1, big)
    b = _pad_to(_pad_to(b.astype(jnp.float32), tk, 0, big), tn, 1, big)
    m, k = a.shape
    n = b.shape[1]

    def kernel(a_ref, b_ref, o_ref):
        @pl.when(pl.program_id(2) == 0)
        def _():
            o_ref[:] = jnp.full_like(o_ref, big)

        at = a_ref[:]  # (tm, tk)
        bt = b_ref[:]  # (tk, tn)
        cur = jnp.min(at[:, :, None] + bt[None, :, :], axis=1)
        o_ref[:] = jnp.minimum(o_ref[:], cur)

    out = pl.pallas_call(
        kernel,
        grid=(m // tm, n // tn, k // tk),
        in_specs=[
            pl.BlockSpec((tm, tk), lambda i, j, l: (i, l),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tk, tn), lambda i, j, l: (l, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, l: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        interpret=interpret,
    )(a, b)
    return out[:m0, :n0]


def minplus(a, b, use_pallas=None, interpret=False):
    if use_pallas is None:
        use_pallas = jax.default_backend() not in ("cpu", "gpu")
    if not use_pallas:
        return minplus_reference(a, b)
    return minplus_pallas(a, b, interpret=interpret)
