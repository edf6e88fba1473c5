"""Real-chip validation of the dropout-flash kernel + CLTR A/B.

With hw_prng (the TPU default) the keep mask comes from the hardware PRNG
seeded per (bh, q-tile, k-tile); this dumps the same bits through a
mask-dump kernel with identical seeding/tiling and checks the fused
forward/backward against an einsum oracle using that mask — proving the
fwd and both backward passes regenerate identical masks on real silicon.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from unet_torch_tpu.kernels import attention as A  # noqa: E402


def dump_hw_mask(bh_n, nq, nk, seed, rate):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bq, bk = A._dfa_blocks(nq, nk)
    bq = min(bq, A._ceil_to(nq, 8))
    bk = min(bk, A._ceil_to(nk, 128))
    nq_p, nk_p = A._ceil_to(nq, bq), A._ceil_to(nk, bk)
    nqt, nkt = nq_p // bq, nk_p // bk
    thr = min(int(rate * 2 ** 32), 2 ** 32 - 1)

    def kernel(seed_ref, o_ref):
        i, qi, ki = pl.program_id(0), pl.program_id(1), pl.program_id(2)
        pltpu.prng_seed(A._tile_seed_scalar(seed_ref[0], i, qi, ki,
                                            nqt, nkt))
        bits = pltpu.bitcast(pltpu.prng_random_bits((bq, bk)), jnp.uint32)
        o_ref[0] = (bits >= jnp.uint32(thr)).astype(jnp.float32)

    out = pl.pallas_call(
        kernel, grid=(bh_n, nqt, nkt),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((1, bq, bk), lambda i, qi, ki: (i, qi, ki),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh_n, nq_p, nk_p), jnp.float32),
    )(seed.reshape(1).astype(jnp.uint32))
    return out[:, :nq, :nk]


def main():
    rng = np.random.RandomState(0)
    b, h, nq, nk, d = 2, 4, 300, 300, 32
    q = jnp.asarray(rng.randn(b, h, nq, d), jnp.float32)
    k = jnp.asarray(rng.randn(b, h, nk, d), jnp.float32)
    v = jnp.asarray(rng.randn(b, h, nk, d), jnp.float32)
    seed = jnp.uint32(77)
    scale = d ** -0.5
    rate = 0.1

    mask = dump_hw_mask(b * h, nq, nk, seed, rate).reshape(b, h, nq, nk)
    print("hw keep frac:", float(mask.mean()), "(expect ~%.2f)" % (1 - rate))

    def oracle(q, k, v):
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                       preferred_element_type=jnp.float32) * scale
        p = jax.nn.softmax(s, axis=-1)
        p = p * mask / (1.0 - rate)
        return jnp.einsum("bhqk,bhkd->bhqd", p, v,
                          preferred_element_type=jnp.float32)

    out = A.dropout_flash_attention(q, k, v, seed, scale, rate)
    ref = oracle(q, k, v)
    print("TPU fwd max err:", float(jnp.abs(out - ref).max()))

    gk = jax.grad(lambda q, k, v: (A.dropout_flash_attention(
        q, k, v, seed, scale, rate) ** 2).sum(), argnums=(0, 1, 2))(q, k, v)
    go = jax.grad(lambda q, k, v: (oracle(q, k, v) ** 2).sum(),
                  argnums=(0, 1, 2))(q, k, v)
    for n, a, b_ in zip("qkv", gk, go):
        print(f"TPU grad d{n} max err: {float(jnp.abs(a - b_).max()):.3e}"
              f"  ref max {float(jnp.abs(b_).max()):.2f}")

    import bench

    print("cltr bf16 b8 hw-prng: %.2f img/s"
          % bench.tpu_cltr(batch=8, steps=10), flush=True)


if __name__ == "__main__":
    main()
