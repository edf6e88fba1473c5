import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from unet_torch_tpu.kernels import attention as A

rng = np.random.RandomState(0)
b, h, nq, nk, d = 2, 4, 300, 300, 32
q = jnp.asarray(rng.randn(b, h, nq, d), jnp.float32)
k = jnp.asarray(rng.randn(b, h, nk, d), jnp.float32)
v = jnp.asarray(rng.randn(b, h, nk, d), jnp.float32)
seed = jnp.uint32(77)
scale = d ** -0.5
rate = 0.1
thr = min(int(rate * 2 ** 32), 2 ** 32 - 1)
nk_p = A._ceil_to(nk, 128)

mask = jnp.stack([A._dropout_keep(seed, jnp.uint32(i), 0, 0, (nq, nk), nk_p, thr)
                  for i in range(b * h)]).astype(jnp.float32).reshape(b, h, nq, nk)

def oracle(q, k, v):
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
    p = jax.nn.softmax(s, axis=-1)
    p = p * mask / (1.0 - rate)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)

out = A.dropout_flash_attention(q, k, v, seed, scale, rate)
ref = oracle(q, k, v)
print("TPU fwd max err:", float(jnp.abs(out - ref).max()))

gk = jax.grad(lambda q, k, v: (A.dropout_flash_attention(q, k, v, seed, scale, rate) ** 2).sum(), argnums=(0, 1, 2))(q, k, v)
go = jax.grad(lambda q, k, v: (oracle(q, k, v) ** 2).sum(), argnums=(0, 1, 2))(q, k, v)
for n, a, b_ in zip("qkv", gk, go):
    print(f"TPU grad d{n} max err: {float(jnp.abs(a - b_).max()):.3e}  ref max {float(jnp.abs(b_).max()):.2f}")

import bench
for bsz, steps in [(16, 8), (32, 5)]:
    print(f"cltr bf16 b{bsz}: %.2f img/s" % bench.tpu_cltr(batch=bsz, steps=steps), flush=True)
