"""r8c: merged single-pass flash backward A/B on the real chip (scan-chained)
plus whole-K unpacked forward timing (settles whether packed2's r8b win was
head packing or just whole-K scheduling).

Writes benchmarks/R8C_BWD1_AB.json incrementally.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from unet_torch_tpu.kernels import attention as A  # noqa: E402
from r8b_attn_scan import chain_time, mk  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "R8C_BWD1_AB.json")
RESULTS = {}


def save(section, payload):
    RESULTS[section] = payload
    with open(OUT, "w") as f:
        json.dump(RESULTS, f, indent=1)
    print(f"== {section}: {json.dumps(payload)}", flush=True)


def bwd_ab(tag, b, h, n, d, rate):
    q, k, v = mk(b, h, n, d)
    scale = d ** -0.5
    seed = jnp.uint32(7)
    res = {}

    def gstep(qc, k, v):
        g = jax.grad(lambda q_, k_, v_: jnp.sum(
            A.dropout_flash_attention(q_, k_, v_, seed, scale, rate)
            .astype(jnp.float32) ** 2), argnums=(0, 1, 2))(qc, k, v)
        return (g[0] + g[1] + g[2]).astype(qc.dtype) * 1e-3

    for name, flag in (("merged", False), ("twopass", True)):
        A._BWD2_ENV = flag
        sec = chain_time(gstep, q, k, v)
        res[f"{name}_fwdbwd_ms"] = round(sec * 1e3, 3)

    # real-chip value check merged vs two-pass (hw PRNG identical seeding)
    A._BWD2_ENV = False
    g1 = jax.grad(lambda q_: jnp.sum(A.dropout_flash_attention(
        q_, k, v, seed, scale, rate).astype(jnp.float32) ** 2))(q)
    A._BWD2_ENV = True
    g2 = jax.grad(lambda q_: jnp.sum(A.dropout_flash_attention(
        q_, k, v, seed, scale, rate).astype(jnp.float32) ** 2))(q)
    A._BWD2_ENV = False
    res["dq_maxdiff"] = float(jnp.abs(
        g1.astype(jnp.float32) - g2.astype(jnp.float32)).max())
    save(tag, res)


def wholek_fwd():
    b, h, n, d = 8, 12, 1024, 64
    q, k, v = mk(b, h, n, d)
    scale = d ** -0.5
    fwd = lambda q, k, v: A._attention_pallas(q, k, v, scale).astype(q.dtype)
    sec = chain_time(fwd, q, k, v)
    save("vit_wholek_unpacked", {"fwd_ms": round(sec * 1e3, 3)})


def main():
    print("devices:", jax.devices(), flush=True)
    bwd_ab("cltr_b16_h8_n2000_d32_r0.1", 16, 8, 2000, 32, 0.1)
    bwd_ab("vit_b8_h12_n1024_d64_r0", 8, 12, 1024, 64, 0.0)
    wholek_fwd()
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
