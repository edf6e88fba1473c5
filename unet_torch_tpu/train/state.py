"""Train state — a single pytree carried through the jit'd step.

The reference mutates `model`/`optimizer` objects in place (Trainer.py); here the
entire training state is one immutable pytree so the whole step (fwd, loss, bwd,
optimizer, BN stats) compiles into a single XLA program and can be donated
buffer-for-buffer each step.
"""

from __future__ import annotations

from typing import Any

import jax
from flax import struct


@struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jax.Array  # int32 scalar

    @classmethod
    def create(cls, params, batch_stats, tx):
        import jax.numpy as jnp

        return cls(params=params, batch_stats=batch_stats,
                   opt_state=tx.init(params), step=jnp.zeros((), jnp.int32))
