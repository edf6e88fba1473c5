"""Checkpointing — reference artifact contract, JAX-native format.

The reference saves raw ``state_dict`` blobs as ``models/epoch{N}.pt``,
``best.pt`` and ``last_epoch.pt`` (/root/reference/Trainer.py:761-765,808-809) and
resumes by loading weights plus a config-specified start epoch
(/root/reference/train.py:298-300).  We keep the directory/file naming contract
(so downstream tooling finds the same files) but the payload is a flax msgpack
pytree: ``{'params': ..., 'batch_stats': ..., 'extra': ...}``.

Beyond the reference's capability, ``save_full``/``restore_full`` also persist
optimizer state + step for exact resume (the reference loses optimizer momentum
across restarts).
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
from flax import serialization


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_weights(path: str, params: Any, batch_stats: Any = None,
                 extra: Any = None) -> None:
    payload = {"params": _to_host(params),
               "batch_stats": _to_host(batch_stats) if batch_stats is not None
               else {},
               "extra": _to_host(extra) if extra is not None else {}}
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(payload))


def load_weights(path: str) -> dict:
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def restore_into(state, payload: dict):
    """Shape-checked restore of a saved payload into a TrainState."""
    params = serialization.from_state_dict(state.params, payload["params"])
    bs = serialization.from_state_dict(state.batch_stats,
                                       payload.get("batch_stats", {}))
    return state.replace(params=params, batch_stats=bs)


def save_full(path: str, state) -> None:
    payload = {"params": _to_host(state.params),
               "batch_stats": _to_host(state.batch_stats),
               "opt_state": serialization.to_state_dict(_to_host(state.opt_state)),
               "step": int(state.step)}
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(payload))


def restore_full(path: str, state):
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    import jax.numpy as jnp

    params = serialization.from_state_dict(state.params, payload["params"])
    bs = serialization.from_state_dict(state.batch_stats, payload["batch_stats"])
    opt_state = serialization.from_state_dict(state.opt_state,
                                              payload["opt_state"])
    return state.replace(params=params, batch_stats=bs, opt_state=opt_state,
                         step=jnp.asarray(payload["step"], jnp.int32))
