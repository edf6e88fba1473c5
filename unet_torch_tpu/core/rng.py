"""Deterministic PRNG threading.

The reference seeds python/numpy/torch/cudnn globally
(`/root/reference/train.py:42-49`).  JAX is functional: we seed numpy/python for the
host-side data pipeline and thread explicit `jax.random` keys through everything
on-device, so runs are reproducible per seed *and* independent of execution order.
"""

from __future__ import annotations

import os
import random

import jax
import numpy as np


def seed_everything(seed: int) -> jax.Array:
    """Seed host RNGs and return a root JAX PRNG key for the run."""
    random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    np.random.seed(seed)
    return jax.random.key(seed)


class RngStream:
    """A host-side splitter handing out fresh keys (one per step/epoch/use)."""

    def __init__(self, key: jax.Array):
        self._key = key

    def next(self) -> jax.Array:
        self._key, sub = jax.random.split(self._key)
        return sub

    def fold(self, n: int) -> jax.Array:
        return jax.random.fold_in(self._key, n)
