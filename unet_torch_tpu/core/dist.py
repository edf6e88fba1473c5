"""Multi-process (multi-host) helpers — the TPU-pod story.

The reference's distributed layer is dormant NCCL bootstrapping
(/root/reference/CLTR/misc.py:442-464 init_distributed_mode, :410-412
save_on_master) that no entry point ever calls.  The SPMD equivalent needs
almost no code: `jax.distributed.initialize()` once per process, a global
Mesh over all devices, and process-0 guards on host-side artifacts.  Batch
assembly across hosts goes through `jax.make_array_from_process_local_data`
(each host feeds its addressable shard; XLA sees one global array).
"""

from __future__ import annotations

import os

import jax

_initialized = False


def maybe_initialize(force: bool = False) -> bool:
    """Call jax.distributed.initialize() when running under a multi-process
    launcher (TPU pod slices set the coordinator env vars) or when forced by
    config.  Idempotent; returns True if distributed mode is active."""
    global _initialized
    if _initialized:
        return jax.process_count() > 1
    env_says_multi = any(os.environ.get(k) for k in (
        "COORDINATOR_ADDRESS", "JAX_COORDINATOR_ADDRESS",
        "MEGASCALE_COORDINATOR_ADDRESS"))
    if force or env_says_multi:
        jax.distributed.initialize()
        _initialized = True
    return jax.process_count() > 1


def is_main() -> bool:
    """True on the process that owns host-side artifacts (checkpoints, logs,
    CSVs, plots) — the SPMD replacement for the reference's save_on_master
    (CLTR/misc.py:410-412)."""
    return jax.process_index() == 0


def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()
