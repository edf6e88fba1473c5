"""Trace-time analytic FLOP tally for Pallas kernels.

XLA's compiled ``cost_analysis()`` cannot see inside custom calls, so steps
that run their attention inside Pallas kernels (CLTR decoder, TransUnet ViT)
under-report flops and their MFU rows read as lower bounds (BASELINE.md
"Per-family MFU" caveat 2).  The kernel wrapper functions record their
analytic matmul flops here while they are being *traced*; wrapping the first
``.lower()`` of a step in :func:`count_kernel_flops` therefore captures the
exact per-step in-kernel flops (the wrappers run exactly once per trace).

Caveats, stated so the numbers stay honest:
- ``_attention_flash`` is itself jitted: if an identical inner signature was
  already traced earlier in the process, its Python body does not re-run and
  its flops are missed.  Lower the step of interest first in a fresh process
  (benchmarks/mfu.py does).
- Only matmul flops are counted (the MXU work); in-kernel softmax/PRNG/mask
  VPU work is not, matching how XLA's own ``cost_analysis`` treats fusions.
- The auction LSAP and min-plus EDT kernels are iterative compare/add
  solvers with data-dependent trip counts — no meaningful static matmul
  flops; they are deliberately not recorded (the auction custom call is
  0.82 ms of a 120 ms CLTR step, BASELINE.md r4).
"""

from __future__ import annotations

from contextlib import contextmanager

_TALLY: dict | None = None


def record(name: str, flops: float) -> None:
    """Add ``flops`` under ``name`` to the active tally (no-op when inactive).

    Call from kernel *wrapper* bodies (plain Python that runs at trace time),
    never from inside a kernel body.
    """
    if _TALLY is not None:
        _TALLY[name] = _TALLY.get(name, 0.0) + float(flops)


@contextmanager
def count_kernel_flops():
    """Context manager yielding a dict that fills with {kernel_name: flops}
    for every Pallas kernel traced inside the block."""
    global _TALLY
    prev = _TALLY
    _TALLY = {}
    try:
        yield _TALLY
    finally:
        _TALLY = prev
