"""Debug/observability helpers.

check_input — batch-sanity grid dump (parity with /root/reference/
train.py:51-127, minus torchvision's make_grid): saves train_batch.png /
val_batch.png visualising one batch of images and every label tensor.

profile_trace — context manager around jax.profiler.trace; the TPU-native
replacement for the reference's wall-clock-only timing (SURVEY §5), dumping a
TensorBoard-loadable trace of real device timelines.
"""

from __future__ import annotations

import contextlib
import os

import numpy as np


def _to_grid(batch: np.ndarray) -> np.ndarray:
    """(B, H, W[, C]) -> one row of images."""
    batch = np.asarray(batch, np.float32)
    if batch.ndim == 3:
        batch = batch[..., None]
    b, h, w, c = batch.shape
    lo = batch.min(axis=(1, 2, 3), keepdims=True)
    hi = batch.max(axis=(1, 2, 3), keepdims=True)
    batch = (batch - lo) / np.maximum(hi - lo, 1e-6)
    grid = batch.transpose(1, 0, 2, 3).reshape(h, b * w, c)
    if c == 1:
        grid = np.repeat(grid, 3, axis=-1)
    return grid


def check_input(dataloaders, out_dir: str = ".") -> None:
    """Dump the first train/val batch as image grids (ref train.py:51-127)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    for phase in ("train", "val"):
        batch = next(iter(dataloaders[phase]))
        parts = []
        if isinstance(batch, (tuple, list)):
            for item in batch:
                if isinstance(item, (tuple, list)):
                    parts.extend(np.asarray(i) for i in item)
                else:
                    parts.append(np.asarray(item))
        else:
            parts = [np.asarray(batch)]
        print(f"{phase} batch shapes: {[p.shape for p in parts]}")
        rows = [_to_grid(p) for p in parts if p.ndim >= 3]
        fig, axs = plt.subplots(len(rows), 1,
                                figsize=(12, 3 * max(len(rows), 1)))
        if len(rows) == 1:
            axs = [axs]
        for ax, row in zip(axs, rows):
            ax.imshow(np.clip(row, 0, 1))
            ax.axis("off")
        fig.savefig(os.path.join(out_dir, f"{phase}_batch.png"))
        plt.close(fig)


@contextlib.contextmanager
def profile_trace(log_dir: str | None):
    """`with profile_trace('/tmp/trace'):` wraps a training region in a
    jax.profiler trace; no-op when log_dir is falsy."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
