"""2x2/stride-2 max pooling with a fast custom VJP.

XLA lowers the gradient of reduce_window-max to `select_and_scatter`, a
serial-ish op that costs ~3.5% of the UNet train step (profiler, BASELINE.md).
For the non-overlapping 2x2/stride-2 case the window structure is a pure
reshape: forward is a max over a (2, 2) axis pair, and the backward routes the
cotangent to the FIRST maximal element of each window (row-major) — exactly
torch MaxPool2d / XLA select_and_scatter semantics — using an equality mask
with a cumulative-first trick.  Everything is elementwise + reshapes: no
select_and_scatter anywhere.

Odd trailing rows/columns are dropped (torch floor mode / reference
MaxPool2d(2), Model.py:36).

MEASURED (r1): end-to-end this is *slower* than nn.max_pool on the UNet bench
(68.0 vs 77.0 img/s) — the window transposes in the backward cost more than
select_and_scatter under the current activation layouts.  Kept as an
oracle-verified experiment (exact first-tie gradient parity incl. ReLU zeros);
NOT wired into the model blocks.  Revisit with the r2 layout work.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _window_view(x):
    b, h, w, c = x.shape
    x = x[:, : h // 2 * 2, : w // 2 * 2, :]
    return x.reshape(b, h // 2, 2, w // 2, 2, c)


@jax.custom_vjp
def max_pool_2x2(x):
    """(B, H, W, C) -> (B, H//2, W//2, C), max over 2x2 stride-2 windows."""
    v = _window_view(x)
    return jnp.max(v, axis=(2, 4))


def _fwd(x):
    v = _window_view(x)
    out = jnp.max(v, axis=(2, 4))
    return out, (x.shape, v, out)


def _bwd(res, g):
    x_shape, v, out = res
    b, h, w, c = x_shape
    # windows flattened row-major: (B, H2, W2, 4, C)
    flat = v.transpose(0, 1, 3, 2, 4, 5).reshape(
        b, h // 2, w // 2, 4, c)
    eq = (flat == out[:, :, :, None, :])
    first = eq & (jnp.cumsum(eq, axis=3) == 1)  # first max per window
    dx_flat = jnp.where(first, g[:, :, :, None, :], 0).astype(g.dtype)
    dx = dx_flat.reshape(b, h // 2, w // 2, 2, 2, c).transpose(
        0, 1, 3, 2, 4, 5).reshape(b, h // 2 * 2, w // 2 * 2, c)
    if h % 2 or w % 2:
        dx = jnp.pad(dx, ((0, 0), (0, h % 2), (0, w % 2), (0, 0)))
    return (dx,)


max_pool_2x2.defvjp(_fwd, _bwd)
