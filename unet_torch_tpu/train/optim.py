"""Optimizers and LR schedules — optax, matched to the reference's semantics.

Reference (/root/reference/train.py:341-356):
  * Adam(lr, weight_decay)  — torch Adam's weight_decay adds wd*param to the
    gradient *before* the Adam update (classic L2, not AdamW).
  * SGD(lr, momentum=0.9, weight_decay)  — torch heavy-ball momentum.
  * Poly LR decay per iteration: base_lr * (1 - iter/max_iter)^0.9 when
    `adaptive_lr` (Trainer.py:722-725).
  * ReduceLROnPlateau(factor=0.5, patience=30, min_lr=1e-5) constructed at
    train.py:349-354 (only ever stepped by the ratio trainer, Trainer.py:1282-1284).

TPU-first: the LR is injected into the jit'd step as a scalar argument (no
recompilation per step), and schedules are computed host-side.
"""

from __future__ import annotations

import optax


def make_optimizer(name: str, lr: float, weight_decay: float = 0.0,
                   momentum: float = 0.9,
                   clip_max_norm: float = 0.0) -> optax.GradientTransformation:
    """Build the torch-semantics optimizer, with LR injected via inject_hyperparams
    so schedules can update it without re-tracing.

    ``clip_max_norm > 0`` prepends global-norm gradient clipping (the
    reference ships `clip_max_norm: 0.1` in CLTR/CLTRconfig.yml:33 but its
    Trainer never applies it — dormant config key; here it is honoured as an
    opt-in, off by default to match the reference's actual behavior)."""
    # clipping lives INSIDE the injected transform: the train steps reach
    # into opt_state.hyperparams to swap the traced LR (steps.py::_set_lr),
    # so the outermost state must stay the inject_hyperparams wrapper.
    if name == "Adam":
        tx = optax.inject_hyperparams(
            _adam_l2, static_args=("weight_decay", "clip_max_norm"))(
            learning_rate=lr, weight_decay=weight_decay,
            clip_max_norm=clip_max_norm)
    elif name == "SGD":
        tx = optax.inject_hyperparams(
            _sgd_momentum, static_args=("weight_decay", "momentum",
                                        "clip_max_norm"))(
            learning_rate=lr, weight_decay=weight_decay, momentum=momentum,
            clip_max_norm=clip_max_norm)
    else:
        raise ValueError(f'Invalid optimizer "{name}"')
    return tx


def _adam_l2(learning_rate, weight_decay, clip_max_norm=0.0):
    return optax.chain(
        optax.clip_by_global_norm(clip_max_norm) if clip_max_norm
        else optax.identity(),
        optax.add_decayed_weights(weight_decay) if weight_decay else
        optax.identity(),
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        optax.scale(-learning_rate),
    )


def _sgd_momentum(learning_rate, weight_decay, momentum,
                  clip_max_norm=0.0):
    return optax.chain(
        optax.clip_by_global_norm(clip_max_norm) if clip_max_norm
        else optax.identity(),
        optax.add_decayed_weights(weight_decay) if weight_decay else
        optax.identity(),
        optax.trace(decay=momentum, nesterov=False),
        optax.scale(-learning_rate),
    )


def poly_lr(base_lr: float, iter_num: int, max_iterations: int,
            power: float = 0.9) -> float:
    """Poly decay (Trainer.py:722-725): base_lr * (1 - it/max_it)^0.9."""
    frac = max(0.0, 1.0 - iter_num / max_iterations)
    return base_lr * frac**power


class ReduceLROnPlateau:
    """Host-side plateau scheduler matching torch's defaults used at
    train.py:349-354 (mode min/max, factor 0.5, patience 30, min_lr 1e-5)."""

    def __init__(self, base_lr: float, mode: str = "min", factor: float = 0.5,
                 patience: int = 30, min_lr: float = 1e-5):
        self.lr = base_lr
        self.mode = mode
        self.factor = factor
        self.patience = patience
        self.min_lr = min_lr
        self.best = None
        self.bad_epochs = 0

    def step(self, metric: float) -> float:
        improved = (self.best is None or
                    (metric < self.best if self.mode == "min" else
                     metric > self.best))
        if improved:
            self.best = metric
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
            if self.bad_epochs > self.patience:
                self.lr = max(self.lr * self.factor, self.min_lr)
                self.bad_epochs = 0
        return self.lr
