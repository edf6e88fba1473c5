"""Loss dispatch — reference-compatible string keys (`/root/reference/loss.py:442-516`).

The reference dispatches through a flat if-chain keyed by config string, with a
module-global CLASS_NUMBER injected by train.py (`/root/reference/train.py:163`,
`loss.py:10`).  We keep the same keys (so reference configs work verbatim) but make
the dispatch a table of pure jnp functions, pass num_classes explicitly, and raise
on unknown keys (the reference silently returns an unbound variable — loss.py
latent bug, SURVEY §2.6).

All returned callables are jit-safe: ``calc_loss`` itself may be called inside a
traced train step.
"""

from __future__ import annotations

import functools

from unet_torch_tpu.losses import functional as F
from unet_torch_tpu.losses.functional import (
    active_contour_loss,
    bce_hem_loss,
    bce_loss,
    binary_dice_loss,
    dice_bce_loss,
    dice_bce_mc_loss,
    dice_score,
    euclidean_distance_transform_sq,
    focal_loss,
    focal_tversky_loss,
    hausdorff_dt_loss,
    hausdorff_er_loss,
    l1_loss,
    log_cosh_dice_loss,
    mse_loss,
    mse_mc_loss,
    multiclass_dice_loss,
    multitask_uncertainty_loss,
    rmse_loss,
    sigmoid_bce_with_logits,
    softmax_cross_entropy,
    topk_bce_loss,
)
from unet_torch_tpu.losses.topo import (topo_loss, topocount_loss,
                                        persistence_diagram)

# reference-compat module global (train.py:163 writes loss.CLASS_NUMBER)
CLASS_NUMBER: int = 2


def set_class_number(n: int) -> None:
    global CLASS_NUMBER
    CLASS_NUMBER = int(n)


# Keys marked (mc) consume CLASS_NUMBER / the num_classes argument.
_DISPATCH = {
    "BCE": lambda p, t, w, n: bce_loss(p, t),
    "TopK": lambda p, t, w, n: topk_bce_loss(p, t),
    "BCE_HEM": lambda p, t, w, n: bce_hem_loss(p, t),
    "CE": lambda p, t, w, n: softmax_cross_entropy(p, t, n),
    "FL": lambda p, t, w, n: focal_loss(p, t, gamma=2.0),
    "mse": lambda p, t, w, n: mse_loss(p, t),
    "mseMC": lambda p, t, w, n: mse_mc_loss(p, t),
    "rmse": lambda p, t, w, n: rmse_loss(p, t),
    "l1loss": lambda p, t, w, n: l1_loss(p, t),
    "dice": lambda p, t, w, n: binary_dice_loss(p, t),
    "dice_bce": lambda p, t, w, n: dice_bce_loss(p, t, w),
    "dice_bce_mc": lambda p, t, w, n: dice_bce_mc_loss(p, t, n, w),
    "dice_score": lambda p, t, w, n: dice_score(p, t),
    "dice_score_mc": lambda p, t, w, n: dice_score(p, t, n),
    "log_cosh_dice_loss": lambda p, t, w, n: log_cosh_dice_loss(p, t, n),
    "HausdorffDTLoss": lambda p, t, w, n: hausdorff_dt_loss(p, t),
    "HausdorffERLoss": lambda p, t, w, n: hausdorff_er_loss(p, t),
    "ActiveContourLoss": lambda p, t, w, n: active_contour_loss(p, t),
    "Tversky": lambda p, t, w, n: focal_tversky_loss(p, t, alpha=0.4, beta=0.6),
    # Topological losses — names dispatched by the reference trainer
    # (Trainer.py:115, CLTR/config.json:36-42) whose implementations were deleted
    # from the snapshot; re-created in losses/topo.py.
    "TopoLoss": lambda p, t, w, n: topo_loss(p, t),
    "MyTopoLoss1": lambda p, t, w, n: topo_loss(p, t),
    "MyTopoLoss2": lambda p, t, w, n: topo_loss(p, t),
    "MyTopoLossGraph": lambda p, t, w, n: topo_loss(p, t),
    "MyTopoLossVR": lambda p, t, w, n: topo_loss(p, t),
    # TopoCount is the LOCALIZED flavour (Abousamra-style per-window
    # constraint; target = the dot-annotation map) — distinct from the
    # global Hu-style persistence matching above (topo.py docstrings).
    "TopoCount": lambda p, t, w, n: topocount_loss(p, t),
}

TOPO_LOSSES = {"TopoLoss", "MyTopoLoss1", "MyTopoLoss2", "MyTopoLossGraph",
               "MyTopoLossVR", "TopoCount", "myTopoLoss"}


def calc_loss(pred, target, bce_weight: float = 0.5, loss_type: str = "mse",
              num_classes: int | None = None):
    """String-dispatch loss, signature-compatible with loss.py:442."""
    if loss_type not in _DISPATCH:
        raise KeyError(f"Unknown loss_type {loss_type!r}; known: "
                       f"{sorted(_DISPATCH)}")
    n = num_classes if num_classes is not None else CLASS_NUMBER
    return _DISPATCH[loss_type](pred, target, bce_weight, n)


def get_loss_fn(loss_type: str, num_classes: int, bce_weight: float = 0.5):
    """A closed-over (pred, target) -> scalar callable for use in jit'd steps."""
    if loss_type not in _DISPATCH:
        raise KeyError(f"Unknown loss_type {loss_type!r}")
    return functools.partial(
        calc_loss, bce_weight=bce_weight, loss_type=loss_type,
        num_classes=num_classes)
