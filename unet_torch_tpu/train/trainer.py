"""Trainer — epoch driver around the jit'd step functions.

Capability parity with /root/reference/Trainer.py (one class, five loops,
dispatch at Trainer.py:113-129), with the same run artifacts:

  * append-only ``logs.txt`` per run (Trainer.py:666-667)
  * loss/accuracy twin-axis curve ``total.png`` (+ ``bce.png``/``mse.png`` for the
    multitask loops) (Trainer.py:52-111)
  * checkpoints ``models/epoch{N}.pt``, ``models/best.pt``,
    ``models/last_epoch.pt`` (Trainer.py:761-765,808-809)
  * early stopping after ``patience`` non-improving epochs (Trainer.py:768)
  * per-iteration poly LR decay when ``adaptive_lr`` (Trainer.py:722-725)
  * per-epoch wall-time + running mean (Trainer.py:792-807)

TPU-first differences: the batch loop is a stream of donated jit-step calls (no
`.item()` sync per batch — losses are fetched once per epoch), the device memory
readout comes from `device.memory_stats()`, and metric bookkeeping is host-side
numpy.  Two reference latent bugs are fixed, not replicated: the `dice_score`
best-model comparison direction (Trainer.py:752 never saves for higher-better
metrics) and the ratio-loop plateau scheduler stepping on a constant
(Trainer.py:1284).
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from unet_torch_tpu import ckpt
from unet_torch_tpu.core.mesh import shard_batch
from unet_torch_tpu.losses import TOPO_LOSSES
from unet_torch_tpu.core.rng import RngStream
from unet_torch_tpu.train.optim import ReduceLROnPlateau, make_optimizer, poly_lr
from unet_torch_tpu.train.state import TrainState
from unet_torch_tpu.train.steps import (
    make_multitask_steps,
    make_single_steps,
    make_topo_steps,
)

# Trainer.py:115's warm-up dispatch names (superset of the calc_loss keys)
TOPO_LOSS_NAMES = TOPO_LOSSES | {"TopoCount2", "TopoLoss2"}


def _with_placement(new_tree, ref_tree):
    """Place each host-numpy leaf of ``new_tree`` with the sharding of the
    matching leaf in ``ref_tree`` (identity for leaves without one)."""
    return jax.tree_util.tree_map(
        lambda n, r: (jax.device_put(n, r.sharding)
                      if hasattr(r, "sharding") else n),
        new_tree, ref_tree)


def _device_mem() -> str:
    try:
        stats = jax.devices()[0].memory_stats() or {}
        used = stats.get("bytes_in_use", 0) / 1e9
        lim = stats.get("bytes_limit", 0) / 1e9
        return f"{used:.3g}G/{lim:.3g}G"
    except Exception:
        return "n/a"


class Trainer:
    def __init__(self, model, model_type, mesh, output_save_dir, dataloaders,
                 batch_size, optimizer_name, lr_rate, weight_decay, patience,
                 num_epochs, loss_function, accuracy_metric, num_classes,
                 lr_scheduler=None, start_epoch=1, seed=0, relu_output=None,
                 fused_head=False, topo_pair_downsample=1):
        self.model = model
        self.model_type = model_type
        self.mesh = mesh
        self.output_save_dir = output_save_dir
        self.dataloader = dataloaders
        self.batch_size = batch_size
        self.patience = patience
        self.num_epochs = num_epochs
        self.loss_function = loss_function
        self.accuracy_metric = accuracy_metric
        self.num_classes = num_classes
        self.adaptive_lr = bool(lr_scheduler)
        self.start_epoch = start_epoch
        self.base_lr = lr_rate
        self.optimizer_name = optimizer_name
        self.weight_decay = weight_decay
        self.rng = RngStream(jax.random.key(seed))
        if relu_output is None:
            relu_output = model_type in ("regression", "regression_t")
        self.relu_output = relu_output
        self.fused_head = fused_head
        self.topo_pair_downsample = topo_pair_downsample

        self.iter_num = 0
        self.max_iterations = num_epochs * max(1, len(dataloaders["train"]))
        self.best_loss = 1e15
        higher_better = accuracy_metric in ("dice_score", "dice_score_mc")
        self.higher_better = higher_better
        self.best_val_score = -1e15 if higher_better else 1e15
        self.early_stop_counter = 0
        self.train_loss_list, self.val_loss_list = [], []
        self.val_score_list = []
        self.train_loss_list_1, self.val_loss_list_1 = [], []
        self.train_loss_list_2, self.val_loss_list_2 = [], []

        self.save_dir_model = os.path.join(output_save_dir, "models")
        os.makedirs(self.save_dir_model, exist_ok=True)
        self.state = None
        self.best_payload = None

    # ------------------------------------------------------------------ utils

    def _log(self, *lines):
        from unet_torch_tpu.core.dist import is_main

        if not is_main():  # one process owns logs.txt (ref save_on_master)
            return
        path = os.path.join(self.output_save_dir, "logs.txt")
        with open(path, "a") as f:
            for ln in lines:
                print(ln)
                f.write(str(ln) + "\n")

    def _init_state(self, tx, sample_x, extra_params=None):
        init_rng = self.rng.next()
        variables = self.model.init(init_rng, jnp.asarray(sample_x[:1]),
                                    train=False)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        if extra_params is not None:
            params = {"model": params, **extra_params}
        state = TrainState.create(params, batch_stats, tx)
        if (self.mesh.shape.get("model", 1) > 1
                and self.model_type in ("TransUnet", "regression_t",
                                        "multi_task_regTU", "multitask_em",
                                        "CLTR")):
            # mesh: {model: M>1} on a transformer family → Megatron tensor
            # parallelism: block projections shard over 'model', GSPMD
            # inserts the per-block all-reduces (parallel/tensor.py).
            from unet_torch_tpu.parallel.tensor import shard_state_tp

            state = shard_state_tp(self.mesh, state, tx)
        return state

    def _current_lr(self):
        if self.adaptive_lr:
            return poly_lr(self.base_lr, self.iter_num, self.max_iterations)
        return self._lr

    def _save_best(self, epoch):
        from unet_torch_tpu.core.dist import is_main

        params = self.state.params
        if isinstance(params, dict) and "model" in params:
            payload_params = params["model"]
        else:
            payload_params = params
        self.best_payload = {
            "params": jax.device_get(payload_params),
            "batch_stats": jax.device_get(self.state.batch_stats),
        }
        if not is_main():
            return
        for name in (f"epoch{epoch}.pt", "best.pt"):
            ckpt.save_weights(os.path.join(self.save_dir_model, name),
                              self.best_payload["params"],
                              self.best_payload["batch_stats"])

    def _save_last(self):
        from unet_torch_tpu.core.dist import is_main

        if not is_main():
            return
        params = self.state.params
        if isinstance(params, dict) and "model" in params:
            params = params["model"]
        ckpt.save_weights(os.path.join(self.save_dir_model, "last_epoch.pt"),
                          params, self.state.batch_stats)

    def _restore_best(self):
        if self.best_payload is not None:
            from flax import serialization

            params = self.state.params
            if isinstance(params, dict) and "model" in params:
                restored = serialization.from_state_dict(
                    params["model"], self.best_payload["params"])
                params = dict(params, model=restored)
            else:
                params = serialization.from_state_dict(
                    params, self.best_payload["params"])
            bs = serialization.from_state_dict(self.state.batch_stats,
                                               self.best_payload["batch_stats"])
            # the payload is host numpy (jax.device_get at save time) —
            # re-place each restored leaf with the live state's sharding so
            # post-restore eval keeps the mesh placement (tp shards stay
            # shards, replicated params stay replicated)
            params = _with_placement(params, self.state.params)
            bs = _with_placement(bs, self.state.batch_stats)
            self.state = self.state.replace(params=params, batch_stats=bs)

    def plot_loss_functions(self, name):
        from unet_torch_tpu.core.dist import is_main

        if not is_main():
            return
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        if not self.train_loss_list or not self.val_loss_list:
            return
        epochs = np.arange(len(self.train_loss_list))
        fig, ax1 = plt.subplots(figsize=(10, 5))
        ax1.set_xlabel("Epoch")
        ax1.set_ylabel("Loss", color="tab:blue")
        ax1.plot(epochs, self.train_loss_list, label="Train Loss",
                 color="tab:blue", linestyle="-")
        ax1.plot(np.arange(len(self.val_loss_list)), self.val_loss_list,
                 label="Val Loss", color="tab:orange", linestyle="--")
        ax1.tick_params(axis="y", labelcolor="tab:blue")
        ax1.set_ylim(0, max(max(self.train_loss_list),
                            max(self.val_loss_list), 1.0))
        ax2 = ax1.twinx()
        ax2.set_ylabel("Accuracy", color="tab:red")
        ax2.plot(np.arange(len(self.val_score_list)), self.val_score_list,
                 label="Val Accuracy", color="tab:red", linestyle=":")
        ax2.tick_params(axis="y", labelcolor="tab:red")
        lines, labels = ax1.get_legend_handles_labels()
        lines2, labels2 = ax2.get_legend_handles_labels()
        ax1.legend(lines + lines2, labels + labels2, loc="center right")
        plt.title("Training Progress")
        plt.grid(True)
        fig.tight_layout()
        fig.savefig(os.path.join(self.output_save_dir, f"{name}.png"))
        plt.close(fig)

        for series_t, series_v, fname in (
                (self.train_loss_list_1, self.val_loss_list_1, "bce"),
                (self.train_loss_list_2, self.val_loss_list_2, "mse")):
            if series_t:
                plt.figure(figsize=(8, 4))
                plt.xlabel("epoch")
                plt.ylabel("loss")
                plt.plot(np.arange(len(series_t)), series_t,
                         label="train loss")
                plt.plot(np.arange(len(series_v)), series_v, label="val loss")
                plt.grid(True)
                plt.legend()
                plt.savefig(os.path.join(self.output_save_dir, f"{fname}.png"))
                plt.close()

    # ------------------------------------------------------------------ train

    def train(self):
        """Dispatch mirroring Trainer.py:113-129."""
        if self.model_type in ("single", "TransUnet", "regression",
                               "regression_t", "attention"):
            if self.loss_function in TOPO_LOSS_NAMES:
                return self.single_train_wup()
            return self.single_train()
        if self.model_type in ("multi_task", "multi_task_reg",
                               "multi_task_regTU"):
            if self.loss_function == "multi_task_loss":
                return self.multi_task_uc_train()
            if self.loss_function == "multi_task_loss_ratio":
                return self.multi_task_train_ratio()
            return self.multi_task_train()
        if self.model_type == "CLTR":
            return self.cltr_train()
        raise ValueError(f'Invalid model_type "{self.model_type}"')

    # -------------------------------------------------- single-head training

    def single_train(self):
        tx = make_optimizer(self.optimizer_name, self.base_lr,
                            self.weight_decay)
        self._lr = self.base_lr
        train_step, eval_step = make_single_steps(
            self.model, tx, self.loss_function, self.accuracy_metric,
            self.num_classes, relu_output=self.relu_output,
            fused_head=self.fused_head)

        totaltime = 0.0
        for epoch in range(self.start_epoch, self.num_epochs + 1):
            self._log(f"Epoch {epoch}/{self.num_epochs}", "-" * 10)
            since = time.time()

            # ---- train phase (device-prefetched: H2D overlaps compute)
            self._log(f"LR {self._current_lr()}")
            losses = []
            from unet_torch_tpu.core.mesh import prefetch_to_device

            def _init_wrap(it):
                for batch in it:
                    if self.state is None:
                        self.state = self._init_state(tx, batch[0])
                    yield batch

            for xb, yb in prefetch_to_device(
                    _init_wrap(self.dataloader["train"]), self.mesh):
                self.state, loss = train_step(self.state, xb, yb,
                                              self._current_lr(),
                                              self.rng.next())
                self.iter_num += 1
                losses.append(loss)
            epoch_loss = float(np.mean([np.asarray(l) for l in losses]))
            time_elapsed = time.time() - since
            totaltime += time_elapsed
            mean_epoch = totaltime / max(1, epoch - self.start_epoch + 1)
            self.train_loss_list.append(epoch_loss)
            self._log(
                "Training Time for this epoch: {:.0f}m {:.0f}s".format(
                    time_elapsed // 60, time_elapsed % 60),
                f"Train loss on epoch {epoch}: {epoch_loss}",
                "Current mean training time per epoch: {:.0f}m {:.0f}s".format(
                    mean_epoch // 60, mean_epoch % 60),
                f"device memory: {_device_mem()}")
            self._save_last()

            # ---- val phase
            vlosses, vscores = [], []
            for x, y in self.dataloader["val"]:
                batch = shard_batch(self.mesh, (jnp.asarray(x), jnp.asarray(y)))
                loss, score, _ = eval_step(self.state, batch[0], batch[1])
                vlosses.append(loss)
                vscores.append(score)
            val_loss = float(np.mean([np.asarray(l) for l in vlosses]))
            val_score = float(np.mean([np.asarray(s) for s in vscores]))
            self.val_loss_list.append(val_loss)
            self.val_score_list.append(val_score)
            self._log(f"Val loss on epoch {epoch}: {val_loss}",
                      f"Val score on epoch {epoch}: {val_score}")

            improved = (val_score > self.best_val_score if self.higher_better
                        else val_score < self.best_val_score)
            if improved:
                self.early_stop_counter = 0
                self.best_val_score = val_score
                self.best_loss = val_loss
                self._log("saving best model")
                self._save_best(epoch)
            else:
                self.early_stop_counter += 1
            if self.early_stop_counter > self.patience:
                self._log("Early stopping",
                          f"Best val loss: {self.best_loss:4f}",
                          f"Best val score: {self.best_val_score:4f}")
                self._restore_best()
                self.plot_loss_functions("total")
                return self

        self._log(f"Best val loss: {self.best_loss:4f}",
                  f"Best val score: {self.best_val_score:4f}")
        self.plot_loss_functions("total")
        self._restore_best()
        return self

    # ------------------------------------------- topo warm-up training (wup)

    def single_train_wup(self):
        """Trainer.py:291-479: epochs <=5 train with dice_bce, then the topo
        loss against (labels, gt_dot); val scored by MRAccuracy; best model
        requires epoch > 10."""
        from unet_torch_tpu.eval.metrics import mr_accuracy

        tx = make_optimizer(self.optimizer_name, self.base_lr,
                            self.weight_decay)
        self._lr = self.base_lr
        (warm_step, warm_eval), (topo_step, topo_eval), TopoPipeline = \
            make_topo_steps(self.model, tx, self.loss_function,
                            self.num_classes, relu_output=self.relu_output,
                            fused_head=self.fused_head,
                            pair_downsample=self.topo_pair_downsample)

        totaltime = 0.0
        for epoch in range(self.start_epoch, self.num_epochs + 1):
            self._log(f"Epoch {epoch}/{self.num_epochs}", "-" * 10)
            since = time.time()
            topo_phase = epoch > 5
            # pipelined topo phase: host PH pairing of batch k overlaps the
            # device update of batch k-1 (one-step-stale pairing indices)
            pipe = TopoPipeline() if topo_phase else None
            step = (pipe.step if topo_phase else warm_step)
            eval_step = topo_eval if topo_phase else warm_eval

            self._log(f"LR {self._current_lr()}")
            losses = []
            for x, y, gt_dot in self.dataloader["train"]:
                if self.state is None:
                    self.state = self._init_state(tx, x)
                b = shard_batch(self.mesh, tuple(jnp.asarray(a)
                                                 for a in (x, y, gt_dot)))
                self.state, loss = step(self.state, b[0], b[1], b[2],
                                        self._current_lr(), self.rng.next())
                self.iter_num += 1
                if loss is not None:
                    losses.append(loss)
            if pipe is not None:
                self.state, drained = pipe.flush(self.state)
                losses.extend(drained)
            epoch_loss = float(np.mean([np.asarray(l) for l in losses]))
            time_elapsed = time.time() - since
            totaltime += time_elapsed
            self.train_loss_list.append(epoch_loss)
            self._log(f"Train loss on epoch {epoch}: {epoch_loss}",
                      "Training Time for this epoch: {:.0f}m {:.0f}s".format(
                          time_elapsed // 60, time_elapsed % 60))
            self._save_last()

            vlosses, vscores = [], []
            for x, y, gt_dot in self.dataloader["val"]:
                b = shard_batch(self.mesh, tuple(jnp.asarray(a)
                                                 for a in (x, y, gt_dot)))
                loss, out = eval_step(self.state, b[0], b[1], b[2])
                vlosses.append(loss)
                vscores.append(mr_accuracy(np.asarray(out), np.asarray(gt_dot)))
            val_loss = float(np.mean([np.asarray(l) for l in vlosses]))
            val_score = float(np.mean(vscores)) if vscores else 0.0
            self.val_loss_list.append(val_loss)
            self.val_score_list.append(val_score)
            self._log(f"Val loss on epoch {epoch}: {val_loss}",
                      f"Val score on epoch {epoch}: {val_score}")

            if val_loss < self.best_loss and epoch > 10:
                self.early_stop_counter = 0
                self.best_val_score = val_score
                self.best_loss = val_loss
                self._log("saving best model")
                self._save_best(epoch)
            else:
                self.early_stop_counter += 1
            if self.early_stop_counter > self.patience:
                self._log("Early stopping")
                self._restore_best()
                self.plot_loss_functions("total")
                return self

        self.plot_loss_functions("total")
        self._restore_best()
        return self

    # ------------------------------------------------------ multitask loops

    def _multi_task_loop(self, combine: str, optimizer_name=None, lr=None):
        optimizer_name = optimizer_name or self.optimizer_name
        lr = lr if lr is not None else self.base_lr
        tx = make_optimizer(optimizer_name, lr,
                            0.0 if combine == "uncertainty"
                            else self.weight_decay)
        self._lr = lr
        self.base_lr = lr
        train_step, eval_step = make_multitask_steps(
            self.model, tx, self.loss_function, self.num_classes,
            combine=combine, fused_head=self.fused_head)
        plateau = (ReduceLROnPlateau(lr) if combine == "ratio"
                   and not self.adaptive_lr else None)

        for epoch in range(self.start_epoch, self.num_epochs + 1):
            self._log(f"Epoch {epoch}/{self.num_epochs}", "-" * 10)
            since = time.time()
            use_ratio = jnp.asarray(epoch > 5)

            self._log(f"LR {self._current_lr()}")
            losses, l1s, l2s = [], [], []
            for x, (y1, y2) in self.dataloader["train"]:
                if self.state is None:
                    extra = ({"log_vars": jnp.zeros((2,), jnp.float32)}
                             if combine == "uncertainty" else None)
                    self.state = self._init_state(tx, x, extra)
                b = shard_batch(self.mesh, tuple(jnp.asarray(a)
                                                 for a in (x, y1, y2)))
                self.state, loss, l1, l2 = train_step(
                    self.state, b[0], b[1], b[2], self._current_lr(),
                    self.rng.next(), use_ratio)
                self.iter_num += 1
                losses.append(loss)
                l1s.append(l1)
                l2s.append(l2)
            epoch_loss = float(np.mean([np.asarray(l) for l in losses]))
            self.train_loss_list.append(epoch_loss)
            self.train_loss_list_1.append(
                float(np.mean([np.asarray(l) for l in l1s])))
            self.train_loss_list_2.append(
                float(np.mean([np.asarray(l) for l in l2s])))
            if combine == "uncertainty":
                log_vars = np.asarray(self.state.params["log_vars"])
                stds = np.exp(log_vars) ** 0.5
                self._log(f"sigmas: {stds.tolist()}")
            time_elapsed = time.time() - since
            self._log(f"Train loss on epoch {epoch}: {epoch_loss}",
                      "Training Time for this epoch: {:.0f}m {:.0f}s".format(
                          time_elapsed // 60, time_elapsed % 60))
            self._save_last()

            vlosses, v1s, v2s = [], [], []
            for x, (y1, y2) in self.dataloader["val"]:
                b = shard_batch(self.mesh, tuple(jnp.asarray(a)
                                                 for a in (x, y1, y2)))
                loss, l1, l2, _, _ = eval_step(self.state, b[0], b[1], b[2],
                                               use_ratio)
                vlosses.append(loss)
                v1s.append(l1)
                v2s.append(l2)
            val_loss = float(np.mean([np.asarray(l) for l in vlosses]))
            if combine == "ratio" and epoch <= 5:
                continue  # Trainer.py:1280-1281
            if plateau is not None:
                self._lr = plateau.step(val_loss)
            self.val_loss_list.append(val_loss)
            self.val_loss_list_1.append(
                float(np.mean([np.asarray(l) for l in v1s])))
            self.val_loss_list_2.append(
                float(np.mean([np.asarray(l) for l in v2s])))
            self.val_score_list.append(val_loss)
            self._log(f"Val loss on epoch {epoch}: {val_loss}")

            if val_loss < self.best_val_score:
                self.early_stop_counter = 0
                self.best_val_score = val_loss
                self.best_loss = val_loss
                self._log("saving best model")
                self._save_best(epoch)
            else:
                self.early_stop_counter += 1
            if self.early_stop_counter > self.patience:
                self._log("Early stopping")
                self._restore_best()
                self.plot_loss_functions("total")
                return self

        self.plot_loss_functions("total")
        self._restore_best()
        return self

    def multi_task_train(self):
        self.best_val_score = 1e15
        return self._multi_task_loop("sum")

    def multi_task_uc_train(self):
        # Trainer.py:1003-1009 — fresh Adam(5e-4) over params + log-vars.
        self.best_val_score = 1e15
        return self._multi_task_loop("uncertainty", optimizer_name="Adam",
                                     lr=5e-4)

    def multi_task_train_ratio(self):
        self.best_val_score = 1e15
        return self._multi_task_loop("ratio")

    # ------------------------------------------------------------------ CLTR

    def cltr_train(self):
        from unet_torch_tpu.train.cltr_loop import cltr_train_loop

        return cltr_train_loop(self)
