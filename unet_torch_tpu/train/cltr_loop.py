"""CLTR training loop (Trainer.cltr_train parity — /root/reference/
Trainer.py:481-661).

Train: weighted sum over the criterion's loss dict (:530-532); val: MAE/MRE via
top-k sigmoid counting at threshold 0.35 over tiled patches (:549-580).
Targets are padded to bucketed max-point counts so the jit cache stays small.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from unet_torch_tpu.models.cltr.criterion import pad_targets
from unet_torch_tpu.train.cltr_steps import make_cltr_steps
from unet_torch_tpu.train.optim import make_optimizer
from unet_torch_tpu.train.state import TrainState


def _bucket(n: int, size: int = 32) -> int:
    return max(size, ((n + size - 1) // size) * size)


def cltr_collate(batch):
    """train.py:280-290 collate_wrapper: flatten per-image patch lists."""
    imgs, targets = [], []
    for item in batch:
        imgs.extend(item[0])
        targets.extend(item[1])
    return np.stack(imgs, 0), targets


def cltr_topk_count(pred_logits: np.ndarray, threshold: float = 0.35) -> int:
    """Trainer.py:560-574 counting: flatten sigmoid probs over (patches,
    queries, classes), keep the top patches*num_queries values, count > thresh."""
    prob = 1.0 / (1.0 + np.exp(-pred_logits.reshape(-1)))
    k = pred_logits.shape[0] * pred_logits.shape[1]
    top = np.sort(prob)[::-1][:k]
    return int(np.sum(top > threshold))


def cltr_train_loop(trainer):
    """Runs on a Trainer configured with model_type='CLTR'.  The trainer's
    ``model`` attribute must be the ConditionalDETR module; its criterion is
    built from the CLTR config."""
    from unet_torch_tpu.models.cltr.criterion import (
        SetCriterion,
        build_weight_dict,
    )

    criterion = getattr(trainer, "criterion", None)
    if criterion is None:
        criterion = SetCriterion(
            num_classes=2,
            weight_dict=build_weight_dict(
                dec_layers=trainer.model.dec_layers,
                aux_loss=trainer.model.aux_loss))
        trainer.criterion = criterion

    # cltr_config.clip_max_norm (CLTRconfig.yml:33 ships 0.1 but the
    # reference Trainer never applies it — opt-in here, default off)
    clip = float(getattr(trainer, "cltr_clip_max_norm", 0.0) or 0.0)
    tx = make_optimizer(trainer.optimizer_name, trainer.base_lr,
                        trainer.weight_decay, clip_max_norm=clip)
    trainer._lr = trainer.base_lr
    cost_step, update_step, infer_step = make_cltr_steps(
        trainer.model, criterion, tx)
    use_fused = getattr(trainer, "cltr_fused_matcher", True)
    if use_fused:
        from unet_torch_tpu.train.cltr_steps import make_cltr_fused_step

        # mesh-aware when a model axis exists: keeps the auction matching
        # dp-sharded / model-replicated (see make_cltr_fused_step docstring)
        fused_step = make_cltr_fused_step(
            trainer.model, criterion, tx,
            mesh=(trainer.mesh
                  if trainer.mesh.shape.get("model", 1) > 1 else None))
    channel_point = trainer.model.channel_point

    for epoch in range(trainer.start_epoch, trainer.num_epochs + 1):
        trainer._log(f"Epoch {epoch}/{trainer.num_epochs}", "-" * 10)
        since = time.time()
        trainer._log(f"LR {trainer._current_lr()}")

        # ---- train
        losses = []
        for imgs, targets in trainer.dataloader["train"]:
            x = jnp.asarray(imgs, jnp.float32)
            if trainer.state is None:
                variables = trainer.model.init(
                    jax.random.key(0), x[:1], train=False)
                params = variables["params"]
                bstats = variables.get("batch_stats", {})
                pretrained = getattr(trainer, "pretrained_resnet50", None)
                if pretrained:
                    from unet_torch_tpu.ckpt.torch_import import (
                        load_pretrained_resnet50_into_cltr,
                    )

                    params, bstats = load_pretrained_resnet50_into_cltr(
                        pretrained, params, bstats)
                    trainer._log(
                        f"loaded pretrained resnet50 from {pretrained}")
                trainer.state = TrainState.create(params, bstats, tx)
                # production mesh placement (the dryrun shards its own):
                # tp-shard the transformer projections over 'model' when that
                # axis exists, else replicate params/opt over the dp mesh
                if trainer.mesh.shape.get("model", 1) > 1:
                    from unet_torch_tpu.parallel.tensor import shard_state_tp

                    trainer.state = shard_state_tp(trainer.mesh,
                                                   trainer.state, tx)
                elif trainer.mesh.size > 1:
                    from unet_torch_tpu.core.mesh import replicated_sharding

                    trainer.state = jax.device_put(
                        trainer.state, replicated_sharding(trainer.mesh))
            max_pts = _bucket(max((len(t["labels"]) for t in targets),
                                  default=1))
            labels, points, mpoints, valid = pad_targets(
                targets, max_pts, channel_point)
            rng = trainer.rng.next()
            if trainer.mesh.size > 1:
                from unet_torch_tpu.core.mesh import shard_batch

                x, labels, points, valid = shard_batch(
                    trainer.mesh, (x, jnp.asarray(labels),
                                   jnp.asarray(points), jnp.asarray(valid)))
            if use_fused:
                trainer.state, loss, _ = fused_step(
                    trainer.state, x, jnp.asarray(labels),
                    jnp.asarray(points), jnp.asarray(valid),
                    trainer._current_lr(), rng)
            else:
                costs = cost_step(trainer.state, x, jnp.asarray(labels),
                                  jnp.asarray(points), jnp.asarray(valid),
                                  rng)
                n_targets = valid.sum(axis=1)
                match_src = criterion.hungarian(np.asarray(costs), n_targets)
                trainer.state, loss, _ = update_step(
                    trainer.state, x, jnp.asarray(labels),
                    jnp.asarray(points), jnp.asarray(valid),
                    jnp.asarray(match_src), trainer._current_lr(), rng)
            trainer.iter_num += 1
            losses.append(loss)
        epoch_loss = float(np.mean([np.asarray(l) for l in losses])) if \
            losses else 0.0
        trainer.train_loss_list.append(epoch_loss)
        trainer._log(f"Train loss on epoch {epoch}: {epoch_loss}")
        trainer._save_last()

        # ---- val (Trainer.py:549-580)
        mae = mre = 0.0
        batch_step = 0
        for patches, gt_dots in trainer.dataloader["val"]:
            batch_step += 1
            p = np.asarray(patches)
            if p.ndim == 5:  # loader adds a batch dim over the patch stack
                p = p[0]
            g = np.asarray(gt_dots)
            if g.ndim == 4:
                g = g[0]
            logits, _ = infer_step(trainer.state, jnp.asarray(p, jnp.float32))
            count = cltr_topk_count(np.asarray(logits))
            gt_count = float(np.sum(g))
            mae += abs(count - gt_count)
            mre += abs(count - gt_count) / max(gt_count, 1e-6)
        if batch_step:
            mae /= batch_step
            mre /= batch_step
        trainer.val_loss_list.append(mae)
        trainer.val_score_list.append(mre)
        trainer._log(f"Val loss on epoch {epoch}: {mae}",
                     f"Val score on epoch {epoch}: {mre}")

        if mae < trainer.best_loss:
            trainer.early_stop_counter = 0
            trainer.best_loss = mae
            trainer.best_val_score = mre
            trainer._log("saving best model")
            trainer._save_best(epoch)
        else:
            trainer.early_stop_counter += 1
        if trainer.early_stop_counter > trainer.patience:
            trainer._log("Early stopping")
            trainer._restore_best()
            trainer.plot_loss_functions("total")
            return trainer

        elapsed = time.time() - since
        trainer._log("{:.0f}m {:.0f}s".format(elapsed // 60, elapsed % 60))

    trainer.plot_loss_functions("total")
    trainer._restore_best()
    return trainer
