"""Prune-training module (rebuild of ``scripts/train_n_prune_transformer.py:27-322``).

Adds to the base TrainingModule:
* SNIP: saliency = mask-gradients accumulated over ``prune_snip_grad_accum``
  batches before training, then one-shot prune (reference :88-107)
* one-shot magnitude prune at start for hard/lottery methods (:98-107)
* lottery: restore weights from the ``model_init`` snapshot while keeping
  the just-computed masks (:108-116)
* gradual magnitude: Zhu & Gupta schedule during training — start at epoch
  2, freq 1000 steps, end at 50% of training (:158-168)
* supermask sparsity loss is already inside the base jitted XE step
* best checkpoint gated on reaching the sparsity target within 5% NNZ
  (:204-225); final export of pruned dense / sparse / binarized-mask
  checkpoints + sparsities.csv (:251-291)
"""

from __future__ import annotations

import functools
import logging
import os
import jax
import jax.numpy as jnp
import numpy as np

from sparse_caption_tpu.engine.checkpoints import load_pytree, save_pytree, wait_for_checkpoints
from sparse_caption_tpu.engine.losses import language_model_loss
from sparse_caption_tpu.engine.training import TrainingModule
from sparse_caption_tpu.pruning import (
    LOTTERY,
    LOTTERY_MASK_FREEZE,
    MAG_ANNEAL,
    MAG_HARD,
    MASK_FREEZE,
    SNIP,
    SUPER_MASKS,
)
from sparse_caption_tpu.pruning import engine as prune_engine
from sparse_caption_tpu.utils.misc import csv_append_row

logger = logging.getLogger(__name__)


class PruneTrainingModule(TrainingModule):
    def __init__(self, config):
        super().__init__(config)
        assert self.mask_cfg is not None, "PruneTrainingModule requires a `*_prune` caption_model + --prune_type"
        self.prune_type = self.mask_cfg.mask_type
        self.sparsity_target = float(config.get("prune_sparsity_target", 0.8))
        self.freeze_scope = [s for s in str(config.get("prune_mask_freeze_scope", "")).split(",") if s]
        self._device_mask_update = None  # lazily-jitted --prune_gradual_on_device path

    # ----------------------------------------------------------------- hooks
    def post_restore_hook(self) -> None:
        config = self.config
        pt = self.prune_type

        if pt == SNIP:
            self._snip_prune()
        elif pt in MAG_HARD or (pt in LOTTERY and pt != LOTTERY_MASK_FREEZE):
            new_masks = prune_engine.update_masks_once(
                self.state.params, self.state.masks, pt, self.sparsity_target, self.freeze_scope
            )
            self.state = self.state.replace(masks=new_masks)
            logger.info("one-shot pruned to %.4f", self.sparsity_target)
        if pt in LOTTERY:
            # reset weights to the DENSE run's init snapshot, keep the
            # just-computed masks (:108-116 — the reference loads
            # ``os.path.join(config.start_from, "model_init.pth")``: the
            # lottery ticket rewinds to the weights the winning dense run
            # STARTED from, not to this run's fresh random init)
            start_from = config.get("start_from")
            if start_from and os.path.isdir(start_from):
                from sparse_caption_tpu.engine.checkpoints import find_ckpt

                init_path = find_ckpt(start_from, "model_init")
                if not os.path.exists(init_path):
                    raise FileNotFoundError(
                        f"lottery pruning needs the dense run's init snapshot: {init_path}")
            else:
                # reference parity: pruning without --start_from means
                # pruning a randomly initialized model (it warns the same
                # way); the only init snapshot that exists is this run's
                logger.warning("lottery without --start_from: rewinding to this "
                               "run's own random init (untrained dense model)")
                init_path = self.checkpoint_path.format("init")
            init = load_pytree(init_path)
            self.state = self.state.replace(params=jax.tree.map(jnp.asarray, init["params"]))
            logger.info("lottery: weights reset to init snapshot %s", init_path)
        if pt in (MASK_FREEZE, LOTTERY_MASK_FREEZE):
            assert config.get("start_from"), f"{pt} requires --start_from with existing masks"

    def _snip_prune(self) -> None:
        accum = int(self.config.get("prune_snip_grad_accum", 1))
        criterion = language_model_loss
        model = self.model

        @jax.jit
        def mask_grad(params, masks, inputs, seq_masks, rng):
            def loss_fn(m):
                lp = model.apply({"params": params, "masks": m}, **inputs, train=True,
                                 rngs={"dropout": rng, "mask": rng, "ss": rng})
                return criterion(lp, inputs["seqs"][:, 1:], seq_masks[:, 1:])

            return jax.grad(loss_fn)(masks)

        saliency = None
        rng = jax.random.PRNGKey(0)
        it = iter(self.train_loader)
        for i in range(accum):
            batch = next(it)
            # _shard_aux, not a raw asarray: _model_inputs assembles GLOBAL
            # arrays under a mesh/multi-process run, so the caption masks
            # must be globalized the same way (shape mismatch otherwise)
            g = mask_grad(self.state.params, self.state.masks, self._model_inputs(batch),
                          self._shard_aux(batch["masks"]), jax.random.fold_in(rng, i))
            saliency = g if saliency is None else jax.tree.map(jnp.add, saliency, g)
        new_masks = prune_engine.update_masks_once(
            self.state.params, self.state.masks, SNIP, self.sparsity_target, self.freeze_scope,
            snip_saliency=saliency,
        )
        self.state = self.state.replace(masks=new_masks)
        logger.info("SNIP pruned to %.4f over %d accum batches", self.sparsity_target, accum)

    def pre_log_hook(self, epoch: int) -> None:
        # gradual magnitude pruning (:158-168)
        if self.prune_type not in MAG_ANNEAL:
            return
        steps_per_epoch = len(self.train_loader)
        start_step = steps_per_epoch  # start of 2nd epoch
        freq = int(self.config.get("prune_gradual_frequency", 1000))
        n = max(int((0.5 * self.max_train_step - start_step) / freq), 1)
        st = prune_engine.gradual_sparsity_target(
            self.sparsity_target, self.global_step, start_step, n, prune_frequency=freq
        )
        if st is not None:
            if self.config.get("prune_gradual_on_device", False):
                # TPU-native path: quantile thresholds computed on-device
                # (one jitted call, reused across the schedule) — no
                # params round trip to the host per update
                if self._device_mask_update is None:
                    self._device_mask_update = jax.jit(functools.partial(
                        prune_engine.update_masks_once_device,
                        mask_type=self.prune_type, freeze_scope=self.freeze_scope))
                new_masks = self._device_mask_update(
                    self.state.params, self.state.masks, sparsity_target=st)
            else:
                # host path under a mesh: params/masks may be sharded (FSDP)
                # or multi-process global — gather to host for the numpy
                # argsort, then place the new masks back REPLICATED (masks
                # are replicated in every mesh mode; see CLAUDE.md)
                params_h, masks_h = self.state.params, self.state.masks
                if self.mesh is not None:
                    params_h = self.dist.fetch_global_tree(params_h)
                    masks_h = self.dist.fetch_global_tree(masks_h)
                new_masks = prune_engine.update_masks_once(
                    params_h, masks_h, self.prune_type, st, self.freeze_scope
                )
                if self.mesh is not None:
                    new_masks = self.dist.put_replicated(new_masks, self.mesh)
            self.state = self.state.replace(masks=new_masks)
            logger.info("gradual prune @ step %d -> %.4f", self.global_step, st)

    def allow_best_checkpoint(self) -> bool:
        """Best ckpt only once the NNZ count is within 5% of the target (:204-225)."""
        s, nnz, _ = prune_engine.mask_sparsity(self.state.masks, self.prune_type, self.freeze_scope)
        target_nnz = (1.0 - self.sparsity_target)
        actual_nnz = 1.0 - float(s)
        reached = actual_nnz <= target_nnz * 1.05
        if not reached:
            logger.info("sparsity %.4f below target %.4f; best ckpt gated", float(s), self.sparsity_target)
        return reached

    def checkpoint_and_eval(self) -> None:
        # log sparsity scalars (reference train_n_prune_transformer.py:186-209)
        s_act, _, per = prune_engine.mask_sparsity(self.state.masks, self.prune_type, self.freeze_scope)
        s_all, _, _ = prune_engine.mask_sparsity(self.state.masks, self.prune_type)
        self.tb.add_scalar("prune/sparsity/active", float(s_act), self.global_step)
        self.tb.add_scalar("prune/sparsity/all", float(s_all), self.global_step)
        # per-tensor curves, as the reference logs (:196-197)
        for name, s in sorted(per.items()):
            self.tb.add_scalar(f"prune/sparsity/{name}", float(s), self.global_step)
        self.tb.add_scalar("prune/all_mask_avg", float(prune_engine.mask_avg(self.state.masks)), self.global_step)
        super().checkpoint_and_eval()

    # ----------------------------------------------------------------- export
    def export_pruned_best(self) -> None:
        """Fold masks into the best checkpoint and export dense / sparse /
        binarized-mask artifacts + sparsities.csv (:251-291)."""
        best_path = self.checkpoint_path.format("best")
        # os.path.exists, not isfile: with --ckpt_backend orbax the best
        # checkpoint is a model_best.orbax DIRECTORY
        if not os.path.exists(best_path):
            logger.warning("no best checkpoint found; skipping pruned export")
            return
        wait_for_checkpoints()  # the async best save may still be in flight
        best = load_pytree(best_path)
        params, masks = best["params"], best.get("masks", {})
        pruned = prune_engine.prune_weights(params, masks, self.prune_type)
        # multi-process: orbax saves are collective (all processes call);
        # single-file writes (msgpack/npz/csv) belong to process 0
        orbax = self.checkpoint_path.endswith(".orbax")
        primary = self.dist.is_primary()
        if primary or orbax:
            save_pytree(self.checkpoint_path.format("best_pruned"), {"params": pruned, "masks": masks})
            if self.prune_type in SUPER_MASKS:
                save_pytree(self.checkpoint_path.format("best_bin_mask"),
                            {"params": params, "masks": prune_engine.binarize_masks(masks)})
        if primary:
            sparse = prune_engine.sparse_export(params, masks, self.prune_type)
            np.savez_compressed(os.path.join(self.config.log_dir, "model_best_pruned_sparse.npz"), **sparse)
            # sparsities.csv
            _, _, per = prune_engine.mask_sparsity(masks, self.prune_type)
            csv_path = os.path.join(self.config.log_dir, "sparsities.csv")
            for name, s in sorted(per.items()):
                csv_append_row(csv_path, ["tensor", "sparsity"], [name, f"{float(s):.6f}"])
        self.dist.sync()
        logger.info("pruned exports written to %s", self.config.log_dir)

    def train(self) -> None:
        super().train()
        self.export_pruned_best()
        # export_pruned_best dispatches async orbax saves (best_pruned,
        # best_bin_mask); join them so the process can't exit with a
        # partial/tmp dir left behind
        wait_for_checkpoints()
