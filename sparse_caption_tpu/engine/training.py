"""Training engine (TPU-native TrainingModule).

Capability parity with the reference ``sparse_caption/utils/training.py:33-513``
plus the train loops in ``scripts/train_transformer.py:20-133`` and
``scripts/train_n_prune_transformer.py:27-322``:

* dataset/tokenizer/model assembly from registries; run-dir artifacts
  (config.json, model_params.json, checkpoint files, restore_log.txt)
* jitted XE step (masked NLL or label smoothing) with optional supermask
  sparsity loss; separate weight/mask optimizer groups
* SCST: device sampling pass under the train-mode policy (random or beam)
  -> host CIDEr-D/BLEU rewards -> device REINFORCE step that RECOMPUTES the
  identical sampling decode differentiably (same rng => same dropout +
  supermask realization, same tokens) so gradients attach to the true
  sampling-pass logprobs — the reference's captured-logprob semantics
  (utils/training.py:225-254) via whole-decode rematerialization
* eval_on_split: jitted batched decode, prediction JSON, metric scores,
  score JSON/CSV, best-checkpoint tracking on CIDEr
* pruning hooks: SNIP saliency pre-pass, one-shot/lottery, gradual
  schedule, sparsity logging, export of pruned/sparse/binarized artifacts

Parallelism (new vs reference, which is single-GPU): the jitted steps are
written over a ``jax.sharding.Mesh`` data-parallel batch sharding when
``config.mesh_shape`` is set; see ``sparse_caption_tpu/parallel``.
"""

from __future__ import annotations

import functools
import logging
import os
import time
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from sparse_caption_tpu.config import Config
from sparse_caption_tpu.data import get_dataset
from sparse_caption_tpu.data.batching import BatchLoader, CaptionBatcher
from sparse_caption_tpu.data.features import FeatureCache, FeatureSource, default_bu_dirs
from sparse_caption_tpu.decoding import generate
from sparse_caption_tpu.decoding.api import decode_train_keys
from sparse_caption_tpu.engine import losses as losses_mod
from sparse_caption_tpu.engine.checkpoints import (
    NullScalarLogger, ScalarLogger, restore_lenient, save_pytree, load_pytree)
from sparse_caption_tpu.engine.optim import build_mask_optimizer, build_weight_optimizer, make_schedule
from sparse_caption_tpu.metrics import evaluate_caption_json
from sparse_caption_tpu.metrics.cider import build_df_pickle
from sparse_caption_tpu.models import get_model
from sparse_caption_tpu.ops.masked import MaskConfig
from sparse_caption_tpu.pruning import SUPER_MASKS, TRAINABLE_MASKS, VALID_MASKS
from sparse_caption_tpu.scst import CaptionScorer
from sparse_caption_tpu.utils.misc import csv_append_row, dump_json

logger = logging.getLogger(__name__)


def _hot_jit(fn):
    """``jax.jit`` with the measured-win TPU compiler options for the hot
    train/decode programs (utils/jax_setup.tpu_compiler_options:
    scoped-VMEM 48 MiB — +11% on the paper-dims XE step at batch 256,
    +3.0% on the beam-5 decode at batch 2048; round-5 on-chip A/Bs,
    resources/ab_xla_flags_*_r5.json). No-op off TPU."""
    from sparse_caption_tpu.utils.jax_setup import tpu_compiler_options

    return jax.jit(fn, compiler_options=tpu_compiler_options())


class TrainState(struct.PyTreeNode):
    params: Any
    masks: Any
    opt_w: Any
    opt_m: Any
    step: jnp.ndarray


class TrainingModule:
    ALL_METRICS = [
        "Bleu_1", "Bleu_2", "Bleu_3", "Bleu_4", "METEOR", "METEOR_py",
        "ROUGE_L", "CIDEr", "SPICE", "SPICE_py",
    ]
    SCST_SAMPLE = ["beam_search", "random"]
    SCST_BASELINE = ["greedy", "sample"]

    def __init__(self, config: Config):
        self.config = config
        os.makedirs(config.log_dir, exist_ok=True)
        # multi-process (multi-host) mode: connect to the coordination
        # service BEFORE the first backend touch (SURVEY §2.11 — the
        # build's new distributed component; see parallel/distributed.py)
        from sparse_caption_tpu.parallel import distributed as dist

        self.dist = dist
        multi = dist.maybe_initialize_from_config(config)
        if multi and not config.get("mesh_shape"):
            # default: all global devices on the data axis; marked auto so
            # save_config leaves it out (not portable to a later eval host)
            config.mesh_shape = str(jax.device_count())
            config.mesh_shape_auto = True
        if multi and not dist.is_primary():
            # primary-first barrier: process 0 materializes the shared
            # log_dir artifacts (tokenizer train_captions.txt + vocab JSON,
            # dataset caches) alone; everyone else waits, then loads the
            # finished files — prepare_data/_train_or_load are
            # existence-gated, so the second pass is read-only
            dist.sync()
        self.data = get_dataset(config.dataset)(config)
        self.data.prepare_data()

        from sparse_caption_tpu.tokenizers import get_tokenizer

        self.tokenizer = get_tokenizer(config.tokenizer)(config)
        if multi and dist.is_primary():
            dist.sync()  # release the waiting non-primary processes
        logger.info("vocab_size=%d bos=%s eos=%s", config.vocab_size, config.bos_token_id, config.eos_token_id)

        name = config.caption_model
        self.is_prune_model = name.endswith("_prune")
        base_name = name[: -len("_prune")] if self.is_prune_model else name
        self.mask_cfg = None
        if self.is_prune_model:
            prune_type = config.get("prune_type", "")
            assert prune_type in VALID_MASKS, f"--prune_type must be one of {VALID_MASKS}, got `{prune_type}`"
            self.mask_cfg = MaskConfig(
                mask_type=prune_type,
                mask_init_value=float(config.get("prune_supermask_init", 5.0))
                if prune_type in SUPER_MASKS else 1.0,
                bypass_sigmoid_grad=bool(config.get("prune_supermask_bypass_sigmoid_grad", False)),
            )
        self.model = get_model(base_name).from_config(config, self.mask_cfg)

        # feature source driven by the model's collate fields
        dirs = default_bu_dirs(config.dataset_dir)
        fields = self.model.COLLATE_FIELDS
        self.feature_source = FeatureSource(
            att_dir=config.get("input_att_dir") or dirs["att_dir"],
            fc_dir=(config.get("input_fc_dir") or dirs["fc_dir"]) if "fc_feats" in fields else None,
            box_dir=(config.get("input_rel_box_dir") or dirs["box_dir"]) if "boxes" in fields else None,
            max_regions=int(config.get("max_att_regions", 36)),
            att_feat_size=int(config.get("att_feat_size", 2048)),
            cache=FeatureCache(float(config.get("cache_min_free_ram", 0.2))),
        )
        self.batcher = CaptionBatcher(config, self.tokenizer, self.feature_source)
        ckpt_ext = ".orbax" if config.get("ckpt_backend") == "orbax" else ".msgpack"
        self.checkpoint_path = os.path.join(config.log_dir, "model_{}" + ckpt_ext)
        self.optimizer_path = os.path.join(config.log_dir, "optimizer_{}" + ckpt_ext)
        # scale-out: data(+tensor)-parallel mesh when --mesh_shape is set.
        # With --pipeline_stages the PIPE mesh owns the devices instead:
        # a data-only --mesh_shape composes as dp x pp inside the pipelined
        # step (self.pipeline_dp), any tensor axis is rejected there.
        self.mesh = None
        self.pipeline_dp = 1
        if config.get("mesh_shape") and int(config.get("pipeline_stages") or 0) >= 1:
            dims = [int(x) for x in str(config.mesh_shape).split(",") if x]
            if len(dims) > 1 and dims[1] != 1:
                raise ValueError(
                    "--pipeline_stages composes with a DATA-only --mesh_shape "
                    f"(dp x pp); tensor axis {dims[1]} is not supported")
            self.pipeline_dp = dims[0]
            assert config.batch_size % self.pipeline_dp == 0, (
                f"batch_size {config.batch_size} must divide by data-parallel "
                f"size {self.pipeline_dp}")
        elif config.get("mesh_shape"):
            from sparse_caption_tpu.parallel import make_mesh

            self.mesh = make_mesh(config.mesh_shape)
            dp = self.mesh.shape["data"]
            # validate EVERY batch size the run will shard up front —
            # shard_batch fails on a non-divisible leading dim, and an
            # eval-only violation would otherwise surface hours in, at the
            # first checkpoint_and_eval
            bse = int(config.get("batch_size_eval", config.batch_size))
            for name, bs in (("batch_size", config.batch_size), ("batch_size_eval", bse)):
                assert bs % dp == 0, (
                    f"{name} {bs} must divide by data-parallel size {dp}")
            logger.info("mesh: %s", dict(self.mesh.shape))
        self.state: Optional[TrainState] = None
        self.global_step = 0
        self.best_val_score = 0.0
        self._jit_cache: Dict = {}

    # ------------------------------------------------------------- loaders
    def get_loader(self, split: str, train: bool) -> BatchLoader:
        bs = self.config.batch_size if train else self.config.get("batch_size_eval", self.config.batch_size)
        # BOTH train and eval iterate per-IMAGE records: the reference's
        # train dataloader passes generation_mode=True too
        # (utils/training.py:85-87) and its train collate draws
        # min(seq_per_img, len) captions per image per step
        # (collate.py:133-138) — an "epoch" is one pass over IMAGES, not
        # captions. (Round-4 parity fix: earlier rounds iterated
        # per-caption records, running 5x the reference's optimizer steps
        # per nominal epoch on COCO.)
        records = self.data.get_split(split, generation_mode=True)
        # --num_workers maps to the prefetch-queue depth (the loader is one
        # daemon thread + bounded queue, not a worker pool; 0 = inline
        # loading, matching the reference's num_workers=0 semantics)
        prefetch = max(0, int(self.config.get("num_workers", 4)))
        return BatchLoader(records, self.batcher, bs, train=train, seed=int(self.config.get("seed", 8888)),
                           prefetch=prefetch,
                           process_index=self.dist.process_index(),
                           process_count=self.dist.process_count())

    def prepare(self) -> None:
        config = self.config
        assert config.max_epochs > 0 and config.get("save_checkpoint_every", 6000) > 0
        if config.get("cached_tokens") is None:
            config.cached_tokens = os.path.join(config.dataset_dir, "bu", "coco-train-words")
        if bool(config.get("config_save_skip", False)) or not self.dist.is_primary():
            # read-only entries (eval_model): never rewrite the training
            # run's config.json with eval-time mutations (stripped _prune
            # model name, decode overrides). Non-primary processes never
            # write host-side artifacts (they share log_dir with process 0).
            self.config_path = os.path.join(config.log_dir, "config.json")
        else:
            # resume_training also tolerates the existing config.json: the
            # standard same-dir crash-recovery relaunch must not die on
            # FileExistsError before restoring anything
            exist_ok = bool(config.get("config_overwrite", False)) or bool(config.get("resume_training", False))
            self.config_path = config.save_config(config.log_dir, exist_ok=exist_ok)
        self.train_loader = self.get_loader("train", train=True)
        self.val_loader = self.get_loader("val", train=False)
        self.tb = ScalarLogger(config.log_dir) if self.dist.is_primary() else NullScalarLogger()
        self.max_train_step = config.max_train_step = config.max_epochs * len(self.train_loader)
        self.scst_scorer = None
        if 0 <= int(config.get("scst_start_epoch", -1)):
            if self.dist.is_multiprocess() and config.get("scst_reward", "host") != "device":
                raise ValueError(
                    "multi-process SCST requires --scst_reward device (rewards computed "
                    "in-jit over the global mesh); the host scorer would need a "
                    "cross-process gather/re-shard of sampled tokens every step")
            df_path = config.cached_tokens if str(config.cached_tokens).endswith(".p") else config.cached_tokens + ".p"
            if not os.path.isfile(df_path) and self.dist.is_primary():
                logger.info("building CIDEr df pickle from train captions -> %s", df_path)
                refs = [d["all_gts"] for d in self.data.get_split("train", generation_mode=True)]
                os.makedirs(os.path.dirname(df_path), exist_ok=True)
                build_df_pickle(refs, df_path)
            self.dist.sync()  # non-primary waits for the df pickle
            scorer_cls = CaptionScorer
            if bool(config.get("scst_use_native", True)):
                from sparse_caption_tpu.scst import native as native_scst

                if native_scst.is_available():
                    scorer_cls = native_scst.NativeCaptionScorer
                    logger.info("using native (C++) SCST reward scorer")
            self.scst_scorer = scorer_cls(
                config.cached_tokens,
                cider_weight=float(config.get("scst_cider_weight", 1.0)),
                bleu_weight=config.get("scst_bleu_weight", [0.0] * 4),
            )
            if config.get("scst_reward", "host") == "device":
                self._init_device_reward(df_path)
        self.best_val_score = 0.0
        config.best_global_step = 0

    # --------------------------------------------------- device SCST reward
    def _init_device_reward(self, df_path: str) -> None:
        """``--scst_reward device``: in-jit CIDEr-D (scst/device_reward.py).

        The df pickle becomes a device hash table once; per batch only the
        reference tf-idf pack is (host-)built. SCST steps then need no
        device->host transfer at all — the whole loop is async dispatch.
        """
        from sparse_caption_tpu.metrics.cider import CiderScorer
        from sparse_caption_tpu.scst import device_reward as devr
        from sparse_caption_tpu.tokenizers.radix import RadixTokenizer
        from sparse_caption_tpu.tokenizers.word import WordTokenizer

        config = self.config
        is_radix = isinstance(self.tokenizer, RadixTokenizer)
        assert type(self.tokenizer) is WordTokenizer or is_radix, (
            "--scst_reward device requires word or radix tokenization (sampled "
            "ids are words / regroupable digits); char/bpe captions score on "
            "decoded word strings -> use --scst_reward host")
        bleu_w = [float(x) for x in config.get("scst_bleu_weight", [0.0] * 4)]
        scorer = CiderScorer.from_pickle(df_path)
        # the scoring vocabulary is always the WORD vocab: radix digit ids
        # are regrouped to word ids in-jit before gram extraction
        tok2id = dict(self.tokenizer._token_to_id)
        regroup = None
        eos, pad, bos = (self.tokenizer.eos_token_id, self.tokenizer.pad_token_id,
                         self.tokenizer.bos_token_id)
        if is_radix:
            regroup = devr.make_radix_to_word_fn(
                self.tokenizer.radix_base, self.tokenizer.tokens_per_word,
                len(self.tokenizer.vocab))
            eos, pad, bos = 3, 0, 2  # regrouped ids use WORD conventions
        table = devr.DfTable.build(scorer.df, scorer.ref_len, tok2id)
        tbl_dev = table.device_arrays()
        if self.mesh is not None:
            # the df table is a jit input alongside mesh-sharded arrays:
            # make it a fully-replicated GLOBAL array (required once the
            # mesh spans processes; harmless single-process)
            tbl_dev = self.dist.put_replicated(
                jax.tree.map(np.asarray, tbl_dev), self.mesh)
        self.scst_device = {
            "table": table, "df": scorer.df, "tok2id": tok2id,
            "tbl_dev": tbl_dev,
            # private OOV ref ids must clear every regrouped WORD id
            "vocab_size": len(self.tokenizer.vocab),
            # the weighted CIDEr-D + BLEU mix is baked into the jitted fn
            "fn": devr.make_reward_device_fn(
                table, eos_id=eos, pad_id=pad, bos_id=bos,
                cider_weight=float(config.get("scst_cider_weight", 1.0)),
                bleu_weight=bleu_w, regroup=regroup),
        }
        logger.info("device CIDEr-D reward: df table %d slots (probe depth %d)",
                    table.size, table.probe)

    def _scst_ref_pack(self, gts):
        """Per-batch reference tf-idf pack as device arrays. L is bucketed
        to multiples of 32 (an upper bound on gram count avoids a precook
        pass) so jit retraces stay bounded across batches."""
        from sparse_caption_tpu.scst import device_reward as devr

        d = self.scst_device
        r = max(len(x) for x in gts)
        gram_ub = max(4 * len(s.split()) for refs in gts for s in refs)
        l_max = ((max(gram_ub, 1) + 31) // 32) * 32
        pack = devr.build_ref_pack(gts, d["df"], d["table"].ref_len, d["tok2id"],
                                   vocab_size=d["vocab_size"],
                                   max_refs=r, max_grams=l_max)
        if self.mesh is not None:
            # gts are GLOBAL metadata on every process (BatchLoader carries
            # them in full), so the pack replicates identically
            return self.dist.put_replicated(pack, self.mesh)
        return devr.ref_pack_device(pack)

    # -------------------------------------------------------------- state
    def _model_inputs(self, batch: Dict, with_seqs: bool = True, shard: bool = True) -> Dict[str, jnp.ndarray]:
        out = {
            "att_feats": jnp.asarray(batch["att_feats"]),
            "att_masks": jnp.asarray(batch["att_masks"]),
        }
        if "boxes" in self.model.COLLATE_FIELDS:
            out["boxes"] = jnp.asarray(batch["boxes"])
        if "fc_feats" in self.model.COLLATE_FIELDS:
            out["fc_feats"] = jnp.asarray(batch["fc_feats"])
        if with_seqs:
            out["seqs"] = jnp.asarray(batch["seqs"])
        if self.mesh is not None and shard:
            from sparse_caption_tpu.parallel import shard_batch

            out = shard_batch(out, self.mesh)
        return out

    def _shard_aux(self, arr):
        """Batch-axis-shard an auxiliary per-example array (e.g. the caption
        loss masks) the same way _model_inputs shards the model inputs."""
        arr = np.asarray(arr)
        if self.mesh is not None:
            from sparse_caption_tpu.parallel import shard_batch

            return shard_batch({"x": arr}, self.mesh)["x"]
        return arr

    def init_state(self, rng: Optional[jax.Array] = None) -> TrainState:
        rng = rng if rng is not None else jax.random.PRNGKey(int(self.config.get("seed", 8888)))
        # shape probe: any split works (eval-only runs may lack train
        # features); probe batch size is capped by the split size so tiny
        # fixtures with batch_size > |split| still initialize
        def probe_batch(split):
            records = self.data.get_split(split, generation_mode=True)
            bs = min(int(self.config.batch_size), max(len(records), 1))
            if self.mesh is not None:
                # the probe goes through shard_batch too: keep its leading
                # dim a dp multiple; it is only a SHAPE probe, so tiny
                # splits (fixture datasets) pad by repeating records
                dp = self.mesh.shape["data"]
                bs = max((bs // dp) * dp, dp)
                if records and len(records) < bs:
                    records = (records * (-(-bs // len(records))))[:bs]
            return next(iter(BatchLoader(records, self.batcher, bs, train=True,
                                         seed=int(self.config.get("seed", 8888)), prefetch=0)))

        try:
            probe = probe_batch("train")
        except (FileNotFoundError, StopIteration):
            probe = probe_batch("val")
        # model.init runs EAGERLY (unjitted), so multi-process runs must
        # init from host arrays — eager ops on non-addressable global
        # arrays fail; every process inits identically (same rng) and
        # shard_state places the result onto the global mesh below
        inputs = self._model_inputs(probe, shard=not self.dist.is_multiprocess())
        variables = self.model.init({"params": rng, "mask": rng, "dropout": rng, "ss": rng}, **inputs)
        params = variables["params"]
        masks = variables.get("masks", {})

        steps_per_epoch = len(self.train_loader) if hasattr(self, "train_loader") else 1
        schedule = make_schedule(self.config, steps_per_epoch=max(steps_per_epoch, 1))
        self.opt_w = build_weight_optimizer(self.config, schedule)
        trainable_masks = self.mask_cfg is not None and self.mask_cfg.mask_type in TRAINABLE_MASKS
        self.opt_m = build_mask_optimizer(self.config, trainable_masks)
        self.state = TrainState(
            params=params, masks=masks,
            opt_w=self.opt_w.init(params), opt_m=self.opt_m.init(masks),
            step=jnp.zeros((), jnp.int32),
        )
        self._schedule = schedule
        if self.mesh is not None:
            from sparse_caption_tpu.parallel import shard_state

            self.state = shard_state(self.state, self.mesh,
                                     zero_opt=bool(self.config.get("zero_opt")),
                                     fsdp=bool(self.config.get("fsdp")))
        # parameter census (reference train_transformer.py:36-50); the
        # per-tensor breakdown feeds collect_scores' param-group sums
        n_params = sum(x.size for x in jax.tree.leaves(params))
        n_masks = sum(x.size for x in jax.tree.leaves(masks))
        breakdown = {
            "/".join(getattr(k, "key", str(k)) for k in path): int(leaf.size)
            for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]
        }
        if self.dist.is_primary():
            dump_json(os.path.join(self.config.log_dir, "model_params.json"),
                      {"total": int(n_params), "trainable params": int(n_params),
                       "breakdown": breakdown}, indent=2)
            if n_masks:
                dump_json(os.path.join(self.config.log_dir, "mask_params.json"), {"total": int(n_masks)}, indent=2)
        logger.info("model params: %s, mask params: %s", f"{n_params:,d}", f"{n_masks:,d}")
        return self.state

    # --------------------------------------------------------------- steps
    def _loss_criterion(self):
        ls = float(self.config.get("label_smoothing", 0.0))
        if ls > 0:
            return functools.partial(losses_mod.label_smoothing_loss, smoothing=ls)
        return losses_mod.language_model_loss

    def _sparsity_loss_args(self) -> Optional[Tuple[float, float]]:
        if self.mask_cfg is None or not self.mask_cfg.is_supermask:
            return None
        target = float(self.config.get("prune_sparsity_target", 0.8))
        weight = float(self.config.get("prune_supermask_sparsity_weight", -1.0))
        if weight <= 0:
            # reference default: max(5, C/(1-s)) (train_n_prune_transformer.py:306-312)
            c = 0.5 if "lstm" in self.config.caption_model else 1.5
            weight = max(5.0, c / (1.0 - target))
        return target, weight

    def _grad_update(self, state: TrainState, gw, gm) -> TrainState:
        """One optimizer update: weight chain + mask chain + step bump — the
        single implementation behind the XE, two-phase/pipelined SCST, and
        fused SCST steps (called at trace time inside their jits, so a
        semantic fix here reaches every step variant)."""
        uw, new_opt_w = self.opt_w.update(gw, state.opt_w, state.params)
        params = optax.apply_updates(state.params, uw)
        um, new_opt_m = self.opt_m.update(gm, state.opt_m, state.masks)
        masks = optax.apply_updates(state.masks, um) if state.masks else state.masks
        return state.replace(params=params, masks=masks, opt_w=new_opt_w, opt_m=new_opt_m,
                             step=state.step + 1)

    def _scst_opts(self, differentiable: bool = False):
        """SCST decode option assembly shared by the two-phase and fused
        steps: (sample_opt, greedy_opt, num_samples, sample_mode,
        baseline_mode, max_len)."""
        config = self.config
        num_samples = int(config.get("scst_num_samples", 15))
        sample_mode = config.get("scst_sample", "random")
        baseline_mode = config.get("scst_baseline", "greedy")
        assert sample_mode in self.SCST_SAMPLE and baseline_mode in self.SCST_BASELINE
        max_len = int(config.get("max_seq_length", 18)) - 1
        if sample_mode == "beam_search":
            sample_opt = {"beam_size": num_samples, "max_seq_length": max_len, "decode_train": True}
        else:
            sample_opt = {"num_random_sample": num_samples, "beam_size": 0, "max_seq_length": max_len,
                          "temperature": float(config.get("scst_temperature", 1.0)),
                          "decode_train": True}
            if differentiable:
                sample_opt["differentiable"] = True  # grads flow through the sampling decode
        greedy_opt = {"beam_size": 1, "max_seq_length": max_len}
        return sample_opt, greedy_opt, num_samples, sample_mode, baseline_mode, max_len

    def _scst_decode_and_score(self, sample_np, greedy_np, gts):
        """Host reward pass shared by the two-phase scorer and the fused
        step's io_callback: decode token ids, run the CIDEr-D/BLEU scorer.
        Returns (sc_sample, sc_baseline) numpy arrays."""
        sample_decoded = [[self.tokenizer.decode(sample_np[i, j]) for j in range(sample_np.shape[1])]
                          for i in range(sample_np.shape[0])]
        baseline_decoded = None
        if greedy_np is not None:
            baseline_decoded = [[self.tokenizer.decode(greedy_np[i, 0])] for i in range(greedy_np.shape[0])]
        return self.scst_scorer(refs=gts, sample=sample_decoded, baseline=baseline_decoded)

    def make_xe_step(self):
        if int(self.config.get("pipeline_stages") or 0) >= 1:
            # N=1 also runs the pipelined (deterministic) step, so the
            # N=1 vs N=2 e2e equality test compares like for like
            return self.make_xe_step_pipelined()
        criterion = self._loss_criterion()
        sp_args = self._sparsity_loss_args()
        freeze_scope = [s for s in str(self.config.get("prune_mask_freeze_scope", "")).split(",") if s]
        max_step = int(self.config.get("max_train_step", 1))
        model = self.model

        remat = bool(self.config.get("remat", False))
        # mixed precision (--train_precision bf16, the TPU-native default for
        # large runs): master params, grads, optimizer state, and losses stay
        # f32; the forward/backward matmuls run bf16 via a differentiable
        # cast inside loss_fn (the MXU's native dtype, ~4x f32 rate, no loss
        # scaling needed — bf16 has the f32 exponent range). Masks stay f32
        # (ops/masked.py casts the 0/1 sample to the weight dtype); the
        # generator's log_softmax computes in f32 (models/layers.py).
        bf16 = str(self.config.get("train_precision", "fp32")) == "bf16"

        def cast_compute(tree):
            return jax.tree.map(
                lambda x: x.astype(jnp.bfloat16) if jnp.issubdtype(x.dtype, jnp.floating) else x,
                tree,
            )

        # per-step rng derivation happens INSIDE the jit from state.step:
        # eager host-side split/fold ops are ~3 ms relay dispatches each on
        # tunneled TPU backends (round-2 XE profile: ~6 ms/step of host gap
        # from fold_in + convert_element_type). rng=None (the train loop)
        # takes this path; an explicit key (tests, bench) works unchanged.
        base_rng = jax.random.PRNGKey(int(self.config.get("seed", 8888)) + 1)

        @_hot_jit
        def xe_step(state: TrainState, inputs: Dict, seq_masks, rng=None):
            if rng is None:
                rng = jax.random.fold_in(base_rng, state.step)
            k_drop, k_mask, k_ss = jax.random.split(rng, 3)
            if bf16:
                # "boxes" stays f32: box_relational_embedding's x100-scaled
                # trig args amplify bf16 coordinate rounding (~2^-9) into
                # multi-radian errors for nearby box pairs (the same
                # degeneration the f32-geometry path in layers.py guards
                # against). Geometry computes f32 and casts its OUTPUT to the
                # activation dtype, so keeping boxes f32 costs nothing.
                inputs = dict(inputs, **cast_compute(
                    {k: v for k, v in inputs.items() if k not in ("seqs", "boxes")}))

            def forward(params, masks):
                variables = {"params": cast_compute(params) if bf16 else params}
                if masks:
                    variables["masks"] = masks
                return model.apply(variables, **inputs, train=True,
                                   rngs={"dropout": k_drop, "mask": k_mask, "ss": k_ss})

            if remat:
                # trade FLOPs for HBM: recompute activations in the backward
                # pass (supersedes the reference's MaskedLSTMCellCheckpoint,
                # pruning/masked_layer.py:215-255)
                forward = jax.checkpoint(forward)

            def loss_fn(params, masks):
                lp = forward(params, masks)
                seqs = inputs["seqs"]
                loss = criterion(lp, seqs[:, 1:], seq_masks[:, 1:])
                aux = {"caption_loss": loss}
                if sp_args is not None:
                    from sparse_caption_tpu.pruning.engine import compute_sparsity_loss

                    sp, sp_aux = compute_sparsity_loss(masks, sp_args[0], sp_args[1], state.step, max_step,
                                                       freeze_scope)
                    loss = loss + sp
                    aux.update(sp_aux)
                return loss, aux

            (loss, aux), grads = jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)(
                state.params, state.masks
            )
            return self._grad_update(state, *grads), loss, aux

        return xe_step

    def make_xe_step_pipelined(self):
        """``--pipeline_stages N``: XE train step with the decoder stack
        executed GPipe pipeline-parallel over an N-device ``("pipe",)``
        mesh — or, with a data-only ``--mesh_shape D``, a 2-D
        ``("data", "pipe")`` mesh over D x N devices (``parallel/
        pipeline.py``).  Transformer-family models incl. pruned variants
        (supermasks sample once per step outside the pipeline via the STE
        — exactly one forward per step, so semantics match the in-model
        fresh-sample-per-forward), deterministic forward (no dropout),
        f32 — pinned by the N=1 == N=2 e2e equality test
        (tests/test_parallel.py)."""
        from sparse_caption_tpu.parallel.pipeline import (
            make_pipe_mesh, pipeline_xe_train_loss_and_grads)

        config = self.config
        n_stages = int(config.pipeline_stages)
        n_micro = int(config.get("pipeline_microbatches") or n_stages)
        if getattr(self.model, "share_layer_decoder", None) is not None:
            raise ValueError("--pipeline_stages needs one param set per decoder layer (no share_layer)")
        if 0 <= int(config.get("scst_start_epoch", -1)):
            raise ValueError("--pipeline_stages supports XE training only (no SCST phase)")
        logger.warning(
            "--pipeline_stages %d uses the DETERMINISTIC pipelined step: "
            "dropout is not applied (regularization differs from the "
            "default XE step; the flag's contract is the GPipe "
            "compute/communication structure)", n_stages)
        criterion = self._loss_criterion()
        mesh = make_pipe_mesh(n_stages, dp=self.pipeline_dp)
        model = self.model
        opt_w = self.opt_w
        masked = self.mask_cfg is not None
        sp_args = self._sparsity_loss_args() if masked else None
        freeze_scope = [s for s in str(config.get("prune_mask_freeze_scope", "")).split(",") if s]
        max_step = int(config.get("max_train_step", 1))
        base_rng = jax.random.PRNGKey(int(config.get("seed", 8888)) + 1)
        grad_update = self._grad_update

        @_hot_jit
        def xe_step(state: TrainState, inputs: Dict, seq_masks, rng=None):
            if not masked:
                loss, gw = pipeline_xe_train_loss_and_grads(
                    model, state.params, inputs, seq_masks, criterion, mesh, n_micro)
                uw, new_opt_w = opt_w.update(gw, state.opt_w, state.params)
                params = optax.apply_updates(state.params, uw)
                new_state = state.replace(params=params, opt_w=new_opt_w, step=state.step + 1)
                return new_state, loss, {"caption_loss": loss}
            if rng is None:
                rng = jax.random.fold_in(base_rng, state.step)
            mask_rng = rng if (self.mask_cfg.is_supermask) else None
            loss, gw, gm = pipeline_xe_train_loss_and_grads(
                model, state.params, inputs, seq_masks, criterion, mesh, n_micro,
                masks=state.masks, mask_rng=mask_rng)
            aux = {"caption_loss": loss}
            if sp_args is not None:
                # the sparsity loss reads only the mask logits, so its grad
                # adds to the pipeline's mask grads separately
                from sparse_caption_tpu.pruning.engine import compute_sparsity_loss

                def sp_fn(masks):
                    sp, sp_aux = compute_sparsity_loss(
                        masks, sp_args[0], sp_args[1], state.step, max_step, freeze_scope)
                    return sp, sp_aux

                (sp, sp_aux), g_sp = jax.value_and_grad(sp_fn, has_aux=True)(state.masks)
                loss = loss + sp
                aux.update(sp_aux)
                gm = jax.tree.map(jnp.add, gm, g_sp)
            new_state = grad_update(state, gw, gm)
            return new_state, loss, aux

        return xe_step

    # ------------------------------------------------------------ decoding
    def _variables(self, state: TrainState) -> Dict:
        v = {"params": state.params}
        if state.masks:
            v["masks"] = state.masks
        return v

    def make_decode_fn(self, opt: Dict):
        """Jitted encode+generate for a fixed option dict."""
        model = self.model
        opt = dict(opt)
        opt.setdefault("max_seq_length", int(self.config.get("max_seq_length", 18)) - 1)

        @_hot_jit
        def decode(variables, inputs, rng, step=0):
            # per-batch key derived IN-JIT (an eager fold_in per batch
            # would be a ~3 ms relay dispatch); without it, sampling eval
            # would draw the identical random stream for every batch
            rng = jax.random.fold_in(rng, step)
            enc_kwargs = {k: v for k, v in inputs.items() if k != "seqs"}
            memory = model.apply(variables, **enc_kwargs, method="encode")
            return generate(model, variables, memory, opt, rng=rng)

        return decode

    def _cached_decode(self, key: str, opt: Dict):
        if key not in self._jit_cache:
            self._jit_cache[key] = self.make_decode_fn(opt)
        return self._jit_cache[key]

    # ---------------------------------------------------------------- SCST
    def make_scst_step(self):
        """Two-phase SCST step with reference-exact gradient semantics.

        Phase 1 (no grad): sampling decode under a TRAIN-mode policy —
        dropout active, per-step supermask Bernoulli draws — exactly the
        reference's ``model.train()`` sampling (utils/training.py:225-237);
        optional eval-mode greedy baseline. Phase 2: the jitted grad step
        RE-RUNS the identical decode (same rng, so the same dropout/mask
        realization and the same tokens, bit for bit) as a differentiable
        scan and attaches the REINFORCE loss to its per-step logprobs. The
        recompute is the whole-decode analogue of gradient checkpointing:
        gradients flow through the true sampling-pass logprobs, matching
        the reference's captured-logprob semantics without host callbacks.
        """
        config = self.config
        model = self.model
        sample_opt, greedy_opt, num_samples, sample_mode, baseline_mode, max_len = self._scst_opts()

        def _train_sample(variables, enc_kwargs, rng, differentiable: bool = False):
            """Train-mode encode + sampling decode; shared by both phases so
            one rng reproduces the identical realization. The grad pass sets
            ``differentiable`` (fixed-length scan — reverse AD cannot cross
            the early-exit lax.while_loop; same tokens either way)."""
            k_enc_drop, k_enc_mask, k_dec = jax.random.split(rng, 3)
            memory = model.apply(variables, **enc_kwargs, train=True,
                                 rngs={"dropout": k_enc_drop, "mask": k_enc_mask}, method="encode")
            opt_d = dict(sample_opt, differentiable=True) if differentiable else sample_opt
            return generate(model, variables, memory, opt_d, rng=k_dec)

        # in-jit per-step key derivation (rng=None + step): see make_xe_step —
        # eager host rng ops cost ~3 ms each through tunneled backends
        scst_base_rng = jax.random.fold_in(
            jax.random.PRNGKey(int(self.config.get("seed", 8888)) + 1), 0x5C57)

        @_hot_jit
        def sample_fn(variables, inputs, rng=None, step=None):
            if rng is None:
                rng = jax.random.fold_in(scst_base_rng, step)
            enc_kwargs = {k: v for k, v in inputs.items() if k != "seqs"}
            sample_seq, _ = _train_sample(variables, enc_kwargs, rng)
            out = {"sample": sample_seq}
            if baseline_mode == "greedy":
                # baseline decodes in eval mode under no grad (reference
                # training.py:216-221)
                memory_ev = model.apply(variables, **enc_kwargs, method="encode")
                out["greedy"] = generate(model, variables, memory_ev, greedy_opt)[0]
            return out

        # fast gradient pass: dense transformer-family models replay the whole
        # sampling decode (dropout realization included) in ONE teacher-forced
        # parallel forward (TimeDropout replay mode) instead of differentiating
        # through the T-step scan — same gradients (reference captured-logprob
        # semantics, utils/training.py:225-254), a fraction of the step time.
        # Excluded: supermask models (per-step Bernoulli weight draws cannot be
        # replayed by one pass) and beam-search sampling (a surviving beam's
        # step-t activations were computed in its ancestor's row, under that
        # row's dropout draws).
        # Teacher-forced replay is exact when every stochastic draw of the
        # sampling decode can be reproduced: TimeDropout folds dropout keys
        # by t, and masks are deterministic for every type EXCEPT train-mode
        # supermask (fresh Bernoulli per forward, ops/masked.py:57-61) —
        # so mask_freeze / magnitude / SNIP pruned models replay exactly
        # (the paper's sparse-SCST stage, commands_pruning.sh:175-196).
        use_tf_replay = (
            (self.mask_cfg is None or not self.mask_cfg.is_supermask)
            and sample_mode != "beam_search"
            and getattr(model, "DECODE_DROPOUT_FOLDS_T", False)
        )

        def _reinforce_update(state: TrainState, inputs, sample_seq, rewards, rng):
            """Shared grad body: recompute the sampling decode differentiably
            (or teacher-forced replay), REINFORCE update. Traced inside both
            the host-reward and device-reward jitted grad steps."""
            enc_kwargs = {k: v for k, v in inputs.items() if k != "seqs"}
            b, s, t = sample_seq.shape
            flat = jax.lax.stop_gradient(sample_seq).reshape(b * s, t)

            def loss_fn(params, masks):
                variables = {"params": params}
                if masks:
                    variables["masks"] = masks
                if use_tf_replay:
                    k_enc_drop, k_enc_mask, k_dec = jax.random.split(rng, 3)
                    memory = model.apply(variables, **enc_kwargs, train=True,
                                         rngs={"dropout": k_enc_drop, "mask": k_enc_mask},
                                         method="encode")
                    _, dropout_key, _, _ = decode_train_keys(k_dec)
                    seqs_in = jnp.concatenate(
                        [jnp.full((b * s, 1), model.bos_id, jnp.int32), flat], axis=1)
                    lp = model.apply(variables, memory, seqs_in, True,
                                     method="decode_teacher_forced",
                                     rngs={"dropout": dropout_key})
                    seq_lp = jnp.take_along_axis(lp, flat[..., None], axis=2)[..., 0]
                else:
                    _, seq_lp = _train_sample(variables, enc_kwargs, rng, differentiable=True)
                    seq_lp = seq_lp.reshape(b * s, t)
                mask = (flat != model.pad_id).astype(seq_lp.dtype)
                return losses_mod.reward_loss(seq_lp, mask, rewards)

            loss, grads = jax.value_and_grad(loss_fn, argnums=(0, 1))(state.params, state.masks)
            return self._grad_update(state, *grads), loss

        @_hot_jit
        def grad_fn(state: TrainState, inputs, sample_seq, rewards, rng=None, step=None):
            """Host-reward grad step.

            ``step`` (a traced scalar) overrides the key-derivation step —
            the pipelined step passes the step AT SAMPLING TIME so the
            recompute folds the identical rng even though state.step has
            since advanced."""
            if rng is None:
                # same derivation as sample_fn at the same (pre-update) step
                # -> identical policy realization
                rng = jax.random.fold_in(scst_base_rng, state.step if step is None else step)
            return _reinforce_update(state, inputs, sample_seq, rewards, rng)

        device_reward = (getattr(self, "scst_device", None)
                         if config.get("scst_reward", "host") == "device" else None)
        if device_reward is not None:
            from sparse_caption_tpu.scst import device_reward as devr

            score_dev = device_reward["fn"]
            tbl_dev = device_reward["tbl_dev"]

            @_hot_jit
            def grad_fn_dev(state: TrainState, inputs, sample_seq, greedy_seq, pack, step):
                """Device-reward grad step: CIDEr-D(+BLEU) computed in-jit from
                the sampled ids — the SCST loop never touches the host."""
                rng = jax.random.fold_in(scst_base_rng, step)
                b, s, t = sample_seq.shape
                flat = sample_seq.reshape(b * s, t)
                img_idx = jnp.repeat(jnp.arange(b), s)
                sc_s = score_dev(flat, img_idx, tbl_dev, pack)
                if baseline_mode == "greedy":
                    sc_b = jnp.repeat(
                        score_dev(greedy_seq.reshape(b, t), jnp.arange(b), tbl_dev, pack), s)
                else:
                    sc_b = devr.leave_one_out_baseline(sc_s, s)
                rewards = jax.lax.stop_gradient(sc_s - sc_b)
                state, loss = _reinforce_update(state, inputs, sample_seq, rewards, rng)
                return state, loss, {"avg_reward": jnp.mean(rewards),
                                     "avg_sample": jnp.mean(sc_s),
                                     "avg_baseline": jnp.mean(sc_b)}

        def score_batch(res_np, gts):
            """Host reward pass: decode tokens + CIDEr-D/BLEU scoring."""
            sc_sample, sc_baseline = self._scst_decode_and_score(
                res_np["sample"], res_np["greedy"] if baseline_mode == "greedy" else None, gts)
            rewards = np.asarray(sc_sample - sc_baseline, dtype=np.float32)
            aux = {"avg_reward": float(np.mean(sc_sample - sc_baseline)),
                   "avg_sample": float(np.mean(sc_sample)),
                   "avg_baseline": float(np.mean(sc_baseline))}
            return rewards, aux

        def scst_step(state: TrainState, batch, rng=None):
            inputs = self._model_inputs(batch, with_seqs=False)
            if device_reward is not None and rng is None:
                # fully device-resident step: sampling dispatch -> in-jit
                # reward + grad dispatch. Zero host syncs; the ref pack is
                # host-precomputed numpy (overlaps the in-flight sampling).
                res = sample_fn(self._variables(state), inputs, None, state.step)
                pack = self._scst_ref_pack(batch["gts"])
                return grad_fn_dev(state, inputs, res["sample"],
                                   res.get("greedy"), pack, state.step)
            if rng is None:
                k_sample = None
                res = sample_fn(self._variables(state), inputs, None, state.step)
            else:
                k_sample, _ = jax.random.split(rng)
                res = sample_fn(self._variables(state), inputs, k_sample)
            sample_seq = res["sample"]  # (B, S, T)
            # one batched device->host transfer (round trips are expensive on
            # tunneled TPU backends)
            res_np = jax.device_get(res)
            rewards, aux = score_batch(res_np, batch["gts"])
            # same key as phase 1 -> identical policy realization
            state, loss = grad_fn(state, inputs, sample_seq, rewards, k_sample)
            return state, loss, aux

        # pieces reused by the pipelined wrapper (make_scst_pipelined_step)
        scst_step.sample_fn = sample_fn
        scst_step.grad_fn = grad_fn
        scst_step.score_batch = score_batch
        scst_step.use_tf_replay = use_tf_replay
        return scst_step

    def make_scst_pipelined_step(self):
        """Software-pipelined SCST (``--scst_pipeline 1``): hides the host
        reward pass AND the device->host token fetch behind device compute.

        Per call (batch N):

        1. dispatch batch N's sampling decode (async, ~3 ms on tunneled
           backends) under the current state
        2. hand batch N's token fetch to a background thread — the ~33 ms
           relay round trip is network wait (GIL released), so it overlaps
           everything the host does next
        3. join batch N-1's fetch (started one call ago — usually already
           complete), score it on host, and dispatch its REINFORCE grad
           step behind batch N's sampling

        The device therefore never idles during CIDEr-D scoring, and the
        host never sits in a synchronous ``device_get`` — the two dead
        times of the serial two-phase step (~33 ms/step relay round trip
        + scorer time).

        With ``--scst_reward device`` the serial step already runs with no
        host participation at all (rewards in-jit), so pipelining is
        redundant — this factory then returns the device serial step,
        which also avoids the pipeline's policy-lag delta.

        Semantics delta vs the reference (utils/training.py:202-255),
        documented and measured (STATUS.md round 3): batch N samples under
        a policy that is ONE update stale (batch N-1's grad has not been
        applied yet when N's sampling dispatches). Tokens and rewards stay
        exactly paired; the teacher-forced replay recomputes their logprobs
        under the by-then-current params (standard one-step policy lag, as
        in async actor-learner RL). Restricted to the teacher-forced-replay
        path (dense transformer + random sampling): the scan-recompute path
        would REGENERATE tokens under the newer params and could diverge
        from what was scored.
        """
        serial = self.make_scst_step()
        if (getattr(self, "scst_device", None) is not None
                and self.config.get("scst_reward", "host") == "device"):
            logger.info("--scst_pipeline is redundant with --scst_reward device "
                        "(rewards are in-jit; the serial step has no host dead "
                        "time) — using the device serial step")
            return serial
        if not serial.use_tf_replay:
            raise ValueError(
                "--scst_pipeline requires the teacher-forced-replay SCST path "
                "(transformer-family model with deterministic masks — dense or "
                "frozen/magnitude-pruned, not train-mode supermask — and "
                "--scst_sample random); the scan-recompute path cannot "
                "tolerate policy lag")
        sample_fn, grad_fn, score_batch = serial.sample_fn, serial.grad_fn, serial.score_batch
        pending: Dict[str, Any] = {}
        # key-derivation counter: state.step LAGS the batch index here (the
        # grad for batch N-1 applies after batch N's sampling dispatch), so
        # deriving from state.step would reuse a key for the first two
        # batches and stay one behind thereafter. A host counter keeps the
        # key schedule identical to the serial step's.
        counter: Dict[str, int] = {}
        # two workers: at most two fetches are ever outstanding (batch N's
        # is submitted before batch N-1's is joined), and both run
        # concurrent with host scoring/dispatch, whose GIL the network
        # wait releases
        fetch_pool = ThreadPoolExecutor(max_workers=2, thread_name_prefix="scst_fetch")

        def _complete(state: TrainState, p):
            """Join batch N-1's background fetch, score it, dispatch its grad."""
            res_np = p["future"].result()
            rewards, aux = score_batch(res_np, p["gts"])
            state, loss = grad_fn(state, p["inputs"], p["sample_seq"], rewards,
                                  None, p["step"])
            return state, loss, aux

        def scst_pipelined_step(state: TrainState, batch, rng=None):
            assert rng is None, "pipelined SCST derives keys from its batch counter"
            inputs = self._model_inputs(batch, with_seqs=False)
            if "v" not in counter:
                counter["v"] = int(state.step)
            # np scalar, not jnp: an eager device op here would cost a ~3 ms
            # relay dispatch per step on tunneled backends
            sample_step = np.asarray(counter["v"], np.int32)
            counter["v"] += 1
            res = sample_fn(self._variables(state), inputs, None, sample_step)
            future = fetch_pool.submit(jax.device_get, res)  # background fetch
            loss, aux = jnp.zeros(()), None
            if pending:
                # score + grad batch N-1 while the device samples batch N and
                # the fetch thread waits out batch N's relay round trip
                state, loss, aux = _complete(state, pending.copy())
            pending.clear()
            pending.update(inputs=inputs, sample_seq=res["sample"], gts=batch["gts"],
                           step=sample_step, future=future)
            return state, loss, aux

        def flush(state: TrainState):
            """Apply the last pending grad (epoch end / pre-checkpoint)."""
            if not pending:
                return state, None, None
            p = pending.copy()
            pending.clear()
            state, loss, aux = _complete(state, p)
            return state, loss, aux

        scst_pipelined_step.flush = flush
        return scst_pipelined_step

    def make_scst_fused_step(self):
        """Single-jit SCST step (``--scst_fused``): the sampling decode runs
        under grad inside the jitted step and the CIDEr-D/BLEU reward comes
        back through ``io_callback`` — gradients attach to the *sampling*
        logprobs themselves (exactly the reference's semantics,
        utils/training.py:225-254) with no host round-trip between device
        programs.  The sampling decode runs under the train-mode policy
        (dropout + per-step supermask draws), matching the reference and
        the default two-phase step's recompute semantics.
        """
        config = self.config
        model = self.model
        sample_opt, greedy_opt, num_samples, sample_mode, baseline_mode, max_len = (
            self._scst_opts(differentiable=True))

        device_reward = (getattr(self, "scst_device", None)
                         if config.get("scst_reward", "host") == "device" else None)

        holder: Dict[str, Any] = {"gts": None}  # set per batch before the jit call

        def host_rewards_fn(sample_ids, greedy_ids):
            sc_s, sc_b = self._scst_decode_and_score(
                np.asarray(sample_ids),
                np.asarray(greedy_ids) if baseline_mode == "greedy" else None,
                holder["gts"])
            return np.asarray(sc_s - sc_b, np.float32)

        from jax.experimental import io_callback

        @jax.custom_vjp
        def rewards_op(sample_ids, greedy_ids):
            n = sample_ids.shape[0] * sample_ids.shape[1]
            return io_callback(host_rewards_fn, jax.ShapeDtypeStruct((n,), jnp.float32),
                               sample_ids, greedy_ids)

        def _rw_fwd(sample_ids, greedy_ids):
            return rewards_op(sample_ids, greedy_ids), None

        def _rw_bwd(_, g):
            del g
            return None, None  # int inputs: no tangents

        rewards_op.defvjp(_rw_fwd, _rw_bwd)

        fused_base_rng = jax.random.fold_in(
            jax.random.PRNGKey(int(self.config.get("seed", 8888)) + 1), 0x5C57)

        if device_reward is not None:
            from sparse_caption_tpu.scst import device_reward as devr

            score_dev = device_reward["fn"]
            tbl_dev = device_reward["tbl_dev"]

        @_hot_jit
        def fused(state: TrainState, inputs, pack=None, rng=None):
            if rng is None:
                rng = jax.random.fold_in(fused_base_rng, state.step)
            enc_kwargs = {k: v for k, v in inputs.items() if k != "seqs"}

            def loss_fn(params, masks):
                variables = {"params": params}
                if masks:
                    variables["masks"] = masks
                k_enc_drop, k_enc_mask, k_dec = jax.random.split(rng, 3)
                # train-mode sampling policy (reference model.train() before
                # the sampling decode, utils/training.py:225-237)
                memory = model.apply(variables, **enc_kwargs, train=True,
                                     rngs={"dropout": k_enc_drop, "mask": k_enc_mask}, method="encode")
                seq, seq_lp = generate(model, variables, memory, sample_opt, rng=k_dec)
                ids = jax.lax.stop_gradient(seq)
                if baseline_mode == "greedy":
                    memory_ev = model.apply(variables, **enc_kwargs, method="encode")
                    greedy_ids = jax.lax.stop_gradient(
                        generate(model, variables, memory_ev, greedy_opt)[0]
                    )
                else:
                    greedy_ids = jnp.zeros((ids.shape[0], 1, ids.shape[2]), jnp.int32)
                if device_reward is not None:
                    # in-jit CIDEr-D: the fused step needs no host callback,
                    # so it runs on backends without host send/recv support
                    # (tunneled/relayed TPUs reject io_callback)
                    bb, ss, tt = ids.shape
                    flat_ids = ids.reshape(bb * ss, tt)
                    img_idx = jnp.repeat(jnp.arange(bb), ss)
                    sc_s = score_dev(flat_ids, img_idx, tbl_dev, pack)
                    if baseline_mode == "greedy":
                        sc_b = jnp.repeat(
                            score_dev(greedy_ids.reshape(bb, tt), jnp.arange(bb),
                                      tbl_dev, pack), ss)
                    else:
                        sc_b = devr.leave_one_out_baseline(sc_s, ss)
                    rewards = jax.lax.stop_gradient(sc_s - sc_b)
                else:
                    rewards = jax.lax.stop_gradient(rewards_op(ids, greedy_ids))
                b, s, t = ids.shape
                flat = ids.reshape(b * s, t)
                mask = (flat != model.pad_id).astype(seq_lp.dtype)
                loss = losses_mod.reward_loss(seq_lp.reshape(b * s, t), mask, rewards)
                return loss, jnp.mean(rewards)

            (loss, avg_reward), grads = jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)(
                state.params, state.masks
            )
            return self._grad_update(state, *grads), loss, avg_reward

        def scst_fused_step(state: TrainState, batch, rng=None):
            holder["gts"] = batch["gts"]
            inputs = self._model_inputs(batch, with_seqs=False)
            pack = self._scst_ref_pack(batch["gts"]) if device_reward is not None else None
            state, loss, avg_reward = fused(state, inputs, pack, rng)
            return state, loss, {"avg_reward": float(avg_reward)}

        return scst_fused_step

    # ----------------------------------------------------------------- eval
    def _decode_opt(self, beam_size: int) -> Dict:
        """Assemble decode options from config (the reference passes the whole
        config as the opt dict, training.py:272)."""
        config = self.config
        opt = {
            "beam_size": beam_size,
            "group_size": int(config.get("group_size", 1)),
            "diversity_lambda": float(config.get("diversity_lambda", 0.5)),
            "length_penalty": str(config.get("length_penalty", "") or ""),
            "decoding_constraint": int(config.get("decoding_constraint", 0)),
            "suppress_UNK": int(config.get("suppress_UNK", 0)),
            "num_random_sample": int(config.get("num_random_sample", 0)),
            "temperature": float(config.get("temperature", 1.0)),
            "sample_method": str(config.get("sample_method", "random")),
        }
        if config.get("remove_bad_endings"):
            from sparse_caption_tpu.decoding.constraints import bad_ending_ids

            opt["bad_ending_ids"] = bad_ending_ids(self.tokenizer)
        return opt

    def eval_on_split(self, loader: BatchLoader, split: str):
        config = self.config
        beam_size = int(config.get(f"beam_size_{split}", config.get("beam_size", 1)))
        if int(config.get("num_random_sample", 0)) > 0:
            # sampling eval requires beam_size < 1 (reference att_model.py:226)
            beam_size = 0
            opt = self._decode_opt(0)
        else:
            opt = self._decode_opt(max(beam_size, 1))
        decode = self._cached_decode(f"eval_beam{beam_size}_ns{opt['num_random_sample']}", opt)
        variables = self._variables(self.state)
        cast_inputs = None
        if str(config.get("eval_cast", "")) == "bf16":
            # in-training eval decode in bf16 (same supported precision as
            # eval_model --cast bf16): ~2x decode throughput on TPU; training
            # numerics untouched — the cast is eval-only, per call. Float
            # INPUTS are cast too: layers adapt weights to the activation
            # dtype (kernel.astype(x.dtype)), so f32 features would silently
            # re-promote the whole encoder back to f32. Two exceptions stay
            # f32: supermask scores (rounding can flip borderline
            # threshold/top-k decisions, silently changing the deployed mask
            # pattern — ops/masked.py casts the 0/1 product, not the score)
            # and "boxes" (bf16 coordinates degenerate the x100-scaled
            # geometry trig; see the train-path note above).
            # jitted: an EAGER per-leaf astype is one ~3 ms relay dispatch
            # per leaf (~150+ leaves per cast — the round-2 lesson); one jit
            # call casts the whole tree in a single dispatch
            @jax.jit
            def _cast_tree(tree):
                return jax.tree.map(
                    lambda x: x.astype(jnp.bfloat16)
                    if jnp.issubdtype(x.dtype, jnp.floating) else x,
                    tree)

            def cast_inputs(tree):  # noqa: E731
                arrays = {k: v for k, v in tree.items()
                          if k != "boxes" and hasattr(v, "dtype")}
                return dict(tree, **_cast_tree(arrays))

            variables = dict(variables, params=_cast_tree(variables["params"]))

        t0 = time.perf_counter()
        predictions, image_paths = [], []
        eval_key = jax.random.PRNGKey(0)  # hoisted: one eager key op, not one per batch
        for batch_idx, batch in enumerate(loader):
            inputs = self._model_inputs(batch, with_seqs=False)
            if cast_inputs is not None:
                inputs = cast_inputs(inputs)
            seq, _ = decode(variables, inputs, eval_key, batch_idx)
            # fetch_global: plain np.asarray single-process; gathers across
            # processes otherwise (the loader carries GLOBAL image_paths, so
            # every process reconstructs the identical full prediction list)
            seq = self.dist.fetch_global(seq)[: batch["batch_valid"]]
            predictions += [self.tokenizer.decode(seq[i, 0]) for i in range(seq.shape[0])]
            image_paths += batch["image_paths"][: batch["batch_valid"]]
        n_img = len(image_paths)
        logger.info("eval %s: %.2f img/sec", split, n_img / max(time.perf_counter() - t0, 1e-9))

        is_test2014 = config.get("mscoco_online_test", False) and split == "test"
        out_dir = os.path.join(config.log_dir, f"{'test2014' if is_test2014 else split}_beam_{beam_size}")
        if config.get("eval_dir_suffix"):
            out_dir += f"_{config.eval_dir_suffix}"
        if not self.dist.is_primary():
            # process 0 owns the caption JSON / score files; callers get the
            # CIDEr via dist.broadcast_scalar (checkpoint_and_eval)
            return predictions, None, out_dir
        json_fpath = os.path.join(out_dir, f"caption_{self.global_step:08d}.json")
        self.data.coco_caption_json_dump(zip(image_paths, predictions), json_fpath)

        if is_test2014:
            # COCO server submissions need a val2014 results file too; fill it
            # with placeholder captions (reference training.py:289-298)
            val_dir = os.path.join(config.dataset_dir, "val2014")
            if os.path.isdir(val_dir):
                val_imgs = [f for f in os.listdir(val_dir) if f.endswith(".jpg")]
                self.data.coco_caption_json_dump(
                    zip(val_imgs, ["an example caption"] * len(val_imgs)),
                    json_fpath.replace(".json", "_val2014.json"),
                )
            return predictions, None, out_dir
        scores, scores_detailed, _ = evaluate_caption_json(
            res_file=json_fpath, ann_file=self.data.annotation_file_path()
        )
        dump_json(os.path.join(out_dir, f"score_{self.global_step:08d}.json"), scores, indent=2, sort_keys=True)
        dump_json(os.path.join(out_dir, f"score_{self.global_step:08d}_detailed.json"),
                  {str(k): v for k, v in scores_detailed.items()}, indent=2, sort_keys=True)
        csv_append_row(
            os.path.join(out_dir, "scores.csv"),
            ["Step"] + self.ALL_METRICS,
            [f"{self.global_step:08d}"]
            + [f"{v:.3f}" if isinstance(v := scores.get(k, float("nan")), (int, float)) else str(v)
               for k in self.ALL_METRICS],
        )
        return predictions, scores, out_dir

    # ----------------------------------------------------------- checkpoint
    def save_checkpoint(self, tag: str) -> None:
        model_tree = {"params": self.state.params, "masks": self.state.masks}
        opt_tree = {"opt_w": self.state.opt_w, "opt_m": self.state.opt_m, "step": self.state.step}
        if self.dist.is_multiprocess() and self.checkpoint_path.endswith(".msgpack"):
            # msgpack is a single host-written file: gather (non-addressable
            # leaves only), write on process 0, barrier so no process races
            # ahead to read a half-written checkpoint. Orbax saves below are
            # collective instead — every process writes its own shards.
            model_tree = self.dist.fetch_global_tree(model_tree)
            opt_tree = self.dist.fetch_global_tree(opt_tree)
            if self.dist.is_primary():
                save_pytree(self.checkpoint_path.format(tag), model_tree)
                save_pytree(self.optimizer_path.format(tag), opt_tree)
            self.dist.sync()
            return
        save_pytree(self.checkpoint_path.format(tag), model_tree)
        save_pytree(self.optimizer_path.format(tag), opt_tree)

    def maybe_load_checkpoint(self) -> bool:
        config = self.config
        start_from = config.get("start_from")
        if not start_from:
            return False
        from sparse_caption_tpu.engine.checkpoints import find_ckpt

        if os.path.isfile(start_from) or str(start_from).endswith(".orbax"):
            restore_dir, model_file = os.path.dirname(start_from), start_from
        elif os.path.isdir(start_from):
            restore_dir = start_from
            tag = "last" if config.get("resume_training", False) else "best"
            model_file = find_ckpt(start_from, f"model_{tag}")
            if tag == "best" and not os.path.exists(model_file):
                # e.g. a gated prune run that never reached its sparsity target
                logger.warning("no model_best in %s; falling back to model_last", start_from)
                model_file = find_ckpt(start_from, "model_last")
        else:
            raise ValueError(f"start_from must be a file or dir: {start_from}")
        # cross-config checks (reference training.py:160-178)
        old_cfg_path = os.path.join(restore_dir, "config.json")
        if os.path.isfile(old_cfg_path):
            old = Config.load_config_json(old_cfg_path)
            for check in ("caption_model", "rnn_size", "num_layers", "d_model"):
                if check in old and check in config and old.get(check) != config.get(check):
                    logger.warning("config mismatch on `%s`: provided %s vs loaded %s",
                                   check, config.get(check), old.get(check))
        restore_log = os.path.join(config.log_dir, "restore_log.txt")
        target = {"params": self.state.params, "masks": self.state.masks}
        merged, _, _ = restore_lenient(target, model_file, restore_log)
        self.state = self.state.replace(params=merged["params"], masks=merged.get("masks", {}))
        if config.get("resume_training", False):
            opt_file = find_ckpt(restore_dir, "optimizer_last")
            if os.path.exists(opt_file):
                opt = load_pytree(opt_file, {"opt_w": self.state.opt_w, "opt_m": self.state.opt_m,
                                             "step": self.state.step})
                self.state = self.state.replace(opt_w=opt["opt_w"], opt_m=opt["opt_m"], step=opt["step"])
                self.global_step = int(opt["step"])
        config.model_restored = True
        logger.info("model weights loaded from %s", model_file)
        return True

    # ------------------------------------------------------------ train loop
    def train(self) -> None:
        config = self.config
        self.prepare()
        self.init_state()
        self.save_checkpoint("init")  # lottery-ticket snapshot
        restored = self.maybe_load_checkpoint()
        self.post_restore_hook()
        if self.mesh is not None:
            # restore_lenient/load_pytree return host arrays, and
            # post_restore_hook (lottery rewind, one-shot/SNIP mask updates)
            # can replace params/masks with host arrays even when nothing
            # was restored — either would drop the TP/ZeRO/FSDP shardings
            # init_state placed, so re-shard unconditionally (idempotent on
            # an already-sharded state)
            from sparse_caption_tpu.parallel import shard_state

            self.state = shard_state(self.state, self.mesh,
                                     zero_opt=bool(self.config.get("zero_opt")),
                                     fsdp=bool(self.config.get("fsdp")))

        xe_step = self.make_xe_step()
        scst_step = None
        profile_dir = config.get("profile_dir")
        profile_steps = int(config.get("profile_steps", 10))
        save_every = int(config.get("save_checkpoint_every", 6000))
        log_every = int(config.get("losses_log_every", 25))
        t_start = time.time()
        bs = self.train_loader.batch_size

        def scst_flush():
            """Apply any in-flight pipelined grad before eval/checkpoint,
            logging its loss/rewards (the flushed batch must not vanish
            from the train curves)."""
            if scst_step is not None and hasattr(scst_step, "flush"):
                self.state, floss, faux = scst_step.flush(self.state)
                if faux is not None:
                    self.tb.add_scalar("train/loss", float(floss), self.global_step)
                    for k2, v in faux.items():
                        if isinstance(v, (int, float)) or (hasattr(v, "ndim") and v.ndim == 0):
                            self.tb.add_scalar(f"train/{k2}", float(v), self.global_step)

        last_ckpt_step = self.global_step  # no end-save if no steps ran
        for epoch in range(config.max_epochs):
            sc_flag = 0 <= int(config.get("scst_start_epoch", -1)) <= epoch
            if sc_flag and scst_step is None:
                if config.get("scst_fused", False):
                    scst_step = self.make_scst_fused_step()
                elif config.get("scst_pipeline", False):
                    scst_step = self.make_scst_pipelined_step()
                else:
                    scst_step = self.make_scst_step()
            for batch in self.train_loader:
                # no per-step host rng: the jitted steps fold their base key
                # with state.step internally (eager host splits are ~3 ms
                # relay dispatches each; also exactly resumable this way)
                if sc_flag:
                    self.state, loss, aux = scst_step(self.state, batch)
                else:
                    inputs = self._model_inputs(batch)
                    self.state, loss, aux = xe_step(self.state, inputs, self._shard_aux(batch["masks"]))
                self.global_step += 1
                if profile_dir and self.global_step == 2:  # skip compile step
                    jax.profiler.start_trace(profile_dir)
                if profile_dir and self.global_step == 2 + profile_steps:
                    jax.profiler.stop_trace()
                    logger.info("profiler trace written to %s", profile_dir)
                self.pre_log_hook(epoch)

                if self.global_step % 5 == 0:
                    dt, t_start = time.time() - t_start, time.time()
                    n_ex = bs * 5 * (1 if sc_flag else config.get("seq_per_img", 5))
                    lr = float(self._schedule(jnp.asarray(self.global_step)))
                    logger.info("epoch %d iter %d: %.0f ex/sec, lr %.2e, loss %.3f",
                                epoch, self.global_step, n_ex / max(dt, 1e-9), lr, float(loss))
                if self.global_step % log_every == 0:
                    self.tb.add_scalar("train/loss", float(loss), self.global_step)
                    self.tb.add_scalar("train/learning_rate",
                                       float(self._schedule(jnp.asarray(self.global_step))), self.global_step)
                    for k2, v in (aux or {}).items():
                        if isinstance(v, (int, float)) or (hasattr(v, "ndim") and v.ndim == 0):
                            self.tb.add_scalar(f"train/{k2}", float(v), self.global_step)

                if self.global_step % save_every == 0 or self.global_step == self.max_train_step:
                    scst_flush()
                    self.checkpoint_and_eval()
                    last_ckpt_step = self.global_step
            scst_flush()  # epoch boundary: no grad left in flight
        if self.global_step != last_ckpt_step:
            # a resumed run's final step is N_restored + max_train_step, so
            # the `== max_train_step` trigger never fires at its end — save
            # the tail window instead of silently discarding it
            self.checkpoint_and_eval()
        from sparse_caption_tpu.engine.checkpoints import wait_for_checkpoints

        wait_for_checkpoints()  # join any in-flight async orbax save
        self.tb.close()

    # hooks overridden by the prune trainer
    def post_restore_hook(self) -> None:
        pass

    def pre_log_hook(self, epoch: int) -> None:
        pass

    def allow_best_checkpoint(self) -> bool:
        return True

    def checkpoint_and_eval(self) -> None:
        predictions, scores, _ = self.eval_on_split(self.val_loader, split="val")
        if scores:
            for k, v in scores.items():
                if isinstance(v, (int, float)):  # skip "skipped (...)" markers
                    self.tb.add_scalar(f"val/{k}", v, self.global_step)
        self.save_checkpoint("last")
        # multi-process: only process 0 computed scores — broadcast the
        # CIDEr so every process takes the same best-checkpoint branch
        # (orbax saves are collective; divergence would deadlock)
        cider = self.dist.broadcast_scalar(
            scores["CIDEr"] if scores and isinstance(scores.get("CIDEr"), (int, float)) else 0.0)
        if cider > self.best_val_score and self.allow_best_checkpoint():
            self.best_val_score = cider
            self.save_checkpoint("best")
            self.config.best_global_step = self.global_step
        if self.dist.is_primary():
            self.config.save_config(self.config.log_dir)

    # ------------------------------------------------------------ eval entry
    def eval_test(self) -> Dict:
        test_loader = self.get_loader("test", train=False)
        self.config.beam_size_test = self.config.get("beam_size_test", 2)
        _, scores, _ = self.eval_on_split(test_loader, split="test")
        return scores
