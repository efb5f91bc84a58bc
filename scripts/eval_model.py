#!/usr/bin/env python
"""Standalone eval entry (parity: reference ``scripts/eval_model.py:18-94``).

Loads ``<log_dir>/config.json`` (+ migration), restores the requested
checkpoint (dense msgpack or sparse npz densified), and evaluates val/test.
"""

import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from sparse_caption_tpu.config import Config
from sparse_caption_tpu.utils.jax_setup import enable_persistent_cache
from sparse_caption_tpu.utils.misc import configure_logging


def parse_args():
    p = argparse.ArgumentParser(formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    p.add_argument("--log_dir", type=str, required=True, help="run dir containing config.json + checkpoints")
    p.add_argument("--ckpt", type=str, default="best", help="checkpoint tag (best/last/...) or file path")
    p.add_argument("--split", type=str, default="test", choices=["train", "val", "test"],
                   help="'train' evaluates memorization on the train images "
                        "(deduped, generation mode) — beyond the reference, whose "
                        "eval_model restricts to val/test (utils/training.py:330-344)")
    p.add_argument("--beam_size", type=int, default=None)
    p.add_argument("--eval_dir_suffix", type=str, default=None)
    # decode-option overrides (the reference passes the run config as the
    # decode opt dict, utils/training.py:272; these override config.json)
    p.add_argument("--group_size", type=int, default=None, help="diverse beam groups")
    p.add_argument("--diversity_lambda", type=float, default=None)
    p.add_argument("--length_penalty", type=str, default=None, help="'' | 'wu_<a>' | 'avg_<a>'")
    p.add_argument("--decoding_constraint", type=int, default=None)
    p.add_argument("--suppress_UNK", type=int, default=None)
    p.add_argument("--remove_bad_endings", type=int, default=None)
    p.add_argument("--num_random_sample", type=int, default=None,
                   help="> 0 (with --beam_size 0): sampling eval")
    p.add_argument("--temperature", type=float, default=None)
    p.add_argument("--sample_method", type=str, default=None,
                   help="'random' | 'greedy' | 'gumbel' | 'top<k>' | 'top<p>'")
    p.add_argument("--id", type=str, default="",
                   help="run name under --log_dir (reference eval_model usage: "
                        "--log_dir <experiments root> --id <run>); empty = --log_dir IS the run dir")
    p.add_argument("--logging_level", type=str, default="INFO")
    p.add_argument("--platform", type=str, default=None, choices=["cpu", "tpu"])
    p.add_argument("--cast", type=str, default=None, choices=["bf16", "fp16"],
                   help="cast float params before eval and re-save the cast checkpoint "
                        "(reference eval_model.py:73-76 fp16 re-export)")
    return p.parse_args()


def main():
    args = parse_args()
    if args.id:
        args.log_dir = os.path.join(args.log_dir, args.id)
    configure_logging(args.logging_level)
    from sparse_caption_tpu.utils.jax_setup import select_platform

    select_platform(args.platform)
    enable_persistent_cache()
    import jax
    import numpy as np

    from sparse_caption_tpu.engine.checkpoints import load_pytree
    from sparse_caption_tpu.engine.training import TrainingModule
    from sparse_caption_tpu.pruning.engine import sparse_import

    config = Config.load_config_json(args.log_dir)
    config.log_dir = args.log_dir
    if config.get("mesh_shape"):
        # a training mesh persisted from an explicit --mesh_shape; eval on a
        # host that cannot satisfy it (e.g. one chip) degrades to
        # single-device — checkpoints hold full replicated values
        import math as _math

        mesh_n = _math.prod(int(x) for x in str(config.mesh_shape).split(","))
        if mesh_n > jax.device_count():
            import logging

            logging.getLogger(__name__).warning(
                "config mesh_shape %s needs %d devices but %d are available; "
                "evaluating single-device", config.mesh_shape, mesh_n, jax.device_count())
            config.mesh_shape = None
    # read-only: never rewrite the training run's config.json with the
    # eval-time mutations below (stripped model name, decode overrides) —
    # a later --resume_training must see the ORIGINAL config
    config.config_save_skip = True
    best_step = int(config.get("best_global_step", 0))  # prepare() resets it
    # eval of a pruned run loads the folded weights into the dense model
    # (reference eval strips `_prune`, train_n_prune_transformer.py:293-301)
    was_prune = str(config.caption_model).endswith("_prune")
    prune_type = config.get("prune_type")
    if was_prune:
        config.caption_model = config.caption_model[: -len("_prune")]
    if args.eval_dir_suffix:
        config.eval_dir_suffix = args.eval_dir_suffix
    if args.beam_size is not None:
        setattr(config, f"beam_size_{args.split}", args.beam_size)
    for flag in ("group_size", "diversity_lambda", "length_penalty", "decoding_constraint",
                 "suppress_UNK", "remove_bad_endings", "num_random_sample", "temperature",
                 "sample_method"):
        if getattr(args, flag) is not None:
            setattr(config, flag, getattr(args, flag))

    module = TrainingModule(config)
    module.prepare()
    module.init_state()

    if os.path.isfile(args.ckpt) or str(args.ckpt).endswith(".orbax"):
        ckpt_path = args.ckpt
    else:
        from sparse_caption_tpu.engine.checkpoints import find_ckpt

        ckpt_path = find_ckpt(args.log_dir, f"model_{args.ckpt}")
    if ckpt_path.endswith(".npz"):
        params = sparse_import(dict(np.load(ckpt_path)))
        module.state = module.state.replace(params=jax.tree.map(jax.numpy.asarray, params))
    else:
        ckpt = load_pytree(ckpt_path)
        params, masks = ckpt["params"], ckpt.get("masks", {}) or {}
        if was_prune and masks and prune_type:
            # train checkpoints carry RAW params + the masks collection;
            # the stripped dense model never reads masks, so fold them
            # into the weights here (w * mask, round(sigmoid) for
            # supermasks) — otherwise the eval would score the unmasked
            # stale weights (the reference avoids this by defaulting to
            # the densified model_best_pruned_sparse.pth)
            from sparse_caption_tpu.pruning.engine import prune_weights

            params = prune_weights(params, masks, prune_type)
            masks = {}
        module.state = module.state.replace(
            params=jax.tree.map(jax.numpy.asarray, params),
            masks=masks,
        )
    if args.cast:
        import jax.numpy as jnp

        from sparse_caption_tpu.engine.checkpoints import save_pytree

        dt = jnp.bfloat16 if args.cast == "bf16" else jnp.float16
        cast = lambda x: x.astype(dt) if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating) else x  # noqa: E731
        module.state = module.state.replace(params=jax.tree.map(cast, module.state.params))
        # splitext, NOT str.replace: a .npz checkpoint path must become
        # <stem>_<cast>.msgpack rather than silently overwriting the
        # sparse export with msgpack bytes
        save_pytree(os.path.splitext(ckpt_path)[0] + f"_{args.cast}.msgpack",
                    {"params": module.state.params, "masks": module.state.masks})
        if args.cast == "bf16":
            # cast the float INPUTS too (eval_on_split honors eval_cast):
            # layers adapt weights to the activation dtype, so f32 features
            # would silently re-promote the encoder back to f32
            module.config.eval_cast = "bf16"
    loader = module.get_loader(args.split, train=False)
    module.global_step = best_step  # stashed before prepare() reset it
    _, scores, out_dir = module.eval_on_split(loader, split=args.split)
    print(scores)


if __name__ == "__main__":
    main()
