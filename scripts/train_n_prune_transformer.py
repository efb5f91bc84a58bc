#!/usr/bin/env python
"""Prune-training entry (parity: reference
``scripts/train_n_prune_transformer.py:27-322``): trains a ``*_prune`` model
with one of the supermask / magnitude / SNIP / lottery / gradual methods and
exports pruned checkpoints.

The supermask sparsity-weight default and the ``_prune`` log-dir suffix
follow the reference main() (:304-315).
"""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from sparse_caption_tpu.config import Config
from sparse_caption_tpu.engine.prune_training import PruneTrainingModule
from sparse_caption_tpu.opts import parse_opt
from sparse_caption_tpu.utils.jax_setup import enable_persistent_cache
from sparse_caption_tpu.utils.misc import configure_logging
from sparse_caption_tpu.utils.rngs import set_global_seed


def main(config: Config) -> None:
    from sparse_caption_tpu.utils.jax_setup import select_platform

    select_platform(config.get("platform"))
    # multi-process mode must connect BEFORE the first backend touch
    from sparse_caption_tpu.parallel import distributed as dist

    dist.maybe_initialize_from_config(config)
    enable_persistent_cache()
    set_global_seed(int(config.get("seed", 8888)))
    assert config.caption_model.endswith("_prune"), "use a `*_prune` caption_model with this script"
    # log-dir suffix describing the prune setup (reference :304-315)
    suffix = f"{config.prune_type}_{config.prune_sparsity_target}"
    if not str(config.log_dir).rstrip("/").endswith(suffix):
        config.log_dir = os.path.join(config.log_dir, suffix) if config.get("append_prune_suffix", True) else config.log_dir
    module = PruneTrainingModule(config)
    module.train()

    # eval best pruned checkpoint on test (reference :293-301 strips `_prune`
    # and loads the sparse ckpt densified; here the folded ckpt is native)
    # os.path.exists — with --ckpt_backend orbax the artifact is a directory
    best = module.checkpoint_path.format("best_pruned")
    if os.path.exists(best):
        import jax

        from sparse_caption_tpu.engine.checkpoints import load_pytree

        ckpt = load_pytree(best)
        module.state = module.state.replace(params=jax.tree.map(jax.numpy.asarray, ckpt["params"]),
                                            masks=ckpt.get("masks", {}))
        module.eval_test()


if __name__ == "__main__":
    args = parse_opt(include_pruning=True)
    configure_logging(args.logging_level)
    main(Config(**vars(args)))
