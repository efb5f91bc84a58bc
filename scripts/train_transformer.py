#!/usr/bin/env python
"""Dense training entry (parity: reference ``scripts/train_transformer.py:20-155``).

Example (tiny fixture run):
    python scripts/train_transformer.py \
        --caption_model relation_transformer --dataset mscoco_testing \
        --dataset_dir /tmp/fixtures --log_dir /tmp/run \
        --d_model 16 --dim_feedforward 32 --num_layers 2 --num_heads 4 \
        --att_feat_size 16 --batch_size 2 --max_epochs 1 --vocab_size 64
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from sparse_caption_tpu.config import Config
from sparse_caption_tpu.engine.training import TrainingModule
from sparse_caption_tpu.opts import parse_opt
from sparse_caption_tpu.utils.jax_setup import enable_persistent_cache
from sparse_caption_tpu.utils.misc import configure_logging


def main(config: Config) -> None:
    from sparse_caption_tpu.utils.jax_setup import select_platform

    select_platform(config.get("platform"))
    # CPU pipeline/mesh runs need virtual host devices BEFORE backend init
    n_pipe = int(config.get("pipeline_stages") or 0)
    if n_pipe > 1 and config.get("platform") == "cpu":
        from sparse_caption_tpu.utils.jax_setup import ensure_host_device_count

        ensure_host_device_count(n_pipe)
    # multi-process mode must connect BEFORE the first backend touch
    # (set_global_seed below creates a PRNGKey, which initializes it)
    from sparse_caption_tpu.parallel import distributed as dist

    dist.maybe_initialize_from_config(config)
    enable_persistent_cache()
    import jax

    from sparse_caption_tpu.utils.rngs import set_global_seed

    set_global_seed(int(config.get("seed", 8888)))
    module = TrainingModule(config)
    module.train()
    # final test eval from the best checkpoint (reference train_transformer.py:135-141;
    # os.path.exists — with --ckpt_backend orbax the artifact is a directory)
    best = module.checkpoint_path.format("best")
    import os

    if os.path.exists(best):
        from sparse_caption_tpu.engine.checkpoints import load_pytree

        ckpt = load_pytree(best)
        module.state = module.state.replace(params=jax.tree.map(jax.numpy.asarray, ckpt["params"]),
                                            masks=ckpt.get("masks", {}))
    module.eval_test()


if __name__ == "__main__":
    args = parse_opt()
    configure_logging(args.logging_level)
    main(Config(**vars(args)))
