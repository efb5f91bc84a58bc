"""Two-stage CLI argument assembly (parity: reference ``sparse_caption/opts.py:17-77``).

Stage 1 parses dataset / tokenizer / caption_model names; stage 2 merges
each selected component's ``add_argparse_args`` group plus the training
flags, preserving the reference's public flag surface (it is the API).
"""

from __future__ import annotations

import os
from argparse import ArgumentDefaultsHelpFormatter, ArgumentParser, Namespace

from sparse_caption_tpu.config import Config, list_of_floats
from sparse_caption_tpu.data import DATASET_REGISTRY, get_dataset
from sparse_caption_tpu.engine.optim import ALL_OPTIMIZERS, ALL_SCHEDULERS
from sparse_caption_tpu.models import MODEL_REGISTRY, get_model
from sparse_caption_tpu.pruning import VALID_MASKS
from sparse_caption_tpu.tokenizers import TOKENIZER_REGISTRY, get_tokenizer


def add_training_args(parser) -> None:
    """Training/eval flag surface (reference utils/training.py:346-513)."""
    parser.add_argument("--seed", type=int, default=8888)
    parser.add_argument("--cache_min_free_ram", type=float, default=0.4)
    parser.add_argument("--num_workers", type=int, default=4)
    parser.add_argument("--cached_tokens", type=str, default=None)
    parser.add_argument("--dataset_archive_url", type=str, default=None,
                        help="override for the Karpathy caption_datasets.zip origin "
                             "(http(s), file://, or local path — see utils/file_io.get_file)")
    parser.add_argument("--annotations_archive_url", type=str, default=None,
                        help="override for the official COCO annotations zip origin")
    parser.add_argument("--fetch_official_annotations", action="store_true",
                        help="fetch/use the official captions_val2014.json as metric GT "
                             "instead of GT synthesized from the Karpathy split")
    parser.add_argument("--id", type=str, default="")
    parser.add_argument("--log_dir", type=str, default="runs")
    parser.add_argument("--start_from", type=str, default="")
    parser.add_argument("--resume_training", action="store_true")
    parser.add_argument("--save_checkpoint_every", type=int, default=6000)
    parser.add_argument("--losses_log_every", type=int, default=25)
    parser.add_argument("--batch_size", type=int, default=15)
    parser.add_argument("--batch_size_eval", type=int, default=50)
    parser.add_argument("--max_epochs", type=int, default=15)
    parser.add_argument("--weight_decay", type=float, default=0.0)
    parser.add_argument("--grad_clip", type=float, default=0.1)
    parser.add_argument("--label_smoothing", type=float, default=0.0)
    parser.add_argument("--eval_cast", type=str, default="", choices=["", "bf16"],
                        help="cast params to bf16 for the IN-TRAINING eval decodes "
                             "(~2x TPU decode throughput; training numerics untouched)")
    parser.add_argument("--train_precision", type=str, default="fp32", choices=["fp32", "bf16"],
                        help="bf16: XE forward/backward matmuls in bfloat16 (the MXU-native "
                             "dtype) with f32 master params/grads/optimizer/losses — standard "
                             "TPU mixed precision, ~2-4x step throughput at paper scale")
    parser.add_argument("--optim", type=str, default="adam", choices=ALL_OPTIMIZERS)
    parser.add_argument("--optim_alpha", type=float, default=0.9)
    parser.add_argument("--optim_beta", type=float, default=0.999)
    parser.add_argument("--optim_epsilon", type=float, default=1e-8)
    parser.add_argument("--lr_scheduler", type=str, default="noam", choices=ALL_SCHEDULERS)
    parser.add_argument("--noamopt_warmup", type=int, default=10000)
    parser.add_argument("--noamopt_factor", type=float, default=1.0)
    parser.add_argument("--learning_rate", type=float, default=5e-4)
    parser.add_argument("--learning_rate_min", type=float, default=1e-5)
    parser.add_argument("--learning_rate_decay_start", type=int, default=0)
    parser.add_argument("--learning_rate_decay_every", type=int, default=3)
    parser.add_argument("--learning_rate_decay_rate", type=float, default=0.8)
    parser.add_argument("--scst_start_epoch", type=int, default=-1)
    parser.add_argument("--scst_num_samples", type=int, default=10)
    parser.add_argument("--scst_sample", type=str, default="random", choices=["beam_search", "random"])
    parser.add_argument("--scst_baseline", type=str, default="sample", choices=["greedy", "sample"])
    parser.add_argument("--scst_cider_weight", type=float, default=1.0)
    parser.add_argument("--scst_bleu_weight", type=list_of_floats, default=(0.0, 0.0, 0.0, 0.0))
    parser.add_argument("--scst_reward", type=str, default="host", choices=["host", "device"],
                        help="'device': compute the CIDEr-D(+BLEU) reward INSIDE the jitted step "
                             "(scst/device_reward.py) — no device->host transfer per SCST step; "
                             "requires word or radix tokenization (radix digit ids are "
                             "regrouped to word ids in-jit). 'host' (default): reference-style "
                             "host scoring (any tokenizer)")
    parser.add_argument("--scst_fused", action="store_true",
                        help="single-jit SCST step: sampling under grad + io_callback rewards "
                             "(requires a PJRT backend with host callbacks; tunneled/relay TPU "
                             "backends may not support it — the default two-phase step always works)")
    parser.add_argument("--scst_pipeline", action="store_true",
                        help="software-pipelined SCST: host CIDEr-D scoring of batch N overlaps "
                             "the device grad step of batch N-1 (device never idles). Documented "
                             "semantics delta: sampling runs under a one-update-stale policy. "
                             "Requires dense transformer + --scst_sample random")
    parser.add_argument("--beam_size_test", type=int, default=2)
    parser.add_argument("--beam_size_val", type=int, default=1)
    parser.add_argument("--eval_dir_suffix", type=str, default=None)
    # decoding constraints (reference beam opts, caption_model.py:114-123)
    parser.add_argument("--length_penalty", type=str, default="",
                        help="'' | 'wu_<alpha>' | 'avg_<alpha>'")
    parser.add_argument("--decoding_constraint", type=int, default=0,
                        help="1: forbid repeating the previous token")
    parser.add_argument("--suppress_UNK", type=int, default=0)
    parser.add_argument("--remove_bad_endings", type=int, default=0,
                        help="1: forbid EOS after dangling function words")
    parser.add_argument("--group_size", type=int, default=1, help="diverse beam groups")
    parser.add_argument("--diversity_lambda", type=float, default=0.5)
    # sampling-mode generation (reference att_model.py:186-188 reads these
    # from the opt/config dict; caption_model.py:228-268 sample_next_word)
    parser.add_argument("--num_random_sample", type=int, default=0,
                        help="> 0 with beam_size < 1: sample N captions per image")
    parser.add_argument("--temperature", type=float, default=1.0)
    parser.add_argument("--sample_method", type=str, default="random",
                        help="'random' | 'greedy' | 'gumbel' | 'top<k>' (int k) | 'top<p>' (0<p<1 nucleus)")
    parser.add_argument("--ss_prob", type=float, default=0.0,
                        help="scheduled-sampling probability (up_down_lstm XE unroll)")
    parser.add_argument("--max_att_regions", type=int, default=36)
    parser.add_argument("--mesh_shape", type=str, default=None,
                        help="device mesh, e.g. '4,2' for (data=4, model=2); None = single device")
    parser.add_argument("--zero_opt", action="store_true",
                        help="ZeRO-1: shard optimizer moments over the mesh data axis "
                             "(1/dp optimizer memory; XLA derives the reduce-scatter/"
                             "all-gather collectives)")
    parser.add_argument("--ckpt_backend", type=str, default="msgpack",
                        choices=["msgpack", "orbax"],
                        help="checkpoint format: msgpack (single-file, reference-style "
                             "layout) or orbax (async sharded save — per-shard writes "
                             "dispatched without gathering to host, overlapping "
                             "training; restore reads either format)")
    parser.add_argument("--pipeline_stages", type=int, default=0,
                        help="GPipe pipeline parallelism over the decoder layer stack: "
                             "shard L/N contiguous layers per stage over an N-device "
                             "('pipe',) mesh, microbatches hopping stages via ppermute "
                             "(parallel/pipeline.py). XE-only, transformer-family models "
                             "incl. pruned variants (supermasks sample once per step "
                             "outside the pipeline — exact, since one step is one "
                             "forward), deterministic forward (no dropout). Composes "
                             "with a DATA-only --mesh_shape D as a (data, pipe) DxN "
                             "mesh; a tensor axis is rejected. num_layers % N must be 0")
    parser.add_argument("--pipeline_microbatches", type=int, default=None,
                        help="microbatches per global batch for --pipeline_stages "
                             "(default N; bubble fraction (N-1)/(M+N-1) — choose M >> N)")
    parser.add_argument("--fsdp", action="store_true",
                        help="ZeRO-3 / fully-sharded data parallel: shard the params "
                             "themselves over the mesh data axis (1/dp parameter + "
                             "optimizer memory; XLA derives the just-in-time all-gather "
                             "and gradient reduce-scatter collectives)")
    parser.add_argument("--platform", type=str, default=None, choices=[None, "cpu", "tpu"],
                        help="pin the JAX platform (overrides environment plugins)")
    # multi-process (multi-host) execution — SURVEY §2.11's new component;
    # one process per host, jax.distributed over DCN, mesh over global devices
    parser.add_argument("--dist_coordinator", type=str, default=None,
                        help="host:port of process 0's coordination service; setting this "
                             "enables multi-process mode (jax.distributed.initialize)")
    parser.add_argument("--dist_num_processes", type=int, default=1)
    parser.add_argument("--dist_process_id", type=int, default=None,
                        help="this process's id in [0, dist_num_processes)")
    parser.add_argument("--dist_local_device_count", type=int, default=None,
                        help="force N virtual host devices per process (CPU testing)")
    parser.add_argument("--dist_platform", type=str, default=None, choices=[None, "cpu", "tpu"],
                        help="platform for the distributed backend (cpu enables gloo collectives)")
    parser.add_argument("--profile_dir", type=str, default=None,
                        help="write a jax.profiler trace of steps 2..2+profile_steps here")
    parser.add_argument("--profile_steps", type=int, default=10)
    parser.add_argument("--remat", action="store_true",
                        help="rematerialize activations in the XE backward pass (memory for FLOPs)")


def add_pruning_args(parser) -> None:
    """Pruning flag surface (reference pruning/prune.py:436-476)."""
    parser.add_argument("--prune_type", type=str, default="", choices=list(VALID_MASKS) + [""])
    parser.add_argument("--prune_sparsity_target", type=float, default=0.8)
    parser.add_argument("--prune_mask_freeze_scope", type=str, default="")
    parser.add_argument("--prune_snip_grad_accum", type=int, default=1)
    parser.add_argument("--prune_supermask_init", type=float, default=5.0)
    parser.add_argument("--prune_supermask_sparsity_weight", type=float, default=-1.0)
    parser.add_argument("--prune_supermask_lr", type=float, default=1e2)
    parser.add_argument("--prune_supermask_bypass_sigmoid_grad", action="store_true")
    parser.add_argument("--prune_gradual_frequency", type=int, default=1000)
    parser.add_argument("--prune_gradual_on_device", action="store_true",
                        help="compute gradual magnitude-prune thresholds on-device "
                             "(jnp.quantile in one jitted call) instead of the host "
                             "argsort — avoids fetching the full parameter set every "
                             "update (~90 s/update at paper scale through a tunneled TPU)")


def parse_opt(arguments=None, include_pruning: bool = False) -> Namespace:
    parser = ArgumentParser(formatter_class=ArgumentDefaultsHelpFormatter)
    # stage 1: component selection
    DATASET_REGISTRY.import_all("sparse_caption_tpu.data")
    TOKENIZER_REGISTRY.import_all("sparse_caption_tpu.tokenizers")
    MODEL_REGISTRY.import_all("sparse_caption_tpu.models")
    parser.add_argument("--dataset", type=str, default="mscoco", choices=DATASET_REGISTRY.names())
    parser.add_argument("--tokenizer", type=str, default="word", choices=TOKENIZER_REGISTRY.names())
    parser.add_argument("--caption_model", type=str, default="relation_transformer",
                        choices=MODEL_REGISTRY.names())
    parser.add_argument("--logging_level", type=str, default="INFO",
                        choices=["CRITICAL", "ERROR", "WARNING", "INFO", "DEBUG"])
    args, _ = parser.parse_known_args(arguments)

    # stage 2: component argument groups
    add_training_args(parser.add_argument_group("Training"))
    get_dataset(args.dataset).add_argparse_args(parser.add_argument_group("Dataset"))
    get_tokenizer(args.tokenizer).add_argparse_args(parser.add_argument_group("Tokenizer"))
    get_model(args.caption_model).add_argparse_args(parser.add_argument_group("Model"))
    parser.add_argument("--max_seq_length", type=int, default=None,
                        help="max caption length incl. BOS/EOS; default per tokenizer")
    parser.add_argument("--seq_per_img", type=int, default=5)
    parser.add_argument("--input_att_dir", type=str, default=None)
    parser.add_argument("--input_fc_dir", type=str, default=None)
    parser.add_argument("--input_rel_box_dir", type=str, default=None)
    if include_pruning or args.caption_model.endswith("_prune"):
        add_pruning_args(parser.add_argument_group("Pruning"))
    args = parser.parse_args(arguments)

    if args.max_seq_length is None:
        tok_cls = get_tokenizer(args.tokenizer)
        args.max_seq_length = getattr(tok_cls, "DEFAULT_MAX_SEQ_LENGTH", 18)
    args.log_dir = os.path.join(args.log_dir, f"{args.id}") if args.id else args.log_dir
    return args


def config_from_args(args: Namespace) -> Config:
    return Config(**vars(args))
