#!/usr/bin/env bash
# Reproduction recipes for the pruning experiment matrix
# (capability parity: reference resources/commands_pruning.sh:1-371 —
# same models, prune types, sparsity targets, supermask weights, and SCST
# fine-tuning stages, on this framework's CLI).
#
# Set LOG_DIR / DATASET_DIR for your machine. Every command runs on a
# single TPU chip by default; add `--mesh_shape 4,2` (data=4 x model=2)
# to shard across a slice.
set -e

LOG_DIR="${LOG_DIR:-runs/mscoco_v1}"
DATASET_DIR="${DATASET_DIR:-/datasets/mscoco}"
CACHE_FREE_RAM=0.3

### Collect scores ###
# python scripts/collect_scores.py --log_dir ${LOG_DIR}

### Eval a finished run ###
# python scripts/eval_model.py --log_dir ${LOG_DIR}/RTrans__supermask__0.9875 \
#     --split test --beam_size 2 --cast bf16

######################
# Up-Down LSTM
######################

MODEL_TYPE="up_down_lstm"
MODEL_ID="UpDownLSTM"
SCHEDULER="cosine"

# Baseline dense
python scripts/train_transformer.py \
    --caption_model ${MODEL_TYPE} \
    --dataset_dir ${DATASET_DIR} \
    --log_dir ${LOG_DIR} \
    --lr_scheduler ${SCHEDULER} \
    --learning_rate 0.01 \
    --optim_epsilon 0.01 \
    --id ${MODEL_ID}__baseline \
    --cache_min_free_ram ${CACHE_FREE_RAM}

# SCST fine-tune from the dense baseline
BASELINE="${LOG_DIR}/${MODEL_ID}__baseline/model_best.msgpack"
python scripts/train_transformer.py \
    --caption_model ${MODEL_TYPE} \
    --dataset_dir ${DATASET_DIR} \
    --log_dir ${LOG_DIR} \
    --start_from ${BASELINE} \
    --lr_scheduler step \
    --learning_rate 5e-5 \
    --learning_rate_decay_start -1 \
    --batch_size 5 \
    --max_epochs 10 \
    --drop_prob_lm 0.1 \
    --losses_log_every 75 \
    --scst_start_epoch 0 \
    --scst_num_samples 15 \
    --scst_sample random \
    --scst_baseline sample \
    --scst_bleu_weight 0,0,0,1 \
    --id ${MODEL_ID}__baseline__SCST_random_sample_s15_e10_C1B0001 \
    --cache_min_free_ram ${CACHE_FREE_RAM}

# Pruning: supermask sweep (sparsity x loss weight)
MODEL_TYPE="up_down_lstm_prune"
for PRUNE_SPARSITY_TARGET in 0.9875 0.975 0.95; do
    for PRUNE_WEIGHT in 40 80 120; do
        python scripts/train_n_prune_transformer.py \
            --caption_model ${MODEL_TYPE} \
            --dataset_dir ${DATASET_DIR} \
            --log_dir ${LOG_DIR} \
            --lr_scheduler ${SCHEDULER} \
            --learning_rate 0.01 \
            --optim_epsilon 0.01 \
            --drop_prob_lm 0.1 \
            --prune_type supermask \
            --prune_sparsity_target ${PRUNE_SPARSITY_TARGET} \
            --prune_supermask_sparsity_weight ${PRUNE_WEIGHT} \
            --id ${MODEL_ID}__supermask__${PRUNE_SPARSITY_TARGET}__wg_${PRUNE_WEIGHT} \
            --cache_min_free_ram ${CACHE_FREE_RAM}
    done
done

# Gradual magnitude + SNIP (train from scratch)
for PRUNE_TYPE in mag_grad_uniform snip; do
    for PRUNE_SPARSITY_TARGET in 0.9875 0.975 0.95; do
        python scripts/train_n_prune_transformer.py \
            --caption_model ${MODEL_TYPE} \
            --dataset_dir ${DATASET_DIR} \
            --log_dir ${LOG_DIR} \
            --lr_scheduler ${SCHEDULER} \
            --learning_rate 0.01 \
            --optim_epsilon 0.01 \
            --drop_prob_lm 0.1 \
            --prune_type ${PRUNE_TYPE} \
            --prune_sparsity_target ${PRUNE_SPARSITY_TARGET} \
            --id ${MODEL_ID}__${PRUNE_TYPE}__${PRUNE_SPARSITY_TARGET} \
            --cache_min_free_ram ${CACHE_FREE_RAM}
    done
done

# One-shot magnitude (fine-tune from the dense baseline, 10 epochs)
BASELINE_DIR="${LOG_DIR}/${MODEL_ID}__baseline"
for PRUNE_TYPE in mag_blind mag_uniform mag_dist; do
    for PRUNE_SPARSITY_TARGET in 0.9875 0.975 0.95; do
        python scripts/train_n_prune_transformer.py \
            --caption_model ${MODEL_TYPE} \
            --dataset_dir ${DATASET_DIR} \
            --start_from ${BASELINE_DIR} \
            --log_dir ${LOG_DIR} \
            --max_epochs 10 \
            --lr_scheduler ${SCHEDULER} \
            --learning_rate 0.01 \
            --optim_epsilon 0.01 \
            --drop_prob_lm 0.1 \
            --prune_type ${PRUNE_TYPE} \
            --prune_sparsity_target ${PRUNE_SPARSITY_TARGET} \
            --id ${MODEL_ID}__${PRUNE_TYPE}__${PRUNE_SPARSITY_TARGET} \
            --cache_min_free_ram ${CACHE_FREE_RAM}
    done
done

# Lottery ticket: rewind to init with the magnitude mask
for PRUNE_SPARSITY_TARGET in 0.9875 0.975 0.95; do
    python scripts/train_n_prune_transformer.py \
        --caption_model ${MODEL_TYPE} \
        --dataset_dir ${DATASET_DIR} \
        --start_from ${BASELINE_DIR} \
        --log_dir ${LOG_DIR} \
        --lr_scheduler ${SCHEDULER} \
        --learning_rate 0.01 \
        --optim_epsilon 0.01 \
        --drop_prob_lm 0.1 \
        --prune_type lottery_mag_uniform \
        --prune_sparsity_target ${PRUNE_SPARSITY_TARGET} \
        --id ${MODEL_ID}__lottery_mag_uniform__${PRUNE_SPARSITY_TARGET} \
        --cache_min_free_ram ${CACHE_FREE_RAM}
done

# Lottery with frozen gradual-pruning masks
GRAD_BASE="${LOG_DIR}/${MODEL_ID}__mag_grad_uniform"
for PRUNE_SPARSITY_TARGET in 0.9875 0.975 0.95; do
    python scripts/train_n_prune_transformer.py \
        --caption_model ${MODEL_TYPE} \
        --dataset_dir ${DATASET_DIR} \
        --start_from ${GRAD_BASE}__${PRUNE_SPARSITY_TARGET} \
        --log_dir ${LOG_DIR} \
        --lr_scheduler ${SCHEDULER} \
        --learning_rate 0.01 \
        --optim_epsilon 0.01 \
        --drop_prob_lm 0.1 \
        --prune_type lottery_mask_freeze \
        --prune_sparsity_target ${PRUNE_SPARSITY_TARGET} \
        --id ${MODEL_ID}__lottery_mask_freeze__${PRUNE_SPARSITY_TARGET} \
        --cache_min_free_ram ${CACHE_FREE_RAM}
done

# SCST fine-tune with the binarized supermask frozen
PRUNE_SPARSITY_TARGET=0.991
BIN_BASE="${LOG_DIR}/${MODEL_ID}__supermask__${PRUNE_SPARSITY_TARGET}__wg_120/model_best_bin_mask.msgpack"
python scripts/train_n_prune_transformer.py \
    --caption_model ${MODEL_TYPE} \
    --dataset_dir ${DATASET_DIR} \
    --log_dir ${LOG_DIR} \
    --start_from ${BIN_BASE} \
    --lr_scheduler step \
    --learning_rate 5e-5 \
    --learning_rate_decay_start -1 \
    --batch_size 5 \
    --max_epochs 10 \
    --drop_prob_lm 0.1 \
    --prune_type mask_freeze \
    --prune_sparsity_target ${PRUNE_SPARSITY_TARGET} \
    --losses_log_every 75 \
    --scst_start_epoch 0 \
    --scst_num_samples 60 \
    --scst_sample random \
    --scst_baseline sample \
    --scst_bleu_weight 0,0,0,1 \
    --id ${MODEL_ID}__supermask__${PRUNE_SPARSITY_TARGET}__SCST_random_sample_s60_e10_C1B0001 \
    --cache_min_free_ram ${CACHE_FREE_RAM}

######################
# Relation Transformer (ORT)
######################

MODEL_TYPE="relation_transformer"
MODEL_ID="RTrans"
SCHEDULER="noam"

# Baseline dense
python scripts/train_transformer.py \
    --caption_model ${MODEL_TYPE} \
    --dataset_dir ${DATASET_DIR} \
    --log_dir ${LOG_DIR} \
    --lr_scheduler ${SCHEDULER} \
    --id ${MODEL_ID}__baseline \
    --cache_min_free_ram ${CACHE_FREE_RAM}

# SCST fine-tune (the dense-transformer two-phase step uses the
# teacher-forced-replay gradient pass automatically)
BASELINE="${LOG_DIR}/${MODEL_ID}__baseline/model_best.msgpack"
python scripts/train_transformer.py \
    --caption_model ${MODEL_TYPE} \
    --dataset_dir ${DATASET_DIR} \
    --log_dir ${LOG_DIR} \
    --start_from ${BASELINE} \
    --lr_scheduler step \
    --learning_rate 5e-5 \
    --learning_rate_decay_start -1 \
    --batch_size 5 \
    --max_epochs 10 \
    --drop_prob_src 0.1 \
    --losses_log_every 75 \
    --scst_start_epoch 0 \
    --scst_num_samples 15 \
    --scst_sample random \
    --scst_baseline sample \
    --scst_bleu_weight 0,0,0,1 \
    --id ${MODEL_ID}__baseline__SCST_random_sample_s15_e10_C1B0001 \
    --cache_min_free_ram ${CACHE_FREE_RAM}

# Pruning sweeps (same matrix as Up-Down above)
MODEL_TYPE="relation_transformer_prune"
BASELINE_DIR="${LOG_DIR}/${MODEL_ID}__baseline"
for PRUNE_SPARSITY_TARGET in 0.9875 0.975 0.95; do
    for PRUNE_WEIGHT in 40 80 120; do
        python scripts/train_n_prune_transformer.py \
            --caption_model ${MODEL_TYPE} \
            --dataset_dir ${DATASET_DIR} \
            --log_dir ${LOG_DIR} \
            --lr_scheduler ${SCHEDULER} \
            --drop_prob_src 0.1 \
            --prune_type supermask \
            --prune_sparsity_target ${PRUNE_SPARSITY_TARGET} \
            --prune_supermask_sparsity_weight ${PRUNE_WEIGHT} \
            --id ${MODEL_ID}__supermask__${PRUNE_SPARSITY_TARGET}__wg_${PRUNE_WEIGHT} \
            --cache_min_free_ram ${CACHE_FREE_RAM}
    done
done

for PRUNE_TYPE in mag_grad_uniform snip; do
    for PRUNE_SPARSITY_TARGET in 0.9875 0.975 0.95; do
        python scripts/train_n_prune_transformer.py \
            --caption_model ${MODEL_TYPE} \
            --dataset_dir ${DATASET_DIR} \
            --log_dir ${LOG_DIR} \
            --lr_scheduler ${SCHEDULER} \
            --drop_prob_src 0.1 \
            --prune_type ${PRUNE_TYPE} \
            --prune_sparsity_target ${PRUNE_SPARSITY_TARGET} \
            --id ${MODEL_ID}__${PRUNE_TYPE}__${PRUNE_SPARSITY_TARGET} \
            --cache_min_free_ram ${CACHE_FREE_RAM}
    done
done

for PRUNE_TYPE in mag_blind mag_uniform mag_dist; do
    for PRUNE_SPARSITY_TARGET in 0.9875 0.975 0.95; do
        python scripts/train_n_prune_transformer.py \
            --caption_model ${MODEL_TYPE} \
            --dataset_dir ${DATASET_DIR} \
            --start_from ${BASELINE_DIR} \
            --log_dir ${LOG_DIR} \
            --max_epochs 10 \
            --lr_scheduler ${SCHEDULER} \
            --drop_prob_src 0.1 \
            --prune_type ${PRUNE_TYPE} \
            --prune_sparsity_target ${PRUNE_SPARSITY_TARGET} \
            --id ${MODEL_ID}__${PRUNE_TYPE}__${PRUNE_SPARSITY_TARGET} \
            --cache_min_free_ram ${CACHE_FREE_RAM}
    done
done

for PRUNE_SPARSITY_TARGET in 0.9875 0.975 0.95; do
    python scripts/train_n_prune_transformer.py \
        --caption_model ${MODEL_TYPE} \
        --dataset_dir ${DATASET_DIR} \
        --start_from ${BASELINE_DIR} \
        --log_dir ${LOG_DIR} \
        --lr_scheduler ${SCHEDULER} \
        --drop_prob_src 0.1 \
        --prune_type lottery_mag_uniform \
        --prune_sparsity_target ${PRUNE_SPARSITY_TARGET} \
        --id ${MODEL_ID}__lottery_mag_uniform__${PRUNE_SPARSITY_TARGET} \
        --cache_min_free_ram ${CACHE_FREE_RAM}
done

GRAD_BASE="${LOG_DIR}/${MODEL_ID}__mag_grad_uniform"
for PRUNE_SPARSITY_TARGET in 0.9875 0.975 0.95; do
    python scripts/train_n_prune_transformer.py \
        --caption_model ${MODEL_TYPE} \
        --dataset_dir ${DATASET_DIR} \
        --start_from ${GRAD_BASE}__${PRUNE_SPARSITY_TARGET} \
        --log_dir ${LOG_DIR} \
        --lr_scheduler ${SCHEDULER} \
        --drop_prob_src 0.1 \
        --prune_type lottery_mask_freeze \
        --prune_sparsity_target ${PRUNE_SPARSITY_TARGET} \
        --id ${MODEL_ID}__lottery_mask_freeze__${PRUNE_SPARSITY_TARGET} \
        --cache_min_free_ram ${CACHE_FREE_RAM}
done

# SCST with the binarized supermask frozen
PRUNE_SPARSITY_TARGET=0.9875
BIN_BASE="${LOG_DIR}/${MODEL_ID}__supermask__${PRUNE_SPARSITY_TARGET}__wg_80/model_best_bin_mask.msgpack"
python scripts/train_n_prune_transformer.py \
    --caption_model ${MODEL_TYPE} \
    --dataset_dir ${DATASET_DIR} \
    --log_dir ${LOG_DIR} \
    --start_from ${BIN_BASE} \
    --lr_scheduler step \
    --learning_rate 5e-5 \
    --learning_rate_decay_start -1 \
    --batch_size 5 \
    --max_epochs 10 \
    --drop_prob_src 0.1 \
    --prune_type mask_freeze \
    --prune_sparsity_target ${PRUNE_SPARSITY_TARGET} \
    --losses_log_every 75 \
    --scst_start_epoch 0 \
    --scst_num_samples 15 \
    --scst_sample random \
    --scst_baseline sample \
    --scst_bleu_weight 0,0,0,1 \
    --id ${MODEL_ID}__supermask__${PRUNE_SPARSITY_TARGET}__SCST_random_sample_s15_e10_C1B0001 \
    --cache_min_free_ram ${CACHE_FREE_RAM}
