#!/usr/bin/env bash
# Reproduction recipes for the ACORT experiment matrix
# (capability parity: reference resources/commands_acort.sh:1-273 — ACORT
# base/small with radix-768 subword tokens + kv attention sharing + layer
# sharing, ORT base/small/xsmall baselines, SCST fine-tune, and the 5-run
# speed-test loops, on this framework's CLI).
set -e

LOG_DIR="${LOG_DIR:-runs/mscoco_v1}"
DATASET_DIR="${DATASET_DIR:-/datasets/mscoco}"
CACHE_FREE_RAM=0.3

ACORT_FLAGS=(
    --tokenizer radix
    --radix_base 768
    --max_seq_length 26
    --share_att_encoder kv
    --share_att_decoder kv
    --share_layer_encoder "(0, 0, 0, 1, 1, 1)"
    --share_layer_decoder "(0, 0, 0, 1, 1, 1)"
)

######################
# ACORT
######################

MODEL_TYPE="relation_transformer"
SCHEDULER="noam"

# ACORT-base (d512, shared kv + layers, radix tokens)
python scripts/train_transformer.py \
    --caption_model ${MODEL_TYPE} \
    --dataset_dir ${DATASET_DIR} \
    --log_dir ${LOG_DIR} \
    --lr_scheduler ${SCHEDULER} \
    "${ACORT_FLAGS[@]}" \
    --d_model 512 \
    --dim_feedforward 2048 \
    --id ACORT__base \
    --cache_min_free_ram ${CACHE_FREE_RAM}

# ACORT-small (d256)
python scripts/train_transformer.py \
    --caption_model ${MODEL_TYPE} \
    --dataset_dir ${DATASET_DIR} \
    --log_dir ${LOG_DIR} \
    --lr_scheduler ${SCHEDULER} \
    "${ACORT_FLAGS[@]}" \
    --d_model 256 \
    --dim_feedforward 1024 \
    --id ACORT__small \
    --cache_min_free_ram ${CACHE_FREE_RAM}

######################
# ORT baselines
######################

for CFG in "base:512:2048" "small:256:1024" "xsmall:104:416"; do
    NAME="${CFG%%:*}"; REST="${CFG#*:}"; DM="${REST%%:*}"; FF="${REST#*:}"
    python scripts/train_transformer.py \
        --caption_model ${MODEL_TYPE} \
        --dataset_dir ${DATASET_DIR} \
        --log_dir ${LOG_DIR} \
        --lr_scheduler ${SCHEDULER} \
        --d_model ${DM} \
        --dim_feedforward ${FF} \
        --id ORT__${NAME} \
        --cache_min_free_ram ${CACHE_FREE_RAM}
done

######################
# SCST fine-tune (ACORT-small)
######################

BASELINE="${LOG_DIR}/ACORT__small/model_best.msgpack"
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
    "${ACORT_FLAGS[@]}" \
    --d_model 256 \
    --dim_feedforward 1024 \
    --id ACORT__small__SCST_random_sample_s15_e10_C1B0001 \
    --cache_min_free_ram ${CACHE_FREE_RAM}

######################
# Speed tests (5 runs each; the reference sleeps 5 min between runs)
######################

for VARIANT in "ACORT__base:512:2048:share" "ACORT__base-AL:512:2048:noshare" "ACORT__small:256:1024:share"; do
    NAME="${VARIANT%%:*}"; REST="${VARIANT#*:}"; DM="${REST%%:*}"; REST="${REST#*:}"; FF="${REST%%:*}"; SHARE="${REST#*:}"
    if [ "${SHARE}" = "share" ]; then LAYERS="(0, 0, 0, 1, 1, 1)"; else LAYERS="(0, 0, 0, 0, 0, 0)"; fi
    for x in 1 2 3 4 5; do
        python scripts/train_transformer.py \
            --caption_model ${MODEL_TYPE} \
            --dataset_dir ${DATASET_DIR} \
            --log_dir ${LOG_DIR} \
            --lr_scheduler ${SCHEDULER} \
            --tokenizer radix \
            --radix_base 768 \
            --max_seq_length 26 \
            --share_att_encoder kv \
            --share_att_decoder kv \
            --share_layer_encoder "${LAYERS}" \
            --share_layer_decoder "${LAYERS}" \
            --d_model ${DM} \
            --dim_feedforward ${FF} \
            --id ${NAME}__speedtest_run${x} \
            --cache_min_free_ram ${CACHE_FREE_RAM}
        sleep 5m
    done
done

for CFG in "base:512:2048" "small:256:1024" "xsmall:104:416"; do
    NAME="${CFG%%:*}"; REST="${CFG#*:}"; DM="${REST%%:*}"; FF="${REST#*:}"
    for x in 1 2 3 4 5; do
        python scripts/train_transformer.py \
            --caption_model ${MODEL_TYPE} \
            --dataset_dir ${DATASET_DIR} \
            --log_dir ${LOG_DIR} \
            --lr_scheduler ${SCHEDULER} \
            --d_model ${DM} \
            --dim_feedforward ${FF} \
            --id ORT__${NAME}__speedtest_run${x} \
            --cache_min_free_ram ${CACHE_FREE_RAM}
        sleep 5m
    done
done
