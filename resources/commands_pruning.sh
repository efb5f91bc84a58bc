#!/usr/bin/env bash
# Reproduction recipes for the pruning experiment matrix of the paper
# (capability parity: reference resources/commands_pruning.sh — identical
# models, prune types, sparsity targets, supermask loss weights, and SCST
# fine-tuning stages, expressed as one parameterized loop over both model
# families on this framework's CLI).
#
# Set LOG_DIR / DATASET_DIR. Single chip by default; add
# `--mesh_shape 4,2` (data x model) to shard over a TPU slice.
set -e

LOG_DIR="${LOG_DIR:-runs/mscoco_v1}"
DATASET_DIR="${DATASET_DIR:-/datasets/mscoco}"
CACHE_FREE_RAM=0.3
TARGETS="0.9875 0.975 0.95"

# family table: model_type:model_id:scheduler:extra-lr-flags:dropout-flag
FAMILIES=(
    "up_down_lstm:UpDownLSTM:cosine:lr0.01:drop_prob_lm"
    "relation_transformer:RTrans:noam:default:drop_prob_src"
)

lr_flags() {  # per-family optimizer settings
    [ "$1" = "lr0.01" ] && echo "--learning_rate 0.01 --optim_epsilon 0.01" || echo ""
}

for FAM in "${FAMILIES[@]}"; do
    IFS=: read -r MODEL_TYPE MODEL_ID SCHEDULER LRKIND DROPFLAG <<< "${FAM}"
    LR=$(lr_flags "${LRKIND}")
    PRUNE_TYPE_MODEL="${MODEL_TYPE}_prune"
    BASE_DIR="${LOG_DIR}/${MODEL_ID}__baseline"

    ## 1) dense baseline
    python scripts/train_transformer.py \
        --caption_model "${MODEL_TYPE}" --dataset_dir "${DATASET_DIR}" --log_dir "${LOG_DIR}" \
        --lr_scheduler "${SCHEDULER}" ${LR} \
        --id "${MODEL_ID}__baseline" --cache_min_free_ram ${CACHE_FREE_RAM}

    ## 2) SCST fine-tune of the dense baseline (paper SCST config: random
    ##    sampling, leave-one-out sample-mean baseline, BLEU-4 mixed in)
    python scripts/train_transformer.py \
        --caption_model "${MODEL_TYPE}" --dataset_dir "${DATASET_DIR}" --log_dir "${LOG_DIR}" \
        --start_from "${BASE_DIR}/model_best.msgpack" \
        --lr_scheduler step --learning_rate 5e-5 --learning_rate_decay_start -1 \
        --batch_size 5 --max_epochs 10 --"${DROPFLAG}" 0.1 --losses_log_every 75 \
        --scst_start_epoch 0 --scst_num_samples 15 --scst_sample random \
        --scst_baseline sample --scst_bleu_weight 0,0,0,1 \
        --id "${MODEL_ID}__baseline__SCST_random_sample_s15_e10_C1B0001" \
        --cache_min_free_ram ${CACHE_FREE_RAM}

    ## 3) supermask sweep: sparsity x sparsity-loss weight
    for T in ${TARGETS}; do for W in 40 80 120; do
        python scripts/train_n_prune_transformer.py \
            --caption_model "${PRUNE_TYPE_MODEL}" --dataset_dir "${DATASET_DIR}" --log_dir "${LOG_DIR}" \
            --lr_scheduler "${SCHEDULER}" ${LR} --"${DROPFLAG}" 0.1 \
            --prune_type supermask --prune_sparsity_target "${T}" \
            --prune_supermask_sparsity_weight "${W}" \
            --id "${MODEL_ID}__supermask__${T}__wg_${W}" --cache_min_free_ram ${CACHE_FREE_RAM}
    done; done

    ## 4) gradual magnitude + SNIP, trained from scratch
    for PT in mag_grad_uniform snip; do for T in ${TARGETS}; do
        python scripts/train_n_prune_transformer.py \
            --caption_model "${PRUNE_TYPE_MODEL}" --dataset_dir "${DATASET_DIR}" --log_dir "${LOG_DIR}" \
            --lr_scheduler "${SCHEDULER}" ${LR} --"${DROPFLAG}" 0.1 \
            --prune_type "${PT}" --prune_sparsity_target "${T}" \
            --id "${MODEL_ID}__${PT}__${T}" --cache_min_free_ram ${CACHE_FREE_RAM}
    done; done

    ## 5) one-shot magnitude, fine-tuned 10 epochs from the dense baseline
    for PT in mag_blind mag_uniform mag_dist; do for T in ${TARGETS}; do
        python scripts/train_n_prune_transformer.py \
            --caption_model "${PRUNE_TYPE_MODEL}" --dataset_dir "${DATASET_DIR}" --log_dir "${LOG_DIR}" \
            --start_from "${BASE_DIR}" --max_epochs 10 \
            --lr_scheduler "${SCHEDULER}" ${LR} --"${DROPFLAG}" 0.1 \
            --prune_type "${PT}" --prune_sparsity_target "${T}" \
            --id "${MODEL_ID}__${PT}__${T}" --cache_min_free_ram ${CACHE_FREE_RAM}
    done; done

    ## 6) lottery tickets: rewind-to-init with the magnitude mask, and
    ##    frozen gradual-pruning masks
    for T in ${TARGETS}; do
        python scripts/train_n_prune_transformer.py \
            --caption_model "${PRUNE_TYPE_MODEL}" --dataset_dir "${DATASET_DIR}" --log_dir "${LOG_DIR}" \
            --start_from "${BASE_DIR}" \
            --lr_scheduler "${SCHEDULER}" ${LR} --"${DROPFLAG}" 0.1 \
            --prune_type lottery_mag_uniform --prune_sparsity_target "${T}" \
            --id "${MODEL_ID}__lottery_mag_uniform__${T}" --cache_min_free_ram ${CACHE_FREE_RAM}
        python scripts/train_n_prune_transformer.py \
            --caption_model "${PRUNE_TYPE_MODEL}" --dataset_dir "${DATASET_DIR}" --log_dir "${LOG_DIR}" \
            --start_from "${LOG_DIR}/${MODEL_ID}__mag_grad_uniform__${T}" \
            --lr_scheduler "${SCHEDULER}" ${LR} --"${DROPFLAG}" 0.1 \
            --prune_type lottery_mask_freeze --prune_sparsity_target "${T}" \
            --id "${MODEL_ID}__lottery_mask_freeze__${T}" --cache_min_free_ram ${CACHE_FREE_RAM}
    done
done

## 7) sparse SCST: fine-tune with the BINARIZED supermask frozen
##    (UpDown at 0.991/wg120 with 60 samples; RTrans at 0.9875/wg80 with 15
##    — the published model-size results)
scst_mask_freeze() {  # model_type id_prefix target wg samples dropflag
    python scripts/train_n_prune_transformer.py \
        --caption_model "$1_prune" --dataset_dir "${DATASET_DIR}" --log_dir "${LOG_DIR}" \
        --start_from "${LOG_DIR}/$2__supermask__$3__wg_$4/model_best_bin_mask.msgpack" \
        --lr_scheduler step --learning_rate 5e-5 --learning_rate_decay_start -1 \
        --batch_size 5 --max_epochs 10 --"$6" 0.1 --losses_log_every 75 \
        --prune_type mask_freeze --prune_sparsity_target "$3" \
        --scst_start_epoch 0 --scst_num_samples "$5" --scst_sample random \
        --scst_baseline sample --scst_bleu_weight 0,0,0,1 \
        --id "$2__supermask__$3__SCST_random_sample_s$5_e10_C1B0001" \
        --cache_min_free_ram ${CACHE_FREE_RAM}
}
scst_mask_freeze up_down_lstm UpDownLSTM 0.991 120 60 drop_prob_lm
scst_mask_freeze relation_transformer RTrans 0.9875 80 15 drop_prob_src

## aggregate + sanity-check results
# python scripts/collect_scores.py --runs_dir "${LOG_DIR}"
# python scripts/collect_scores.py --runs_dir "${LOG_DIR}" --check_compiled_scores
