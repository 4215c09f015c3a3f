#!/bin/bash
# internlm-xcomposer2-vl-7b DPO on a SINGLE 16 GiB v5e chip.
# XC2's 490px tower emits 1225 image tokens, so real rows need seq 2048;
# at that length only wide-int8 QLoRA + 'attn' remat fits (measured
# 0.758 pairs/s at 48.4% MFU, 1 pair/step, precomputed ref logps).
# Reference hyperparameters; global batch 256 kept via accumulation.
set -e
CKPT=${CKPT:-/ckpts/internlm-xcomposer2-vl-7b}
OUT=${OUT:-out/dpo_internlm_xc2_v5e}

python -m vlrlhf_tpu.cli.main dpo \
  --model_name_or_path "$CKPT" \
  --dataset_name vlfeedback_paired --data_path ${DATA:-MMInstruction/VLFeedback} \
  --output_dir "$OUT" \
  --per_device_train_batch_size 1 --gradient_accumulation_steps 256 \
  --learning_rate 1e-5 --lr_scheduler_type cosine --warmup_ratio 0.1 \
  --num_train_epochs 1 --max_length 2048 --max_prompt_length 1536 \
  --beta 0.1 --loss_type sigmoid \
  --use_lora true --lora_r 64 --lora_alpha 16 --freeze_vision_tower true \
  --q_lora true --q_lora_vision true --remat_policy attn \
  --precompute_ref_logps true \
  --logging_steps 10 --save_steps 500 "$@"
