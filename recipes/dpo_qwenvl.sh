#!/bin/bash
# Qwen-VL-Chat DPO on VLFeedback — the reference recipe
# (/root/reference/scripts/dpo_qwenvl.sh, README.md:72-115: global batch 256 =
# 4/dev x ga8 x 8 devices, LoRA r64 a16, lr 1e-5 cosine, seq 1024) on a v5p-8
# mesh (fsdp over all chips).
set -e

CKPT=${CKPT:-/ckpts/Qwen-VL-Chat}
DATA=${DATA:-MMInstruction/VLFeedback}
OUT=${OUT:-out/dpo_qwenvl}

python -m vlrlhf_tpu.cli.main dpo \
  --model_name_or_path "$CKPT" \
  --dataset_name vlfeedback_paired --data_path "$DATA" --score_margin -1 \
  --output_dir "$OUT" \
  --per_device_train_batch_size 4 \
  --gradient_accumulation_steps 8 \
  --learning_rate 1e-5 --lr_scheduler_type cosine --warmup_ratio 0.1 \
  --num_train_epochs 1 \
  --max_length 1024 --max_prompt_length 512 \
  --beta 0.1 --loss_type sigmoid \
  --use_lora true --lora_r 64 --lora_alpha 16 --lora_target_modules auto \
  --freeze_vision_tower true \
  --mesh_fsdp -1 \
  --logging_steps 10 --save_steps 500 \
  --report_to jsonl,wandb --run_name dpo_qwenvl "$@"
