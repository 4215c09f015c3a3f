#!/bin/bash
# llava-1.5-7b-hf DPO on VLFeedback (reference scripts/dpo_*.sh recipe shape).
set -e
CKPT=${CKPT:-/ckpts/llava-1.5-7b-hf}
OUT=${OUT:-out/dpo_llava15}

python -m vlrlhf_tpu.cli.main dpo \
  --model_name_or_path "$CKPT" \
  --dataset_name vlfeedback_paired --data_path ${DATA:-MMInstruction/VLFeedback} \
  --output_dir "$OUT" \
  --per_device_train_batch_size 4 --gradient_accumulation_steps 8 \
  --learning_rate 1e-5 --lr_scheduler_type cosine --warmup_ratio 0.1 \
  --num_train_epochs 1 --max_length 1024 --max_prompt_length 512 \
  --beta 0.1 --loss_type sigmoid \
  --use_lora true --lora_r 64 --lora_alpha 16 --freeze_vision_tower true \
  --mesh_fsdp -1 "$@"
