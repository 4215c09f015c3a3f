#!/bin/bash
# LLaVA-Next-Mistral-7B DDPO on RLHF-V (dense segment-weighted DPO) —
# reference recipe scripts/ddpo_*.sh, max_length 2048, diff masks precomputed.
set -e
CKPT=${CKPT:-/ckpts/llava-v1.6-mistral-7b-hf}
OUT=${OUT:-out/ddpo_llava_next}

python -m vlrlhf_tpu.cli.main dpo \
  --model_name_or_path "$CKPT" \
  --dataset_name rlhfv --data_path HaoyeZhang/RLHF-V-Dataset \
  --image_root "${IMAGE_ROOT:-.}" \
  --output_dir "$OUT" \
  --per_device_train_batch_size 2 --gradient_accumulation_steps 16 \
  --learning_rate 1e-5 --max_length 2048 --max_prompt_length 1024 \
  --beta 0.1 --loss_type ddpo \
  --use_lora true --lora_r 64 --lora_alpha 16 \
  --freeze_vision_tower true --mesh_fsdp -1 "$@"
