#!/bin/bash
# LLaVA-1.5-7B SFT on a vlquery json (reference scripts/sft_*.sh).
set -e
CKPT=${CKPT:-/ckpts/llava-1.5-7b-hf}
python -m vlrlhf_tpu.cli.main sft \
  --model_name_or_path "$CKPT" \
  --dataset_name vlquery_json --data_path "${DATA:-queries.json}" \
  --image_root "${IMAGE_ROOT:-.}" \
  --output_dir "${OUT:-out/sft_llava15}" \
  --per_device_train_batch_size 8 --gradient_accumulation_steps 4 \
  --learning_rate 2e-5 --num_train_epochs 1 --max_length 2048 \
  --use_lora true --lora_r 64 --lora_alpha 16 --freeze_vision_tower true \
  --merge_adapter_after_training --mesh_fsdp -1 "$@"
