#!/bin/bash
# Reward model -> PPO pipeline (reference scripts/rm_qwenvl.sh + ppo_qwenvl.sh).
set -e
CKPT=${CKPT:-/ckpts/Qwen-VL-Chat}
OUT=${OUT:-out/qwenvl}

python -m vlrlhf_tpu.cli.main rm \
  --model_name_or_path "$CKPT" \
  --dataset_name vlfeedback_paired --data_path MMInstruction/VLFeedback \
  --output_dir "$OUT/rm" \
  --per_device_train_batch_size 4 --gradient_accumulation_steps 8 \
  --learning_rate 1e-5 --max_length 1024 \
  --use_lora true --lora_r 64 --lora_alpha 16 --mesh_fsdp -1 "$@"

python -m vlrlhf_tpu.cli.main ppo \
  --model_name_or_path "$CKPT" \
  --dataset_name vlquery_json --data_path "${PPO_QUERIES:-queries.json}" \
  --image_root "${IMAGE_ROOT:-.}" \
  --reward_model_path "$OUT/rm/adapters" \
  --output_dir "$OUT/ppo" \
  --per_device_train_batch_size 8 --learning_rate 1e-5 \
  --init_kl_coef 0.2 --max_new_tokens 128 --mesh_fsdp -1 "$@"
