#!/bin/bash
# Qwen-VL-Chat DPO on a SINGLE 16 GiB v5e chip — the wide-int8 QLoRA mode.
# Qwen-VL is 9.66B params (151k vocab + ViT-bigG + resampler); in bf16 it
# cannot run on one v5e at any remat policy. --q_lora --q_lora_vision
# int8-quantizes the frozen LM stack AND the frozen tower/projector
# (ops/quant.py TRAIN_QUANT_PATTERNS_WIDE), which fits it at 1 pair/step:
# measured 1.67 pairs/s at 53.5% MFU (mlp1 remat, precomputed ref logps).
# Same optimizer hyperparameters as the reference recipe
# (/root/reference/scripts/dpo_qwenvl.sh); global batch kept at 256 via
# gradient accumulation.
set -e

CKPT=${CKPT:-/ckpts/Qwen-VL-Chat}
DATA=${DATA:-MMInstruction/VLFeedback}
OUT=${OUT:-out/dpo_qwenvl_v5e}

python -m vlrlhf_tpu.cli.main dpo \
  --model_name_or_path "$CKPT" \
  --dataset_name vlfeedback_paired --data_path "$DATA" --score_margin -1 \
  --output_dir "$OUT" \
  --per_device_train_batch_size 1 \
  --gradient_accumulation_steps 256 \
  --learning_rate 1e-5 --lr_scheduler_type cosine --warmup_ratio 0.1 \
  --num_train_epochs 1 \
  --max_length 1024 --max_prompt_length 512 \
  --beta 0.1 --loss_type sigmoid \
  --use_lora true --lora_r 64 --lora_alpha 16 --lora_target_modules auto \
  --freeze_vision_tower true \
  --q_lora true --q_lora_vision true \
  --precompute_ref_logps true \
  --logits_chunk 512 --remat_policy mlp1 \
  --logging_steps 10 --save_steps 500 \
  --report_to jsonl,wandb --run_name dpo_qwenvl_v5e "$@"
