#!/bin/bash
# MMBench eval WITH the in-process LLM choice-extraction judge, both models
# co-resident on ONE 16 GiB v5e — the reference needs a separate lmdeploy
# judge server + VLMEvalKit env for this flow (scripts/eval/mmbench.sh:25-35).
#
# Memory plan (proven by tools/judge_coresidency.py on the real chip):
#   eval model  int8        7.0 GiB   judge model int8 (lm-only)  6.4 GiB
#   eval cache  B=8 int8KV  1.4 GiB   judge cache B=8 int8KV      0.6 GiB
# --quantize applies int8 weights to BOTH loads (the judge keeps only its
# LM trunk — judging is text-only); --kv_cache_dtype int8 halves both
# caches, which is what makes two 7B stacks fit 15.75 GiB at all.
set -e
CKPT=${CKPT:-/ckpts/llava-1.5-7b-hf}
JUDGE=${JUDGE:-/ckpts/vicuna-7b-v1.5}
DATA_ROOT=${DATA_ROOT:-/data}

python -m vlrlhf_tpu.cli.main eval \
  --model_name_or_path "$CKPT" \
  --benchmark mmbench --data_file "$DATA_ROOT/MMBench_DEV_EN.tsv" \
  --image_root "$DATA_ROOT" \
  --judge_model_path "$JUDGE" \
  --quantize true \
  --kv_cache_dtype int8 \
  --per_device_train_batch_size 8 \
  --output_dir out/eval/mmbench_judged \
  --tag "$(basename "$CKPT")-judged" "$@"
