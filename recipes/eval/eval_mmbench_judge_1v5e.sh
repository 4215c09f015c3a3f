#!/bin/bash
# MMBench eval WITH the in-process LLM choice-extraction judge, both models
# co-resident on ONE 16 GiB v5e — the reference needs a separate lmdeploy
# judge server + VLMEvalKit env for this flow (scripts/eval/mmbench.sh:25-35).
#
# Memory plan (proven by tools/judge_coresidency.py on the real chip):
#   eval model  int8  ~7.0 GiB     judge model  int8  ~6.6 GiB
#   eval cache  B=8   ~1.0 GiB     judge cache  B=16  ~1.0 GiB
# --quantize applies int8 weights-only serving to BOTH loads.
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
  --per_device_train_batch_size 8 \
  --output_dir out/eval/mmbench_judged \
  --tag "$(basename "$CKPT")-judged" "$@"
