#!/bin/bash
# Checkpoint x benchmark sweep matrix — the reference's eval_all.sh
# (scripts/eval/eval_all.sh) without conda-env switching or judge servers.
set -e
CKPTS=${CKPTS:-"/ckpts/llava-1.5-7b-hf"}
BENCHMARKS=${BENCHMARKS:-"mme mmbench seedbench pope"}
DATA_ROOT=${DATA_ROOT:-/data}
DB=${DB:-results.sqlite}

declare -A DATA_FILES=(
  [mme]="$DATA_ROOT/MME.tsv"
  [mmbench]="$DATA_ROOT/MMBench_DEV_EN.tsv"
  [seedbench]="$DATA_ROOT/SEED-Bench.json"
  [mmvet]="$DATA_ROOT/mm-vet.json"
  [mmmu]="$DATA_ROOT/MMMU_DEV_VAL.tsv"
  [mathvista]="$DATA_ROOT/MathVista_MINI.tsv"
  [pope]="$DATA_ROOT/pope.jsonl"
)

for ckpt in $CKPTS; do
  tag=$(basename "$ckpt")
  for bench in $BENCHMARKS; do
    python -m vlrlhf_tpu.cli.main eval \
      --model_name_or_path "$ckpt" \
      --benchmark "$bench" --data_file "${DATA_FILES[$bench]}" \
      --image_root "$DATA_ROOT" \
      --output_dir "out/eval/$tag" --sqlite_db "$DB" --tag "$tag" "$@"
  done
done
