#!/bin/bash
# InternLM-XComposer2-VL-7B KTO-pair on preference data (BASELINE config #4).
set -e
bash "$(dirname "$0")/dpo_internlm_xc2.sh" --loss_type kto_pair "$@"
