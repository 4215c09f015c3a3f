#!/bin/bash
# Serve LLaVA-1.5-7B from one 16 GiB v5e as an HTTP daemon (the
# reference's sglang Runtime role, /root/reference/src/vlrlhf/eval/
# utils.py:123-173 — here it is the same framework, not a second stack).
# int8 weights + int8 KV + fused wqkv/gateup: quantize-during-port never
# materializes the bf16 model, 16 continuous-batching slots share one
# head-major cache, and /chat keeps 2 live multi-turn sessions.
#
# Smoke it:   curl -s localhost:8000/health
#   curl -s -X POST localhost:8000/generate -d '{"question":"what is in
#     this image?","image":"/path/img.jpg"}'
#   curl -s -X POST localhost:8000/chat -d '{"message":"hi"}'
# Evaluate against it from any machine:
#   python -m vlrlhf_tpu.cli.main eval --endpoint http://HOST:8000 ...
set -e

CKPT=${CKPT:-/ckpts/llava-1.5-7b-hf}
PORT=${PORT:-8000}

python -m vlrlhf_tpu.cli.main serve \
  --model_name_or_path "$CKPT" \
  --output_dir out/serve \
  --host 0.0.0.0 --port "$PORT" \
  --slots 16 \
  --max_length 1024 --max_new_tokens 256 \
  --quantize int8 --kv_cache_dtype int8 --fuse_decode true \
  --chat_sessions 2
