"""Weights-only int8 quantization (serving + QLoRA-style frozen-base training).

TPU-native replacement for the reference's QLoRA surface
(/root/reference/src/vlrlhf/utils/auto_load.py:509-578: `lora_args.q_lora` +
`bits` assemble a GPTQ-quantized base under LoRA) and the W8A16 serving mode
of CUDA inference stacks. Two distinct wins on TPU:

  - DECODE is HBM-bandwidth-bound: int8 kernels halve weight bytes/token.
    Measured on one v5e: XLA's `x @ w_i8.astype(bf16) * scale` runs ~1.5x
    faster than bf16 at decode shapes (a Pallas dequant-matmul kernel and a
    W8A8 MXU kernel both measured the same ~350 GB/s int8 read ceiling, so
    the plain-XLA path is the keeper — no custom kernel needed).
  - TRAINING with a frozen base (LoRA/DPO): the base has no dL/dW, so int8
    kernels halve resident param HBM (13.2 -> 6.6 GiB at 7B), letting more
    preference pairs fit per step on a 16 GiB chip.

Representation: a quantized linear replaces {"kernel": (..., in, out)} with
  {"kernel_q":     (..., in, out) int8   — symmetric, per-out-channel
   "kernel_scale": (..., 1, out)  bf16}  — y = (x @ q) * scale (+ bias)
Per-out-channel scales commute with the matmul, so dequant is a cheap
column-wise rescale of the (tokens, out) result, never of the big kernel.
Stacked ("layers_scanned") kernels quantize per (layer, out_channel).

`linear()` (models/common.py) dispatches on the "kernel_q" key, so quantized
params flow through every existing forward (train, prefill, decode, LoRA
delta, PLoRA) unchanged.
"""

from __future__ import annotations

import re
from typing import Any, Sequence

import jax
import jax.numpy as jnp

PyTree = Any

# Linears worth quantizing by default: the LM decoder stack + lm_head carry
# ~99% of 7B-class param bytes. Vision towers/projectors stay bf16 (small,
# and some are trained even in LoRA recipes).
DEFAULT_QUANT_PATTERNS = (
    r"(^|/)lm/layers_scanned/(attn|mlp)/",
    r"(^|/)lm/lm_head$",
)

# Training (QLoRA) keeps lm_head in bf16: DPO/RM logps are logit-precision
# sensitive and the head is a single matmul — the peft/bitsandbytes
# convention (prepare_model_for_kbit_training) for the same reason.
TRAIN_QUANT_PATTERNS = (r"(^|/)lm/layers_scanned/(attn|mlp)/",)

# Big-tower / big-vocab models (Qwen-VL: ViT-bigG ~1.9B + 151k vocab): also
# quantize the frozen vision stack and resampler/projector linears. Needed
# to fit Qwen-VL 7B DPO on one 16 GiB chip; lm_head/embed stay bf16.
TRAIN_QUANT_PATTERNS_WIDE = TRAIN_QUANT_PATTERNS + (
    r"(^|/)vision/layers_scanned/(attn|mlp)/",
    r"(^|/)projector/",
)

# Serving with two co-resident stacks (eval model + judge on one 16 GiB
# chip): every matmul-heavy block int8 including the vision tower and
# projector; embed stays bf16 (it's a gather, not a matmul). ~0.3 GiB
# tighter than DEFAULT at llava-7B — the co-residency fitting margin.
SERVE_QUANT_PATTERNS_WIDE = DEFAULT_QUANT_PATTERNS + (
    r"(^|/)vision/layers_scanned/(attn|mlp)/",
    r"(^|/)projector/",
)


def quantize_linear(p: dict, dtype=jnp.int8) -> dict:
    """Quantize one linear param dict {"kernel", opt "bias"} to int8.

    Stacked (L, in, out) kernels quantize layer-by-layer under `lax.map` so
    the f32 working set is one layer's kernel (~180 MB at 7B), not the whole
    stack (~5.8 GB) — quantizing a 13 GiB model must fit beside it on a
    16 GiB chip (jit the call with the params donated and XLA frees each
    original as its int8 output lands).
    """

    def q1(k2d: jax.Array):
        kf = k2d.astype(jnp.float32)
        amax = jnp.max(jnp.abs(kf), axis=0, keepdims=True)  # (1, out)
        scale = jnp.where(amax > 0, amax / 127.0, 1.0)
        q = jnp.clip(jnp.round(kf / scale), -127, 127).astype(dtype)
        return q, scale.astype(jnp.bfloat16)

    k = p["kernel"]
    if k.ndim == 3:
        q, scale = jax.lax.map(q1, k)  # (L, in, out), (L, 1, out)
    else:
        q, scale = q1(k)
    out = {"kernel_q": q, "kernel_scale": scale}
    if "bias" in p:
        out["bias"] = p["bias"]
    return out


def quantize_kernel_np(k):
    """Host (numpy) twin of `quantize_linear`'s q1 — used by the streaming
    porter's quantize-during-port mode (utils/hf_port.port_quantize): each
    per-layer kernel is quantized ON HOST before device transfer, so a 7B
    load's device transient is one int8 stack, never the bf16 model. Same
    math as q1 (f32 amax per out-channel, symmetric, round-half-even);
    scales are bitwise equal, codes may differ by ±1 on exact round-half
    ties (XLA can rewrite kf/scale as kf*(1/scale), a 1-ulp quotient
    wobble) — within int8 quantization error (test_streaming_port bounds
    it).
    k: (in, out) or (L, in, out) -> (int8 same-shape, bf16 (…, 1, out) scale).
    """
    import numpy as np

    import ml_dtypes

    kf = np.asarray(k, dtype=np.float32)
    amax = np.max(np.abs(kf), axis=-2, keepdims=True)  # (..., 1, out)
    scale = np.where(amax > 0, amax / 127.0, 1.0)
    q = np.clip(np.round(kf / scale), -127, 127).astype(np.int8)
    return q, scale.astype(ml_dtypes.bfloat16)


def dequantize_linear(p: dict, dtype=jnp.bfloat16) -> dict:
    """Inverse transform (checkpoint export / LoRA merge need bf16 kernels)."""
    k = p["kernel_q"].astype(jnp.float32) * p["kernel_scale"].astype(
        jnp.float32
    )
    out = {"kernel": k.astype(dtype)}
    if "bias" in p:
        out["bias"] = p["bias"]
    return out


def _is_linear(node: Any) -> bool:
    return isinstance(node, dict) and "kernel" in node


def _is_qlinear(node: Any) -> bool:
    return isinstance(node, dict) and "kernel_q" in node


def quantize_params(
    params: PyTree,
    patterns: Sequence[str] = DEFAULT_QUANT_PATTERNS,
    dtype=jnp.int8,
    bits: int = 8,
) -> PyTree:
    """Quantize every linear whose tree path matches any pattern.

    Paths are '/'-joined key chains addressing the MODULE (not the kernel
    leaf), e.g. "lm/layers_scanned/attn/wq". jit this call: eager per-op
    dispatch over the axon tunnel is ~15 ms/op.

    bits=4 takes the group-wise int4 path (ops/int4.py, W4A16 serving —
    the counterpart of the reference's GPTQ `bits=4` surface); linears
    whose in-dim is not 128-divisible (tiny projector heads) fall back to
    int8 rather than fail.
    """
    regs = [re.compile(p) for p in patterns]
    if bits == 4:
        from vlrlhf_tpu.ops.int4 import GROUP, quantize_linear_int4

    def quant_one(node: dict) -> dict:
        if bits == 4 and node["kernel"].shape[-2] % (2 * GROUP) == 0:
            return quantize_linear_int4(node)
        return quantize_linear(node, dtype)

    def walk(node: Any, path: str) -> Any:
        if _is_linear(node) and any(r.search(path) for r in regs):
            return quant_one(node)
        if isinstance(node, dict):
            return {
                k: walk(v, f"{path}/{k}" if path else k)
                for k, v in node.items()
            }
        return node

    return walk(params, "")


def dequantize_params(params: PyTree, dtype=jnp.bfloat16) -> PyTree:
    """Restore bf16 kernels wherever quantized linears appear."""

    def walk(node: Any) -> Any:
        if _is_qlinear(node):
            return dequantize_linear(node, dtype)
        if isinstance(node, dict) and "kernel_q4" in node:
            from vlrlhf_tpu.ops.int4 import dequantize_kernel_int4

            k = node["kernel_q4"]
            if k.ndim == 3:
                kernel = jax.lax.map(
                    lambda pk: dequantize_kernel_int4(pk[0], pk[1], dtype),
                    (k, node["kernel_scale"]),
                )
            else:
                kernel = dequantize_kernel_int4(
                    k, node["kernel_scale"], dtype
                )
            out = {"kernel": kernel}
            if "bias" in node:
                out["bias"] = node["bias"]
            return out
        if isinstance(node, dict):
            return {k: walk(v) for k, v in node.items()}
        return node

    return walk(params)


def quantize_kv(x: jax.Array):
    """Per-vector int8 KV-cache quantization: symmetric over the trailing
    head_dim. x (..., hd) -> (q int8 (..., hd), scale bf16 (...,)).

    Used by the generation engine's int8 cache mode (GenerateConfig
    kv_cache_dtype='int8'): halves cache DMA bytes per decode step; the
    decode-attention kernel folds the scales into scores/weights
    (ops/decode_attention.py)."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127).astype(
        jnp.int8
    )
    return q, scale[..., 0].astype(jnp.bfloat16)


def quantized_fraction(params: PyTree) -> float:
    """Fraction of param bytes held in int8 (diagnostics / tests)."""
    q_bytes = t_bytes = 0
    for leaf in jax.tree.leaves(params):
        n = getattr(leaf, "size", 0) * jnp.dtype(leaf.dtype).itemsize
        t_bytes += n
        if leaf.dtype == jnp.int8:
            q_bytes += n
    return q_bytes / max(t_bytes, 1)
