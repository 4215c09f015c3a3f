"""Fused serving weights: wq/wk/wv -> wqkv, gate/up -> gateup.

Decode at small batch is HBM-bound and kernel-count-sensitive: each of the
7 per-layer weight matmuls is a separate XLA kernel streaming its own weight
array. Concatenating along the OUT axis is mathematically exact — every
output column's reduction over `in` is untouched — for bf16 kernels, for
int8 per-out-channel quantized kernels ({"kernel_q","kernel_scale"} concat
the same way), and for biases. One (H, (nh+2nkv)*hd) and one (H, 2*ff)
stream per layer replace five, cutting per-layer kernels 7 -> 4 and widening
the HBM bursts (tools/decode_floor.py [3] measures the effect in isolation).

This is a SERVING-params transform (apply after quantization, before the
engine): training keeps separate kernels — remat checkpoint names, LoRA
shapes, and the HF porters all address wq/wk/wv individually. LoRA adapter
trees stay UNFUSED: the forward's fused branches (models/lm/llama.py
_qkv_proj/_gateup_proj) apply per-submatrix adapter deltas on top of the
fused base matmul, so PPO rollout policies (base + live adapters) work
unchanged.

Replaces the role of fused QKV in CUDA serving stacks (the reference's
sglang fast path fuses qkv_proj; /root/reference/src/vlrlhf/eval/utils.py
delegates to an sglang server at :123-173).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp

PyTree = Any


def _concat_linears(parts: list[dict]) -> dict:
    """Concatenate linear param dicts along the out axis (last dim).

    All parts must agree on quantization (all "kernel" or all "kernel_q") —
    quantize_params' patterns quantize attn/mlp as a unit, so mixed groups
    only arise from a caller bug. Biases zero-fill for parts without one.
    """
    def kind(p):
        return ("kernel_q" if "kernel_q" in p
                else "kernel_q4" if "kernel_q4" in p else "kernel")

    kinds = {kind(p) for p in parts}
    assert len(kinds) == 1, f"mixed-quantization fusion group: {kinds}"
    key = kinds.pop()
    # int4 packs along IN (split-half nibbles) and int8 scales are
    # per-out-channel — both concat along OUT exactly.
    out: dict = {key: jnp.concatenate([p[key] for p in parts], -1)}
    if key != "kernel":
        out["kernel_scale"] = jnp.concatenate(
            [p["kernel_scale"] for p in parts], -1
        )
    if any("kernel_gbias" in p for p in parts):
        # ingested-GPTQ zero-point bias: per-(group, out) — concatenates
        # along OUT like the scales (all-or-none within a fusion group by
        # the same quantize-as-a-unit argument; zero-fill if one part was
        # symmetric)
        ref_gb = next(p["kernel_gbias"] for p in parts if "kernel_gbias" in p)

        def gb_of(p):
            if "kernel_gbias" in p:
                return p["kernel_gbias"]
            return jnp.zeros(
                ref_gb.shape[:-1] + (p[key].shape[-1],), ref_gb.dtype
            )

        out["kernel_gbias"] = jnp.concatenate(
            [gb_of(p) for p in parts], -1
        )
    if any("bias" in p for p in parts):
        ref = next(p["bias"] for p in parts if "bias" in p)

        def bias_of(p):
            if "bias" in p:
                return p["bias"]
            k = p.get("kernel", p.get("kernel_q"))
            return jnp.zeros(k.shape[:-2] + (k.shape[-1],), ref.dtype)

        out["bias"] = jnp.concatenate([bias_of(p) for p in parts], -1)
    return out


def fuse_lm_params(lm_params: PyTree) -> PyTree:
    """Rewrite the stacked decoder params to the fused serving layout:
    attn {wq,wk,wv,wo} -> {wqkv,wo}; mlp {gate,up,down} -> {gateup,down}.
    Idempotent; every other subtree passes through untouched. jit the call
    (eager concat over the axon tunnel pays ~15 ms/op dispatch)."""
    layers = lm_params["layers_scanned"]
    attn, mlp = layers["attn"], layers["mlp"]
    if "wqkv" in attn:  # already fused
        return lm_params
    new_layers = dict(layers)
    new_layers["attn"] = {
        "wqkv": _concat_linears([attn["wq"], attn["wk"], attn["wv"]]),
        "wo": attn["wo"],
    }
    new_layers["mlp"] = {
        "gateup": _concat_linears([mlp["gate"], mlp["up"]]),
        "down": mlp["down"],
    }
    out = dict(lm_params)
    out["layers_scanned"] = new_layers
    return out


def fuse_vlm_params(params: PyTree) -> PyTree:
    """Fuse the LM decoder of a full VLM param tree (serving entry point).
    Vision tower / projector stay as-is: prefill-only and compute-bound."""
    out = dict(params)
    out["lm"] = fuse_lm_params(params["lm"])
    return out
