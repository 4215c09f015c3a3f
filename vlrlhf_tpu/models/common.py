"""Shared functional building blocks for all model families.

Params are nested dicts of arrays (pytrees); every module here is a pure
function `f(params_subtree, x, ...)`. LoRA adapters travel in a parallel
pytree with the same structure (see lora/lora.py); `Ctx` threads them plus
attention options through the stack without global state.
"""

from __future__ import annotations

import dataclasses
import zlib
from typing import Any, Optional

import jax
import jax.numpy as jnp

from vlrlhf_tpu.lora.lora import lora_delta

PyTree = Any


@dataclasses.dataclass
class Ctx:
    """Per-call context threaded through the model stack."""

    adapters: Optional[PyTree] = None  # adapter pytree (None = base model)
    lora_scale: float = 1.0
    lora_mask: Optional[jax.Array] = None  # PLoRA im_mask (B, S)
    # XC2's CHECKPOINT-BUILT-IN trained PLoRA (build_mlp.py:158-203): part of
    # the frozen base, gated to image positions by lora_mask, active in EVERY
    # forward (policy AND adapter-off reference). r=alpha=256 in the shipped
    # model (modeling_internlm2.py:215-271) => scale 1.0. Distinct from
    # `adapters` (the NEW trainable LoRA, which peft applies at all
    # positions).
    base_adapters: Optional[PyTree] = None
    base_scale: float = 1.0
    dropout_rng: Optional[jax.Array] = None
    lora_dropout: float = 0.0
    attn_impl: str = "auto"  # 'auto' | 'xla' | 'pallas'
    # Multi-adapter serving (one base model, N LoRA sets, per-row
    # selection — the S-LoRA/punica pattern): (B, N) mixing weights over
    # adapter trees stacked with lora.stack_adapter_sets. One-hot rows
    # select; fractional rows interpolate. None = single-adapter mode.
    adapter_mix: Optional[jax.Array] = None

    def sub(self, key: str) -> "Ctx":
        """Context for a child module: descend the adapter tree(s)."""
        child = None
        if isinstance(self.adapters, dict):
            child = self.adapters.get(key)
        base_child = None
        if isinstance(self.base_adapters, dict):
            base_child = self.base_adapters.get(key)
        rng = None
        if self.dropout_rng is not None:
            fold = zlib.crc32(key.encode()) & 0x7FFFFFFF
            rng = jax.random.fold_in(self.dropout_rng, fold)
        return dataclasses.replace(
            self, adapters=child, base_adapters=base_child, dropout_rng=rng
        )


def linear(
    p: dict,
    x: jax.Array,
    ctx: Optional[Ctx] = None,
) -> jax.Array:
    """y = x @ kernel (+ bias) (+ LoRA delta if ctx carries an adapter here).

    Int8-quantized linears (ops/quant.py: {"kernel_q", "kernel_scale"}) take
    the W8A16 path: per-out-channel scales commute with the matmul, so the
    rescale applies to the small (tokens, out) result, and XLA streams the
    int8 kernel from HBM at half the bytes (the decode-path win).
    """
    if "kernel_q" in p:
        y = (x @ p["kernel_q"].astype(x.dtype)) * p["kernel_scale"].astype(
            x.dtype
        )
    elif "kernel_q4" in p:
        # W4A16 serving: group-wise int4 with in-VMEM unpack (ops/int4.py —
        # a plain-XLA path would materialize the bf16 kernel and read MORE
        # bytes than int8; the Pallas kernel is what makes int4 pay).
        from vlrlhf_tpu.ops.int4 import int4_apply

        y = int4_apply(p, x)
    else:
        y = x @ p["kernel"].astype(x.dtype)
    if "bias" in p:
        y = y + p["bias"].astype(y.dtype)
    delta = linear_deltas(x, ctx)
    if delta is not None:
        y = y + delta.astype(y.dtype)
    return y


def linear_deltas(x: jax.Array, ctx: Optional[Ctx]) -> Optional[jax.Array]:
    """The adapter terms a `linear` call adds on top of x @ kernel (+ bias):
    frozen built-in PLoRA (image positions only — XC2's PLoRA.forward:
    res[im_mask] += B(A(x)) * scaling) plus trainable LoRA (ALL positions —
    peft wraps the module and knows nothing of im_mask). Exposed separately
    so the fused-QKV serving path (models/lm/fuse.py) can apply per-submatrix
    adapters on top of one fused base matmul."""
    if ctx is None:
        return None
    out = None
    if isinstance(ctx.base_adapters, dict) and "a" in ctx.base_adapters:
        out = lora_delta(
            x, ctx.base_adapters, ctx.base_scale, mask=ctx.lora_mask
        )
    if isinstance(ctx.adapters, dict) and "a" in ctx.adapters:
        d = lora_delta(
            x,
            ctx.adapters,
            ctx.lora_scale,
            dropout_rng=ctx.dropout_rng,
            dropout=ctx.lora_dropout,
            mix=ctx.adapter_mix,
        )
        out = d if out is None else (out + d.astype(out.dtype))
    return out


def serving_ctx(adapters, lora_scale: float, **kw) -> "Ctx":
    """Ctx for the serving/jit boundary: a '__mix__' leaf at the adapters
    root (the per-row (B, N) multi-adapter mixing weights riding the same
    jit argument as the stacked adapter sets) moves into Ctx.adapter_mix,
    which sub() then carries to every linear."""
    mix = None
    if isinstance(adapters, dict) and "__mix__" in adapters:
        mix = adapters["__mix__"]
        adapters = {k: v for k, v in adapters.items() if k != "__mix__"}
    return Ctx(
        adapters=adapters, lora_scale=lora_scale, adapter_mix=mix, **kw
    )


def embed(p: dict, ids: jax.Array, dtype: jnp.dtype) -> jax.Array:
    # mode="clip": out-of-vocab ids (a tokenizer/config mismatch) clamp to the
    # last row instead of jax's default NaN fill — NaNs here poison the whole
    # step and are brutal to trace back.
    return jnp.take(p["embedding"], ids, axis=0, mode="clip").astype(dtype)


def init_linear(
    key: jax.Array,
    d_in: int,
    d_out: int,
    bias: bool = False,
    dtype: jnp.dtype = jnp.float32,
    scale: Optional[float] = None,
) -> dict:
    scale = (1.0 / d_in) ** 0.5 if scale is None else scale
    p = {"kernel": (jax.random.normal(key, (d_in, d_out)) * scale).astype(dtype)}
    if bias:
        p["bias"] = jnp.zeros((d_out,), dtype)
    return p


def merge_multimodal_embeddings(
    token_embeds: jax.Array,  # (B, S, D)
    image_features: jax.Array,  # (B, N_img, D)
    image_positions: jax.Array,  # (B, N_img) int32; -1 = unused slot
) -> jax.Array:
    """Splice image features into the token-embedding sequence (static shapes).

    The TPU-first replacement for the reference's four dynamic-shape
    `_merge_input_ids_with_image_features` implementations
    (/root/reference/src/vlrlhf/models/Llava/__init__.py:36-109,
     LlavaNext/__init__.py:38-171, InternLMXC2/__init__.py:32-104, and QwenVL's
     in-forward splice, models/QwenVL/modeling_qwen.py:620-625): the host-side
    processor already emits exactly one placeholder token per image feature, so
    the device just scatters features to precomputed positions via a one-hot
    matmul (MXU-friendly; negligible FLOPs next to the LM) — no dynamic shapes.

    Unused slots (position -1, for batches with fewer images) scatter nowhere.
    """
    b, s, d = token_embeds.shape
    n_img = image_features.shape[1]
    valid = (image_positions >= 0)[..., None]  # (B, N_img, 1)
    pos = jnp.where(image_positions >= 0, image_positions, 0)
    one_hot = jax.nn.one_hot(pos, s, dtype=token_embeds.dtype) * valid.astype(
        token_embeds.dtype
    )  # (B, N_img, S)
    scattered = jnp.einsum(
        "bns,bnd->bsd", one_hot, image_features.astype(token_embeds.dtype)
    )
    is_image_pos = jnp.sum(one_hot, axis=1)[..., None]  # (B, S, 1) 0/1
    return token_embeds * (1.0 - is_image_pos) + scattered


def image_position_mask(
    image_positions: jax.Array, seq_len: int
) -> jax.Array:
    """(B, S) 1.0 at image-token positions — PLoRA's im_mask, derived on
    device from the same position map the merge uses."""
    b, n_img = image_positions.shape
    valid = (image_positions >= 0)[..., None]
    pos = jnp.where(image_positions >= 0, image_positions, 0)
    one_hot = jax.nn.one_hot(pos, seq_len, dtype=jnp.float32) * valid
    return jnp.clip(jnp.sum(one_hot, axis=1), 0.0, 1.0)
