"""Normalization ops.

Computed in float32 regardless of input dtype (bf16-safe), cast back on exit.
Covers the reference's RMSNorm (QWen: models/QwenVL/modeling_qwen.py:1097,
InternLM2: models/InternLMXC2/modeling_internlm2.py 'InternLM2RMSNorm') and
the LayerNorms in the CLIP/ViT towers. XLA fuses these into neighbouring ops;
no Pallas kernel is needed for speed-of-light here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rms_norm(x: jax.Array, weight: jax.Array, eps: float = 1e-6) -> jax.Array:
    dtype = x.dtype
    x = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
    x = x * jax.lax.rsqrt(var + eps)
    return (x * weight.astype(jnp.float32)).astype(dtype)


def layer_norm(
    x: jax.Array,
    weight: jax.Array,
    bias: jax.Array | None = None,
    eps: float = 1e-5,
) -> jax.Array:
    dtype = x.dtype
    x = x.astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    x = (x - mean) * jax.lax.rsqrt(var + eps)
    x = x * weight.astype(jnp.float32)
    if bias is not None:
        x = x + bias.astype(jnp.float32)
    return x.astype(dtype)
