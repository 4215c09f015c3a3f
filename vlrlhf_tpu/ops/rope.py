"""Rotary position embeddings, incl. linear and dynamic-NTK scaling.

Uses the HF "rotate_half" convention so weights ported from HF checkpoints
(LLaVA's llama/mistral, Qwen-VL's QWen, InternLM-XC2's InternLM2) produce
bit-comparable logits. Dynamic-NTK matches the reference's inference-time
context extension (models/QwenVL/modeling_qwen.py:605-614 and
models/InternLMXC2/modeling_internlm2.py rotary variants).

All trig computed in float32; application returns the input dtype.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class RopeConfig:
    head_dim: int
    base: float = 10000.0
    # 'none' | 'linear' | 'dynamic' (NTK-aware)
    scaling_type: str = "none"
    scaling_factor: float = 1.0
    # Original trained context; needed for dynamic-NTK.
    max_position_embeddings: int = 2048


def _inv_freq(cfg: RopeConfig, seq_len: Optional[int] = None) -> jax.Array:
    dim = cfg.head_dim
    base = cfg.base
    if cfg.scaling_type == "dynamic" and seq_len is not None:
        # NTK-aware base rescaling, only active past the trained context.
        ratio = max(seq_len / cfg.max_position_embeddings, 1.0)
        alpha = cfg.scaling_factor * ratio - (cfg.scaling_factor - 1)
        base = base * alpha ** (dim / (dim - 2))
    exponent = jnp.arange(0, dim, 2, dtype=jnp.float32) / dim
    return 1.0 / (base**exponent)


def rope_frequencies(
    cfg: RopeConfig,
    positions: jax.Array,  # (..., seq) int positions
    seq_len: Optional[int] = None,
) -> tuple[jax.Array, jax.Array]:
    """Return (cos, sin), each (..., seq, head_dim), rotate_half layout."""
    inv_freq = _inv_freq(cfg, seq_len)
    pos = positions.astype(jnp.float32)
    if cfg.scaling_type == "linear":
        pos = pos / cfg.scaling_factor
    freqs = pos[..., None] * inv_freq  # (..., seq, dim/2)
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def _rotate_half(x: jax.Array) -> jax.Array:
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def apply_rope(
    q: jax.Array,  # (..., seq, n_heads, head_dim)
    k: jax.Array,  # (..., seq, n_kv_heads, head_dim)
    cos: jax.Array,  # (..., seq, head_dim)
    sin: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    cos = cos[..., :, None, :].astype(jnp.float32)
    sin = sin[..., :, None, :].astype(jnp.float32)
    qf, kf = q.astype(jnp.float32), k.astype(jnp.float32)
    q_out = qf * cos + _rotate_half(qf) * sin
    k_out = kf * cos + _rotate_half(kf) * sin
    return q_out.astype(q.dtype), k_out.astype(k.dtype)
