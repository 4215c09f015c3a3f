"""Perceiver Resampler (Qwen-VL's attn_pool).

Behavioral port of /root/reference/src/vlrlhf/models/QwenVL/visual.py:99-155:
256 learnable queries cross-attend to ViT patch features; queries get fixed
2D sincos positional embeddings, keys get the same table bicubic-interpolated
to the patch grid. Followed by ln_post and a square output projection
(visual.py:390-391). Weights port from nn.MultiheadAttention's fused in_proj.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from vlrlhf_tpu.models.common import init_linear, linear
from vlrlhf_tpu.ops.attention import reference_attention
from vlrlhf_tpu.ops.image import interpolate_pos_embed
from vlrlhf_tpu.ops.norms import layer_norm

PyTree = Any


@dataclasses.dataclass(frozen=True)
class ResamplerConfig:
    embed_dim: int = 4096
    num_heads: int = 32
    kv_dim: int = 1664
    num_queries: int = 256
    ln_eps: float = 1e-6
    dtype: Any = jnp.bfloat16


def sincos_2d_pos_embed(embed_dim: int, grid_size: int) -> np.ndarray:
    """MAE-style 2D sincos table, (grid_size**2, embed_dim)."""
    def _1d(dim, pos):
        omega = np.arange(dim // 2, dtype=np.float64) / (dim / 2.0)
        omega = 1.0 / 10000**omega
        out = np.einsum("m,d->md", pos.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    grid_h = np.arange(grid_size, dtype=np.float32)
    grid_w = np.arange(grid_size, dtype=np.float32)
    grid = np.meshgrid(grid_w, grid_h)  # w goes first (MAE convention)
    grid = np.stack(grid, axis=0).reshape(2, 1, grid_size, grid_size)
    emb_h = _1d(embed_dim // 2, grid[0])
    emb_w = _1d(embed_dim // 2, grid[1])
    return np.concatenate([emb_h, emb_w], axis=1).astype(np.float32)


def init_resampler_params(cfg: ResamplerConfig, key: jax.Array) -> PyTree:
    ks = jax.random.split(key, 6)
    d, dt = cfg.embed_dim, cfg.dtype
    grid = int(round(cfg.num_queries**0.5))
    p = {
        "query": (jax.random.normal(ks[0], (cfg.num_queries, d)) * 0.02).astype(dt),
        "pos_embed": jnp.asarray(sincos_2d_pos_embed(d, grid), dt),
        "ln_q": {"weight": jnp.ones((d,), dt), "bias": jnp.zeros((d,), dt)},
        "ln_kv": {"weight": jnp.ones((d,), dt), "bias": jnp.zeros((d,), dt)},
        "attn": {
            "wq": init_linear(ks[1], d, d, True, dt),
            "wk": init_linear(ks[2], d, d, True, dt),
            "wv": init_linear(ks[3], d, d, True, dt),
            "wo": init_linear(ks[4], d, d, True, dt),
        },
    }
    if cfg.kv_dim != d:
        p["kv_proj"] = init_linear(ks[5], cfg.kv_dim, d, False, dt)
    return p


def resampler_forward(
    cfg: ResamplerConfig, p: PyTree, x: jax.Array  # (B, N_patches, kv_dim)
) -> jax.Array:
    """(B, num_queries, embed_dim)."""
    b, n, _ = x.shape
    d, nh = cfg.embed_dim, cfg.num_heads
    hd = d // nh
    pos = p["pos_embed"].astype(jnp.float32)
    if pos.shape[0] != n:
        pos_k = interpolate_pos_embed(pos, n)
    else:
        pos_k = pos
    if "kv_proj" in p:
        x = linear(p["kv_proj"], x)
    x = layer_norm(x, p["ln_kv"]["weight"], p["ln_kv"]["bias"], cfg.ln_eps)
    q_in = layer_norm(
        p["query"].astype(x.dtype), p["ln_q"]["weight"], p["ln_q"]["bias"],
        cfg.ln_eps,
    )
    q_in = jnp.broadcast_to(q_in[None], (b, cfg.num_queries, d))
    q = linear(p["attn"]["wq"], q_in + pos.astype(q_in.dtype)[None])
    k = linear(p["attn"]["wk"], x + pos_k.astype(x.dtype)[None])
    v = linear(p["attn"]["wv"], x)
    out = reference_attention(
        q.reshape(b, cfg.num_queries, nh, hd),
        k.reshape(b, n, nh, hd),
        v.reshape(b, n, nh, hd),
    ).reshape(b, cfg.num_queries, d)
    return linear(p["attn"]["wo"], out)
