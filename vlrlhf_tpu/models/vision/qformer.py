"""Q-Former (InstructBLIP's instruction-aware query transformer).

Structural port of HF's InstructBlipQFormerModel as used by the reference's
InstructBlip plugin (/root/reference/src/vlrlhf/models/InstructBlip/
__init__.py:76-160 builds Q-Former -> projector -> prefix embeds):

  - 32 learned query tokens concatenated with embedded instruction text
  - BERT-style self-attention over [queries; text]
  - cross-attention (queries only) to ViT features every
    `cross_attention_frequency` layers
  - split feed-forward weights: `intermediate_query` for query positions,
    `intermediate` for text positions
  - output = query positions' hidden states (fed to language_projection)
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp

from vlrlhf_tpu.models.common import init_linear, linear
from vlrlhf_tpu.ops.attention import reference_attention
from vlrlhf_tpu.ops.norms import layer_norm

PyTree = Any


@dataclasses.dataclass(frozen=True)
class QFormerConfig:
    vocab_size: int = 30523
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    encoder_hidden_size: int = 1408  # ViT feature dim
    num_query_tokens: int = 32
    cross_attention_frequency: int = 2
    max_position_embeddings: int = 512
    ln_eps: float = 1e-12
    dtype: Any = jnp.bfloat16


def init_qformer_params(cfg: QFormerConfig, key: jax.Array) -> PyTree:
    h, dt = cfg.hidden_size, cfg.dtype
    keys = jax.random.split(key, 4)

    def attn(k, kv_dim=None):
        kv_dim = kv_dim or h
        ks = jax.random.split(k, 4)
        return {
            "wq": init_linear(ks[0], h, h, True, dt),
            "wk": init_linear(ks[1], kv_dim, h, True, dt),
            "wv": init_linear(ks[2], kv_dim, h, True, dt),
            "wo": init_linear(ks[3], h, h, True, dt),
            "ln": {"weight": jnp.ones((h,), dt), "bias": jnp.zeros((h,), dt)},
        }

    def ffn(k):
        ks = jax.random.split(k, 2)
        return {
            "fc1": init_linear(ks[0], h, cfg.intermediate_size, True, dt),
            "fc2": init_linear(ks[1], cfg.intermediate_size, h, True, dt),
            "ln": {"weight": jnp.ones((h,), dt), "bias": jnp.zeros((h,), dt)},
        }

    layers = []
    for i in range(cfg.num_layers):
        k = jax.random.fold_in(keys[0], i)
        ks = jax.random.split(k, 4)
        layer = {
            "self_attn": attn(ks[0]),
            "ffn": ffn(ks[1]),  # text positions
            "ffn_query": ffn(ks[2]),  # query positions
        }
        if i % cfg.cross_attention_frequency == 0:
            layer["cross_attn"] = attn(ks[3], kv_dim=cfg.encoder_hidden_size)
        layers.append(layer)

    return {
        "query_tokens": (
            jax.random.normal(keys[1], (cfg.num_query_tokens, h)) * 0.02
        ).astype(dt),
        "embeddings": {
            "word": {
                "embedding": (
                    jax.random.normal(keys[2], (cfg.vocab_size, h)) * 0.02
                ).astype(dt)
            },
            "position": {
                "embedding": (
                    jax.random.normal(keys[3], (cfg.max_position_embeddings, h))
                    * 0.02
                ).astype(dt)
            },
            "ln": {"weight": jnp.ones((h,), dt), "bias": jnp.zeros((h,), dt)},
        },
        # layers are heterogeneous (cross-attn every other layer): keep a list
        "layers": layers,
    }


def _mha(p, q_in, kv_in, nh, mask=None):
    b, sq, _ = q_in.shape
    skv = kv_in.shape[1]
    hd = p["wq"]["kernel"].shape[1] // nh
    q = linear(p["wq"], q_in).reshape(b, sq, nh, hd)
    k = linear(p["wk"], kv_in).reshape(b, skv, nh, hd)
    v = linear(p["wv"], kv_in).reshape(b, skv, nh, hd)
    out = reference_attention(q, k, v, mask=mask).reshape(b, sq, nh * hd)
    return linear(p["wo"], out)


def qformer_forward(
    cfg: QFormerConfig,
    params: PyTree,
    image_features: jax.Array,  # (B, N_patches, encoder_hidden)
    instruction_ids: Optional[jax.Array] = None,  # (B, T) qformer text ids
    instruction_mask: Optional[jax.Array] = None,  # (B, T)
) -> jax.Array:
    """(B, num_query_tokens, hidden)."""
    b = image_features.shape[0]
    nq = cfg.num_query_tokens
    dt = cfg.dtype
    queries = jnp.broadcast_to(
        params["query_tokens"].astype(dt)[None], (b, nq, cfg.hidden_size)
    )
    emb = params["embeddings"]
    if instruction_ids is not None:
        t = instruction_ids.shape[1]
        text = jnp.take(emb["word"]["embedding"], instruction_ids, axis=0)
        text = text + emb["position"]["embedding"][:t][None]
        x = jnp.concatenate([queries, text.astype(dt)], axis=1)
        tmask = (
            instruction_mask.astype(bool)
            if instruction_mask is not None
            else jnp.ones((b, t), bool)
        )
        full_mask = jnp.concatenate([jnp.ones((b, nq), bool), tmask], axis=1)
    else:
        x = queries
        full_mask = jnp.ones((b, nq), bool)
    # HF applies the embeddings LayerNorm to the concatenated [queries; text]
    # (InstructBlipQFormerEmbeddings.forward).
    x = layer_norm(x, emb["ln"]["weight"], emb["ln"]["bias"], cfg.ln_eps)

    s = x.shape[1]
    self_mask = (full_mask[:, None, :] & full_mask[:, :, None])[:, None]

    for layer in params["layers"]:
        sa = layer["self_attn"]
        h = _mha(sa, x, x, cfg.num_heads, mask=self_mask)
        x = layer_norm(x + h, sa["ln"]["weight"], sa["ln"]["bias"], cfg.ln_eps)
        if "cross_attn" in layer:
            ca = layer["cross_attn"]
            q_part = x[:, :nq]
            h = _mha(ca, q_part, image_features.astype(dt), cfg.num_heads)
            q_part = layer_norm(
                q_part + h, ca["ln"]["weight"], ca["ln"]["bias"], cfg.ln_eps
            )
            x = jnp.concatenate([q_part, x[:, nq:]], axis=1)
        # split FFN: queries use ffn_query, text uses ffn
        def _ffn(p, y):
            h = linear(p["fc2"], jax.nn.gelu(linear(p["fc1"], y)))
            return layer_norm(
                y + h, p["ln"]["weight"], p["ln"]["bias"], cfg.ln_eps
            )

        q_part = _ffn(layer["ffn_query"], x[:, :nq])
        if s > nq:
            t_part = _ffn(layer["ffn"], x[:, nq:])
            x = jnp.concatenate([q_part, t_part], axis=1)
        else:
            x = q_part
    return x[:, :nq]
