"""Token sampling: temperature / top-k / top-p, jit-friendly static shapes."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def warp_logits(
    logits: jax.Array,  # (..., V) float32
    temperature: float = 1.0,
    top_k: Optional[int] = None,
    top_p: Optional[float] = None,
) -> jax.Array:
    """Apply the HF-order logits warpers (temperature -> top-k -> top-p).

    Shared by the decode sampler and speculative verify so the target
    distribution p is IDENTICAL between the plain and speculative engines
    (the losslessness proof needs acceptance tests against exactly p).
    Works on any (..., V) batch shape.
    """
    if temperature != 1.0:
        logits = logits / jnp.maximum(temperature, 1e-6)
    if top_k is not None and top_k > 0:
        kth = jnp.sort(logits, axis=-1)[..., -top_k][..., None]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    if top_p is not None and top_p < 1.0:
        sorted_logits = jnp.flip(jnp.sort(logits, axis=-1), axis=-1)
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # keep tokens until cumulative prob exceeds top_p (always keep top-1)
        cutoff_idx = jnp.sum((cum - probs) < top_p, axis=-1) - 1  # (...,)
        cutoff_logit = jnp.take_along_axis(
            sorted_logits, cutoff_idx[..., None], axis=-1
        )
        logits = jnp.where(logits < cutoff_logit, -jnp.inf, logits)
    return logits


def sample_tokens(
    logits: jax.Array,  # (B, V) float
    rng: jax.Array,
    temperature: float = 1.0,
    top_k: Optional[int] = None,
    top_p: Optional[float] = None,
    do_sample: bool = True,
) -> jax.Array:
    """(B,) sampled token ids."""
    logits = logits.astype(jnp.float32)
    if not do_sample:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits = warp_logits(logits, temperature, top_k, top_p)
    return jax.random.categorical(rng, logits, axis=-1).astype(jnp.int32)
