"""Ring attention: context parallelism over a mesh axis.

The reference has NO long-context support (max_length <= 2048, SURVEY.md §5);
this is the idiomatic TPU extension it calls for: shard the sequence across a
mesh axis, rotate K/V blocks around the ring with `ppermute` (point-to-point
over ICI neighbours) while each device accumulates online-softmax partial
results — communication overlaps compute, total traffic equals one
all-gather but never materializes the full K/V
(see /opt/skills/guides/boom_attention_tricks.md §16).

Causality is position-based: block (step) skipping happens via masking (all
devices execute all steps — SPMD), so the cost is the mask, not divergence.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

NEG_INF = -1e30


def _ring_attention_shard(
    q: jax.Array,  # (B, Sq_local, H, D) — this device's query shard
    k: jax.Array,  # (B, Skv_local, H, D)
    v: jax.Array,
    pad_mask: jax.Array,  # (B, Skv_local) for the local kv shard
    *,
    axis_name: str,
    causal: bool,
    scale: float,
):
    n = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    b, sq, h, d = q.shape
    skv = k.shape[1]
    q_pos = idx * sq + jnp.arange(sq)  # global positions of our queries

    qf = q.astype(jnp.float32) * scale
    # mark accumulators device-varying so the fori_loop carry types match
    m0 = jax.lax.pvary(jnp.full((b, h, sq), -jnp.inf, jnp.float32), (axis_name,))
    l0 = jax.lax.pvary(jnp.zeros((b, h, sq), jnp.float32), (axis_name,))
    o0 = jax.lax.pvary(jnp.zeros((b, sq, h, d), jnp.float32), (axis_name,))
    perm = [(j, (j + 1) % n) for j in range(n)]

    def step(i, carry):
        k_blk, v_blk, kv_mask, m, l, o = carry
        src = (idx - i) % n  # which shard this kv block came from
        k_pos = src * skv + jnp.arange(skv)
        logits = jnp.einsum(
            "bqhd,bkhd->bhqk", qf, k_blk.astype(jnp.float32)
        )
        mask = kv_mask[:, None, None, :].astype(bool)
        if causal:
            mask = mask & (k_pos[None, None, None, :] <= q_pos[None, None, :, None])
        logits = jnp.where(mask, logits, NEG_INF)
        m_blk = jnp.max(logits, axis=-1)
        m_new = jnp.maximum(m, m_blk)
        # guard fully-masked rows (m_new == -inf): exp(-inf - -inf) -> nan
        m_safe = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
        alpha = jnp.where(jnp.isfinite(m), jnp.exp(m - m_safe), 0.0)
        p = jnp.exp(logits - m_safe[..., None]) * mask
        l_new = alpha * l + jnp.sum(p, axis=-1)
        o_new = o * alpha.transpose(0, 2, 1)[..., None] + jnp.einsum(
            "bhqk,bkhd->bqhd", p, v_blk.astype(jnp.float32)
        )
        k_nxt = jax.lax.ppermute(k_blk, axis_name, perm)
        v_nxt = jax.lax.ppermute(v_blk, axis_name, perm)
        kvm_nxt = jax.lax.ppermute(kv_mask, axis_name, perm)
        return (k_nxt, v_nxt, kvm_nxt, m_new, l_new, o_new)

    k_blk, v_blk, kv_mask, m, l, o = jax.lax.fori_loop(
        0, n, step, (k, v, pad_mask, m0, l0, o0)
    )
    l_safe = jnp.where(l == 0.0, 1.0, l)
    out = o / l_safe.transpose(0, 2, 1)[..., None]
    return out.astype(q.dtype)


def ring_attention(
    q: jax.Array,  # (B, S, H, D) — sequence sharded over `axis_name`
    k: jax.Array,
    v: jax.Array,
    mesh: Mesh,
    axis_name: str = "fsdp",
    causal: bool = True,
    pad_mask: Optional[jax.Array] = None,  # (B, S)
    scale: Optional[float] = None,
) -> jax.Array:
    """Sequence-parallel attention: inputs/outputs sharded (B, S/axis, H, D)."""
    b, s, h, d = q.shape
    scale = d**-0.5 if scale is None else scale
    if pad_mask is None:
        pad_mask = jnp.ones((b, s), bool)
    fn = jax.shard_map(
        functools.partial(
            _ring_attention_shard,
            axis_name=axis_name,
            causal=causal,
            scale=scale,
        ),
        mesh=mesh,
        in_specs=(
            P(None, axis_name, None, None),
            P(None, axis_name, None, None),
            P(None, axis_name, None, None),
            P(None, axis_name),
        ),
        out_specs=P(None, axis_name, None, None),
    )
    return fn(q, k, v, pad_mask)
