"""Attention: XLA reference implementation + dispatch to the Pallas kernel.

Replaces the reference's flash-attn 2.5.8 CUDA dependency
(/root/reference/src/vlrlhf/utils/auto_load.py:49-56 allowlist and the
per-model FlashAttention2 classes). Supports:

  - GQA (n_kv_heads < n_heads, InternLM2-style repeat_kv —
    models/InternLMXC2/modeling_internlm2.py:227-239)
  - causal masking
  - segment ids, so concatenated chosen/rejected DPO batches and packed
    sequences share one kernel (tokens attend only within their segment)
  - additive bias / explicit boolean masks (padding)

Layouts: q (B, Sq, H, D); k, v (B, Skv, Hkv, D). Output (B, Sq, H, D).
Softmax in float32 always.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30  # large-but-finite: keeps fully-masked rows NaN-free


def _global_mesh_or_none():
    from vlrlhf_tpu.core import mesh as _m

    return _m._GLOBAL_MESH


def make_attention_mask(
    pad_mask_q: jax.Array,  # (B, Sq) 1 = real token
    pad_mask_kv: jax.Array,  # (B, Skv)
    causal: bool = True,
    segment_ids_q: Optional[jax.Array] = None,  # (B, Sq) int
    segment_ids_kv: Optional[jax.Array] = None,
) -> jax.Array:
    """Boolean (B, 1, Sq, Skv) mask; True = attend."""
    mask = pad_mask_q[:, :, None].astype(bool) & pad_mask_kv[:, None, :].astype(bool)
    if causal:
        sq, skv = pad_mask_q.shape[-1], pad_mask_kv.shape[-1]
        # Align last query with last key (supports Sq < Skv decode steps).
        qpos = jnp.arange(sq)[:, None] + (skv - sq)
        kpos = jnp.arange(skv)[None, :]
        mask = mask & (kpos <= qpos)
    if segment_ids_q is not None and segment_ids_kv is not None:
        mask = mask & (segment_ids_q[:, :, None] == segment_ids_kv[:, None, :])
    return mask[:, None, :, :]


def _repeat_kv(x: jax.Array, n_rep: int) -> jax.Array:
    if n_rep == 1:
        return x
    b, s, h, d = x.shape
    return jnp.broadcast_to(x[:, :, :, None, :], (b, s, h, n_rep, d)).reshape(
        b, s, h * n_rep, d
    )


def reference_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: Optional[jax.Array] = None,  # (B, 1|H, Sq, Skv) bool
    bias: Optional[jax.Array] = None,  # additive, same shape
    scale: Optional[float] = None,
    logits_soft_cap: Optional[float] = None,
) -> jax.Array:
    b, sq, h, d = q.shape
    n_rep = h // k.shape[2]
    k, v = _repeat_kv(k, n_rep), _repeat_kv(v, n_rep)
    scale = d**-0.5 if scale is None else scale
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    if logits_soft_cap is not None:
        logits = logits_soft_cap * jnp.tanh(logits / logits_soft_cap)
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    if mask is not None:
        logits = jnp.where(mask, logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bhqk,bkhd->bqhd", probs, v, preferred_element_type=jnp.float32
    )
    return out.astype(q.dtype)


def multi_head_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = True,
    pad_mask_q: Optional[jax.Array] = None,
    pad_mask_kv: Optional[jax.Array] = None,
    segment_ids_q: Optional[jax.Array] = None,
    segment_ids_kv: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    impl: str = "auto",  # 'auto' | 'xla' | 'pallas'
) -> jax.Array:
    """Unified attention entry point used by every model family."""
    b, sq, _, _ = q.shape
    skv = k.shape[1]
    use_pallas = impl == "pallas" or (
        impl == "auto"
        and jax.default_backend() == "tpu"
        and sq >= 128
        and sq == skv  # training shapes; decode goes through generate/kv_cache
    )
    if use_pallas:
        from vlrlhf_tpu.ops.flash_attention import flash_attention

        def _flash(q, k, v, pq, pkv, sq_, skv_):
            return flash_attention(
                q, k, v, causal=causal,
                pad_mask_q=pq, pad_mask_kv=pkv,
                segment_ids_q=sq_, segment_ids_kv=skv_, scale=scale,
            )

        # TENSOR PARALLELISM: pallas_call has no GSPMD partitioning rule —
        # with model-sharded heads XLA would replicate the kernel (gather
        # every operand to every chip). Under a model>1 global mesh, run
        # the kernel per head-shard via shard_map: attention is
        # embarrassingly parallel over heads (contiguous blocks keep GQA
        # grouping intact), zero collectives. Differentiates through the
        # kernel's custom VJP unchanged.
        mesh = _global_mesh_or_none()
        tp = 1 if mesh is None else dict(mesh.shape).get("model", 1)
        nh, nkv = q.shape[2], k.shape[2]
        # Engage for ANY multi-device mesh (not just model>1): batch-sharded
        # q/k/v under a plain dp/fsdp training mesh would also be gathered
        # to every chip around the unpartitionable custom call.
        if mesh is not None and mesh.devices.size > 1 \
                and {"data", "fsdp", "model"} <= set(mesh.axis_names) \
                and nh % tp == 0 and nkv % tp == 0 \
                and b % (dict(mesh.shape)["data"]
                         * dict(mesh.shape)["fsdp"]) == 0:
            from jax.sharding import PartitionSpec as _P

            bb = ("data", "fsdp")
            hspec = _P(bb, None, "model", None)
            mspec = _P(bb, None)

            def local(q, k, v, pq, pkv, sq_, skv_):
                return _flash(q, k, v, pq, pkv, sq_, skv_)

            ones_q = (
                pad_mask_q if pad_mask_q is not None
                else jnp.ones((b, sq), bool)
            )
            ones_kv = (
                pad_mask_kv if pad_mask_kv is not None
                else jnp.ones((b, skv), bool)
            )
            seg_q = (
                segment_ids_q if segment_ids_q is not None
                else jnp.zeros((b, sq), jnp.int32)
            )
            seg_kv = (
                segment_ids_kv if segment_ids_kv is not None
                else jnp.zeros((b, skv), jnp.int32)
            )
            return jax.shard_map(
                local, mesh=mesh,
                in_specs=(hspec, hspec, hspec, mspec, mspec, mspec, mspec),
                out_specs=hspec, check_vma=False,
            )(q, k, v, ones_q, ones_kv, seg_q, seg_kv)
        return _flash(
            q, k, v, pad_mask_q, pad_mask_kv, segment_ids_q, segment_ids_kv
        )
    if pad_mask_q is None:
        pad_mask_q = jnp.ones((b, sq), dtype=bool)
    if pad_mask_kv is None:
        pad_mask_kv = jnp.ones((b, skv), dtype=bool)
    mask = make_attention_mask(
        pad_mask_q, pad_mask_kv, causal, segment_ids_q, segment_ids_kv
    )
    return reference_attention(q, k, v, mask=mask, scale=scale)
