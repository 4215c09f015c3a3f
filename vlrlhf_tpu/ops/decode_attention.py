"""Pallas decode attention: one query token per row against the KV cache.

The decode-side counterpart of ops/flash_attention.py (the sglang fast-path
role, /root/reference/src/vlrlhf/eval/utils.py:123-173). Decode is
HBM-bandwidth-bound — the win is reading each cache byte exactly once with
the mask/softmax/weighted-sum fused around the DMA, instead of XLA's
dense-mask path which materializes (B, H, 1, S) f32 logits and re-reads the
repeated-KV expansion for GQA.

Layout: q (B, nh, hd); cache k/v (L, B, nkv, S, hd) head-major DECODE layout
(contiguous (S, hd) stripes per head: tile-aligned blocks + unit-stride DMA;
the engine transposes the prefill cache once per generation call). Slot ==
absolute position (right-padded batches). `lengths` (B,) is the current
position per row.

The CURRENT token's k/v are passed separately (k_cur/v_cur) and folded in as
an explicit self-attention term in the finalize step: slots < lengths[b] come
from the cache, slot lengths[b] from k_cur. This lets the caller DEFER cache
writes — per-layer scatters into the multi-GB stacked cache measured
~4 ms/token at B=32 S=1024 on v5e; one batched scatter at the end of the
step replaces 2L of them.

Grid (B, S-blocks): each program processes ALL kv heads of one S block.
Online softmax over S blocks in f32 scratch; blocks entirely beyond
lengths[b] are skipped (@pl.when). GQA: q is viewed (B, nkv, g, hd);
head-batched dot_generals (batch dim 0 on both operands — Mosaic's
requirement) avoid repeating KV.

Runs in interpret mode off-TPU (CPU tests), with an XLA fallback
(force_xla=True) that doubles as the parity oracle.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _global_mesh_or_none():
    from vlrlhf_tpu.core import mesh as _m

    return _m._GLOBAL_MESH


def _decode_kernel(
    len_ref,  # (B, 1) SMEM — current position per batch row
    q_ref,  # (1, nkv, g, hd)
    kc_ref,  # (1, nkv, hd) current token's k
    vc_ref,  # (1, nkv, hd)
    k_ref,  # (1, [1,] nkv, block_s, hd) cache block
    v_ref,
    *rest,  # [ks_ref, vs_ref] when the cache is int8-quantized, then o_ref
    # scratch: m_scr (nh, LANES) f32, l_scr (nh, LANES) f32, acc (nh, hd) f32
    scale: float,
    block_s: int,
    num_s_blocks: int,
    quantized: bool,
):
    if quantized:
        ks_ref, vs_ref, o_ref, m_scr, l_scr, acc_scr = rest
    else:
        o_ref, m_scr, l_scr, acc_scr = rest
    ki = pl.program_id(1)

    @pl.when(ki == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    length = len_ref[pl.program_id(0), 0]
    start = ki * block_s

    @pl.when(start < length)
    def _run():
        q = q_ref[0].astype(jnp.float32) * scale  # (nkv, g, hd)
        nkv, g, hd = q.shape
        nh = nkv * g
        k = k_ref[...].reshape(nkv, block_s, hd)
        # head-batched q @ k^T: (nkv, g, hd) x (nkv, block_s, hd)
        s = jax.lax.dot_general(
            q, k.astype(jnp.float32),
            (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).reshape(nkv, g, block_s)
        if quantized:
            # int8 cache: per-(head, slot) k scales fold into the scores.
            # Two steps: drop leading unit dims (trailing-preserving reshape,
            # Mosaic-supported), then broadcast over the group dim — the
            # single fused reshape (1,1,nkv,bs)->(nkv,1,bs) fails vector
            # layout inference on non-128 block_s.
            ks2 = ks_ref[...].reshape(nkv, block_s).astype(jnp.float32)
            s = s * ks2[:, None, :]
        s = s.reshape(nh, block_s)
        slot = start + jax.lax.broadcasted_iota(jnp.int32, (nh, block_s), 1)
        # STRICT <: the current token's k/v are not in the cache yet
        s = s + jnp.where(slot < length, 0.0, MASK_VALUE)

        m_prev = m_scr[...]  # (nh, LANES)
        l_prev = l_scr[...]
        m_curr = jnp.max(s, axis=1)[:, None]
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next[:, :1])  # (nh, block_s)
        m_scr[...] = m_next
        l_scr[...] = alpha * l_prev + jnp.sum(p, axis=1)[:, None]
        p3 = p.reshape(nkv, g, block_s)
        if quantized:
            # fold v scales into p: sum_s p_s * (v_q_s * vs_s)
            #                     = (p * vs) @ v_q  (per head, per slot)
            vs2 = vs_ref[...].reshape(nkv, block_s).astype(jnp.float32)
            p3 = p3 * vs2[:, None, :]
            pv_rhs = v_ref[...].reshape(nkv, block_s, hd).astype(jnp.float32)
            pv = jax.lax.dot_general(
                p3, pv_rhs,
                (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ).reshape(nh, hd)
        else:
            # head-batched p @ v: (nkv, g, block_s) x (nkv, block_s, hd)
            pv = jax.lax.dot_general(
                p3.astype(v_ref.dtype),
                v_ref[...].reshape(nkv, block_s, hd),
                (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ).reshape(nh, hd)
        acc_scr[...] = acc_scr[...] * alpha[:, :1] + pv

    @pl.when(ki == num_s_blocks - 1)
    def _finalize():
        # fold in the self term (slot == length): always attended
        q = q_ref[0].astype(jnp.float32) * scale  # (nkv, g, hd)
        nkv, g, hd = q.shape
        nh = nkv * g
        kc = kc_ref[0].astype(jnp.float32)  # (nkv, hd)
        s_self = jnp.sum(q * kc[:, None, :], axis=-1).reshape(nh, 1)
        m = m_scr[...][:, :1]
        l = l_scr[...][:, :1]
        acc = acc_scr[...]
        m_fin = jnp.maximum(m, s_self)
        alpha = jnp.exp(m - m_fin)  # exp(-inf - finite) = 0 for empty cache
        p_self = jnp.exp(s_self - m_fin)
        l_fin = alpha * l + p_self
        v_rep = jnp.broadcast_to(
            vc_ref[0].astype(jnp.float32)[:, None, :], (nkv, g, hd)
        ).reshape(nh, hd)
        out = (acc * alpha + p_self * v_rep) / l_fin
        o_ref[0] = out.reshape(nkv, g, hd).astype(o_ref.dtype)


def _decode_attention_xla(q, k_cache, v_cache, k_cur, v_cur, lengths, scale,
                          k_scale=None, v_scale=None):
    """Dense fallback (and the oracle in tests). Cache (B, nkv, S, hd);
    optional int8 cache with per-(B, nkv, S) scales is dequantized up front."""
    from vlrlhf_tpu.ops.attention import reference_attention

    if k_scale is not None:
        k_cache = (
            k_cache.astype(jnp.float32) * k_scale[..., None].astype(jnp.float32)
        ).astype(q.dtype)
        v_cache = (
            v_cache.astype(jnp.float32) * v_scale[..., None].astype(jnp.float32)
        ).astype(q.dtype)
    b = q.shape[0]
    s = k_cache.shape[2]
    # splice the current token in (functional; CPU path so the copy is fine)
    bi = jnp.arange(b)[:, None]
    hi = jnp.arange(k_cache.shape[1])[None, :]
    k_cache = k_cache.at[bi, hi, lengths[:, None]].set(
        k_cur.astype(k_cache.dtype)
    )
    v_cache = v_cache.at[bi, hi, lengths[:, None]].set(
        v_cur.astype(v_cache.dtype)
    )
    attend = jnp.arange(s)[None, :] <= lengths[:, None]  # (B, S)
    out = reference_attention(
        q[:, None],  # (B, 1, nh, hd)
        jnp.transpose(k_cache, (0, 2, 1, 3)),
        jnp.transpose(v_cache, (0, 2, 1, 3)),
        mask=attend[:, None, None, :],
        scale=scale,
    )
    return out[:, 0]


def decode_attention(
    q: jax.Array,  # (B, nh, hd)
    k_cache: jax.Array,  # (B, nkv, S, hd) or (L, B, nkv, S, hd) with `layer`
    v_cache: jax.Array,
    k_cur: jax.Array,  # (B, nkv, hd) current token's k (not yet in cache)
    v_cur: jax.Array,
    lengths: jax.Array,  # (B,) int32 current positions
    scale: float | None = None,
    block_s: int = 512,
    layer: int | None = None,
    force_xla: bool = False,
    k_scale: jax.Array | None = None,  # (B, nkv, S) or (L, B, nkv, S):
    v_scale: jax.Array | None = None,  # int8 cache per-vector scales
    _tp: bool = True,  # internal: False inside the shard_map re-entry
) -> jax.Array:
    """When `layer` is given the caches are the FULL stacked (L, B, nkv, S,
    hd) buffers and the kernel block-indexes into layer `layer` directly —
    slicing the stacked cache in XLA before a pallas_call materializes a
    per-layer copy (measured ~0.75 ms/layer at B=32 S=1024 on v5e), whereas
    block-indexing is zero-copy.

    An int8 cache (k_scale/v_scale given) halves cache DMA bytes: the kernel
    folds k scales into the scores and v scales into the softmax weights, so
    dequantization never materializes (B, nkv, S, hd) floats. The CURRENT
    token's k/v stay bf16 (the self term is exact).

    TENSOR PARALLELISM: pallas_call has no GSPMD partitioning rule, so with
    model-axis-sharded heads XLA would REPLICATE the custom call — an
    all-gather of the multi-GB cache to every chip per token. When the
    registered global mesh has model > 1 the call re-enters itself under
    `jax.shard_map(axis_names={"model"})` (partial-manual: batch sharding
    stays with GSPMD): each shard runs the kernel over its own kv-head
    slice of the cache — attention is embarrassingly parallel over heads,
    zero collectives. Head blocks are contiguous, so GQA grouping survives
    the split (q head h reads kv head h // g on every shard)."""
    b, nh, hd = q.shape
    if layer is None:
        nkv, s_len = k_cache.shape[1], k_cache.shape[2]
    else:
        nkv, s_len = k_cache.shape[2], k_cache.shape[3]
    scale = hd**-0.5 if scale is None else scale
    quantized = k_scale is not None

    mesh = _global_mesh_or_none()
    tp = 1 if mesh is None else dict(mesh.shape).get("model", 1)
    if mesh is not None and _tp and not force_xla \
            and mesh.devices.size > 1 \
            and {"data", "fsdp", "model"} <= set(mesh.axis_names):
        # Engage for ANY multi-device mesh: batch-sharded operands under a
        # plain dp/fsdp mesh hit the same replication wall as model-sharded
        # heads (the custom call is unpartitionable either way).
        ndp = dict(mesh.shape)["data"] * dict(mesh.shape)["fsdp"]
        if nh % tp == 0 and nkv % tp == 0 and b % ndp == 0:
            from jax.sharding import PartitionSpec as _P

            bb = ("data", "fsdp")
            cache_spec = (
                _P(None, bb, "model", None, None)
                if layer is not None
                else _P(bb, "model", None, None)
            )
            sc_spec = (
                _P(None, bb, "model", None)
                if layer is not None
                else _P(bb, "model", None)
            )
            operands = [q, k_cache, v_cache, k_cur, v_cur, lengths]
            specs = [
                _P(bb, "model", None), cache_spec, cache_spec,
                _P(bb, "model", None), _P(bb, "model", None), _P(bb),
            ]
            if quantized:
                operands += [k_scale, v_scale]
                specs += [sc_spec, sc_spec]

            def local(*args):
                qq, kc, vc, kcur, vcur, lens = args[:6]
                ks = vs = None
                if quantized:
                    ks, vs = args[6], args[7]
                return decode_attention(
                    qq, kc, vc, kcur, vcur, lens, scale=scale,
                    block_s=block_s, layer=layer, k_scale=ks, v_scale=vs,
                    _tp=False,
                )

            return jax.shard_map(
                local, mesh=mesh,
                in_specs=tuple(specs), out_specs=_P(bb, "model", None),
                check_vma=False,
            )(*operands)

    def _xla():
        kc = k_cache if layer is None else k_cache[layer]
        vc = v_cache if layer is None else v_cache[layer]
        ks = k_scale if layer is None or k_scale is None else k_scale[layer]
        vs = v_scale if layer is None or v_scale is None else v_scale[layer]
        return _decode_attention_xla(
            q, kc, vc, k_cur, v_cur, lengths, scale, ks, vs
        )

    if force_xla:
        return _xla()

    g = nh // nkv
    # VMEM budget: k+v blocks at <=6MB so the double-buffered pair stays
    # under the 16MB scoped-vmem limit (8MB measured 16.05M with 32 heads
    # x hd 128 — a 48K bust).
    itemsize = 1 if quantized else 2
    while block_s > 128 and 2 * block_s * nkv * hd * itemsize > 6 * 2**20:
        block_s //= 2
    block_s = min(block_s, s_len)
    if s_len % block_s or (quantized and block_s % 128 and block_s != s_len):
        # largest aligned divisor of s_len (zero-copy requires exact
        # blocks; the engine rounds cache lengths to multiples of 128).
        # int8 caches: the (nkv, block_s) scale blocks put block_s on the
        # LANES dim, so it must be a 128-multiple (or the full array).
        step = 128 if quantized else 8
        block_s = next(
            (c for c in range(min(block_s, s_len) // step * step, step - 1,
                              -step)
             if c and s_len % c == 0),
            0,
        )
        if not block_s:
            return _xla()
    num_s_blocks = s_len // block_s

    q4 = q.reshape(b, nkv, g, hd)
    lengths2 = lengths.reshape(b, 1).astype(jnp.int32)

    kernel = functools.partial(
        _decode_kernel,
        scale=scale,
        block_s=block_s,
        num_s_blocks=num_s_blocks,
        quantized=quantized,
    )
    if layer is None:
        kv_spec = pl.BlockSpec(
            (1, nkv, block_s, hd), lambda bi, ki: (bi, 0, ki, 0)
        )
        sc_spec = pl.BlockSpec((1, nkv, block_s), lambda bi, ki: (bi, 0, ki))
    else:
        kv_spec = pl.BlockSpec(
            (1, 1, nkv, block_s, hd),
            lambda bi, ki, _l=layer: (_l, bi, 0, ki, 0),
        )
        sc_spec = pl.BlockSpec(
            (1, 1, nkv, block_s),
            lambda bi, ki, _l=layer: (_l, bi, 0, ki),
        )
    cur_spec = pl.BlockSpec((1, nkv, hd), lambda bi, ki: (bi, 0, 0))
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # lengths, whole array
        pl.BlockSpec((1, nkv, g, hd), lambda bi, ki: (bi, 0, 0, 0)),
        cur_spec,
        cur_spec,
        kv_spec,
        kv_spec,
    ]
    operands = [lengths2, q4, k_cur, v_cur, k_cache, v_cache]
    if quantized:
        in_specs += [sc_spec, sc_spec]
        operands += [k_scale, v_scale]
    out = pl.pallas_call(
        kernel,
        grid=(b, num_s_blocks),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, nkv, g, hd), lambda bi, ki: (bi, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, nkv, g, hd), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((nh, LANES), jnp.float32),
            pltpu.VMEM((nh, LANES), jnp.float32),
            pltpu.VMEM((nh, hd), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(*operands)
    return out.reshape(b, nh, hd)
