"""Unified llama-family decoder.

ONE implementation, configured per family, replaces all four of the
reference's vendored/wrapped decoder codebases:

  - LLaMA/Vicuna   (LLaVA-1.5 / LLaVA-Next-Vicuna text towers)
  - Mistral        (LLaVA-Next-Mistral; sliding window unused at seq<=4096)
  - InternLM2      (InternLM-XComposer2; GQA via num_kv_heads —
                    /root/reference/src/vlrlhf/models/InternLMXC2/modeling_internlm2.py:227-239)
  - QWen           (Qwen-VL; fused c_attn splits to wq/wk/wv at port time,
                    qkv_bias=True, MLP w2=gate/w1=up/c_proj=down —
                    /root/reference/src/vlrlhf/models/QwenVL/modeling_qwen.py)

TPU-first structure: params for all layers are stacked on a leading axis
("layers_scanned") and the stack runs under one `lax.scan` with optional
`jax.checkpoint` remat — one compiled layer body regardless of depth.
Attention dispatches to the Pallas flash kernel on TPU (ops/flash_attention).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp

from jax.ad_checkpoint import checkpoint_name

from vlrlhf_tpu.models.common import (
    Ctx,
    embed,
    init_linear,
    linear,
    linear_deltas,
)
from vlrlhf_tpu.ops.attention import multi_head_attention, reference_attention
from vlrlhf_tpu.ops.norms import rms_norm
from vlrlhf_tpu.ops.rope import RopeConfig, apply_rope, rope_frequencies

PyTree = Any


@dataclasses.dataclass(frozen=True)
class LMConfig:
    vocab_size: int
    hidden_size: int
    intermediate_size: int
    num_layers: int
    num_heads: int
    num_kv_heads: int
    head_dim: int = 0  # 0 -> hidden_size // num_heads
    rope_base: float = 10000.0
    rope_scaling_type: str = "none"
    rope_scaling_factor: float = 1.0
    max_position_embeddings: int = 4096
    rms_eps: float = 1e-6
    qkv_bias: bool = False  # QWen / Qwen2 style
    o_bias: bool = False
    tie_embeddings: bool = False
    dtype: Any = jnp.bfloat16
    # Sequence parallelism (ring attention over this mesh axis) for
    # long-context training — the declared TPU-native extension (SURVEY.md §5
    # long-context; the reference maxes out at seq 2048 with none). Empty =
    # off. Applies to the training forward only (decode uses the KV cache).
    sequence_parallel_axis: str = ""
    # Pipeline parallelism (models/lm/pipeline.py): >1 splits the layer
    # stack into this many contiguous stages over the mesh's `pipe` axis;
    # the batch flows through as GPipe microbatches (pipeline_microbatches,
    # 0 = one per stage). Training forward only — another TPU-native
    # scaling extension beyond the reference (SURVEY.md §2.3: PP absent).
    pipeline_stages: int = 1
    pipeline_microbatches: int = 0
    remat: bool = True
    # 'full' recomputes everything in bwd; 'dots' saves matmul outputs
    # (heaviest HBM); 'attn' saves only each layer's attention output
    # (B*S*H bytes/layer) so backward recomputes just norms+MLP; 'mlp'
    # additionally saves the two (B*S*ff) MLP intermediates — ~45% of the
    # per-layer recompute FLOPs for ~3 GiB at 7B/2k-token steps (the sweet
    # spot once an int8 QLoRA base frees half the param HBM).
    remat_policy: str = "full"

    @property
    def head_dim_(self) -> int:
        return self.head_dim or self.hidden_size // self.num_heads

    @property
    def rope(self) -> RopeConfig:
        return RopeConfig(
            head_dim=self.head_dim_,
            base=self.rope_base,
            scaling_type=self.rope_scaling_type,
            scaling_factor=self.rope_scaling_factor,
            max_position_embeddings=self.max_position_embeddings,
        )


def init_lm_params(cfg: LMConfig, key: jax.Array) -> PyTree:
    """Random init (tests / from-scratch); real checkpoints come from
    utils/hf_port.py."""
    keys = jax.random.split(key, 8)
    h, ff = cfg.hidden_size, cfg.intermediate_size
    nh, nkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim_
    L = cfg.num_layers
    dt = cfg.dtype

    def stack(fn):
        ps = [fn(jax.random.fold_in(keys[0], i)) for i in range(L)]
        return jax.tree.map(lambda *xs: jnp.stack(xs), *ps)

    def layer(k):
        ks = jax.random.split(k, 7)
        return {
            "input_layernorm": {"weight": jnp.ones((h,), dt)},
            "post_attention_layernorm": {"weight": jnp.ones((h,), dt)},
            "attn": {
                "wq": init_linear(ks[0], h, nh * hd, cfg.qkv_bias, dt),
                "wk": init_linear(ks[1], h, nkv * hd, cfg.qkv_bias, dt),
                "wv": init_linear(ks[2], h, nkv * hd, cfg.qkv_bias, dt),
                "wo": init_linear(ks[3], nh * hd, h, cfg.o_bias, dt),
            },
            "mlp": {
                "gate": init_linear(ks[4], h, ff, False, dt),
                "up": init_linear(ks[5], h, ff, False, dt),
                "down": init_linear(ks[6], ff, h, False, dt),
            },
        }

    params = {
        "embed_tokens": {
            "embedding": (
                jax.random.normal(keys[1], (cfg.vocab_size, h)) * 0.02
            ).astype(dt)
        },
        "layers_scanned": stack(layer),
        "norm": {"weight": jnp.ones((h,), dt)},
    }
    if not cfg.tie_embeddings:
        params["lm_head"] = init_linear(keys[2], h, cfg.vocab_size, False, dt)
    return params


def _qkv_proj(
    p: dict,  # attn params: {wq,wk,wv,...} or fused {wqkv,...} (models/lm/fuse)
    actx: Ctx,
    h: jax.Array,  # (B, S, H) normed input
    nh: int,
    nkv: int,
    hd: int,
):
    """q/k/v projections -> ((B,S,nh,hd), (B,S,nkv,hd), (B,S,nkv,hd)).

    Fused serving params (fuse.fuse_lm_params) take ONE (H, (nh+2nkv)*hd)
    weight stream + split; adapter deltas (LoRA / PLoRA) stay per-submatrix
    on top — the adapter tree is never fused, so rollout policies work
    unchanged. The unfused branch carries the remat checkpoint names
    (training's save-policy hooks; fused params never train)."""
    b, s, _ = h.shape
    if "wqkv" in p:
        # fused-adapter serving layout (lora.fuse_adapter_sets): one
        # delta pair for all of q/k/v rides the "wqkv" key inside linear;
        # the per-name loop below still applies any adapters left
        # per-target (built-in PLoRA, or partially-targeted sets)
        y = linear(p["wqkv"], h, actx.sub("wqkv"))
        dq, dk = nh * hd, nkv * hd
        parts = [y[..., :dq], y[..., dq:dq + dk], y[..., dq + dk:]]
        for j, name in enumerate(("wq", "wk", "wv")):
            d = linear_deltas(h, actx.sub(name))
            if d is not None:
                parts[j] = parts[j] + d.astype(parts[j].dtype)
        q, k, v = parts
    else:
        q = checkpoint_name(linear(p["wq"], h, actx.sub("wq")), "attn_q")
        k = checkpoint_name(linear(p["wk"], h, actx.sub("wk")), "attn_k")
        v = checkpoint_name(linear(p["wv"], h, actx.sub("wv")), "attn_v")
    return (
        q.reshape(b, s, nh, hd),
        k.reshape(b, s, nkv, hd),
        v.reshape(b, s, nkv, hd),
    )


def _attention_block(
    cfg: LMConfig,
    p: dict,
    ctx: Ctx,
    x: jax.Array,  # (B, S, H)
    cos: jax.Array,
    sin: jax.Array,
    pad_mask: Optional[jax.Array],
    segment_ids: Optional[jax.Array],
    positions: jax.Array,
    cache_kv: Optional[tuple],  # (ck, cv[, k_scale, v_scale])
    kv_mask: Optional[jax.Array],
    empty_cache_len: Optional[int] = None,  # build this layer's cache from
    # scratch (engine prefill): requires positions[b, i] == i (the engine's
    # right-padded contract, KV slot == position)
    quantize_cache: bool = False,  # with empty_cache_len: int8 KV + scales
):
    b, s, _ = x.shape
    nh, nkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim_
    q, k, v = _qkv_proj(p, ctx, x, nh, nkv, hd)
    q, k = apply_rope(q, k, cos, sin)

    if empty_cache_len is not None:
        # EMPTY-PREFILL (engine generation start): the cache is all-new and
        # slot == position (right-padded prompts, positions == arange), so
        # this layer's head-major (B, nkv, Sc, hd) cache is just the chunk's
        # k/v transposed and zero-padded to Sc — ONE fused pad per tensor,
        # no zeros slab + scatter (a (hd,)-granular scatter measured ~4%
        # off serving throughput) and no full-cache relayout afterwards
        # (the old transpose's 1.5x-cache transient OOMed judge
        # co-residency at 7B). Quantization happens before the pad when the
        # cache is int8 — the bf16 cache never materializes.
        pad = [(0, 0), (0, 0), (0, empty_cache_len - s), (0, 0)]
        kt = jnp.transpose(k, (0, 2, 1, 3))  # (B, nkv, S, hd)
        vt = jnp.transpose(v, (0, 2, 1, 3))
        ks = vs = None
        if quantize_cache:
            from vlrlhf_tpu.ops.quant import quantize_kv

            kq, ksc = quantize_kv(kt)  # int8 codes, (B, nkv, S) scales
            vq, vsc = quantize_kv(vt)
            ck, cv = jnp.pad(kq, pad), jnp.pad(vq, pad)
            ks, vs = jnp.pad(ksc, pad[:3]), jnp.pad(vsc, pad[:3])
        else:
            ck = jnp.pad(kt.astype(cfg.dtype), pad)
            cv = jnp.pad(vt.astype(cfg.dtype), pad)
        out = multi_head_attention(
            q, k, v, causal=True,
            pad_mask_q=pad_mask, pad_mask_kv=pad_mask,
            impl=ctx.attn_impl,
        )
        new_cache = (ck, cv, ks, vs)
    elif cache_kv is not None:
        # Write current k/v at `positions` slots in the HEAD-MAJOR decode
        # layout (B, nkv, Sc, hd) — prefill-into-existing-cache path.
        # Quantization happens per vector at write time when the cache is
        # int8 — the bf16 cache never materializes, which is what lets a 7B
        # long-context prefill fit on a 16 GiB chip.
        ck, cv = cache_kv[0], cache_kv[1]
        ks = vs = None
        if len(cache_kv) == 4 and cache_kv[2] is not None:
            from vlrlhf_tpu.ops.quant import quantize_kv

            ks, vs = cache_kv[2], cache_kv[3]  # (B, nkv, Sc)
        bi3 = jnp.arange(b)[:, None, None]
        hi3 = jnp.arange(nkv)[None, :, None]
        pos3 = positions[:, None, :]  # (B, 1, S)
        kt = jnp.transpose(k, (0, 2, 1, 3))  # (B, nkv, S, hd)
        vt = jnp.transpose(v, (0, 2, 1, 3))
        if ks is not None:
            kq, ksc = quantize_kv(kt)  # (B, nkv, S, hd) int8, (B, nkv, S)
            vq, vsc = quantize_kv(vt)
            ck = ck.at[bi3, hi3, pos3].set(kq)
            cv = cv.at[bi3, hi3, pos3].set(vq)
            ks = ks.at[bi3, hi3, pos3].set(ksc)
            vs = vs.at[bi3, hi3, pos3].set(vsc)
        else:
            ck = ck.at[bi3, hi3, pos3].set(kt.astype(ck.dtype))
            cv = cv.at[bi3, hi3, pos3].set(vt.astype(cv.dtype))
        if s > 1:
            # PREFILL: the cache holds nothing before this chunk, so chunk-
            # local causal attention == attention over the cache — use the
            # flash kernel instead of dense (S x cache_len) masked scores.
            out = multi_head_attention(
                q, k, v, causal=True,
                pad_mask_q=pad_mask, pad_mask_kv=pad_mask,
                impl=ctx.attn_impl,
            )
        else:
            # DECODE: one query against the whole cache, slot-index causality.
            # (legacy scan decode path; the engine uses lm_decode instead)
            ckf, cvf = ck, cv
            if ks is not None:
                ckf = (
                    ck.astype(jnp.float32) * ks[..., None].astype(jnp.float32)
                ).astype(x.dtype)
                cvf = (
                    cv.astype(jnp.float32) * vs[..., None].astype(jnp.float32)
                ).astype(x.dtype)
            # head-major (B, nkv, Sc, hd) -> (B, Sc, nkv, hd) for the dense
            # reference attention below (legacy path, clarity over speed)
            ckf = jnp.transpose(ckf, (0, 2, 1, 3))
            cvf = jnp.transpose(cvf, (0, 2, 1, 3))
            sc = ck.shape[2]
            slots = jnp.arange(sc)[None, None, :]  # (1, 1, Sc)
            attend = slots <= positions[:, :, None]
            if kv_mask is not None:
                attend = attend & kv_mask[:, None, :].astype(bool)
            if pad_mask is not None:
                attend = attend & pad_mask[:, :, None].astype(bool)
            out = reference_attention(q, ckf, cvf, mask=attend[:, None])
        new_cache = (ck, cv, ks, vs)
    elif cfg.sequence_parallel_axis:
        # Ring attention: sequence sharded over the named mesh axis, K/V
        # blocks rotate via ppermute (ops/ring_attention.py).
        assert segment_ids is None, (
            "sequence-parallel attention does not support segment ids"
        )
        from vlrlhf_tpu.core.mesh import get_global_mesh
        from vlrlhf_tpu.ops.attention import _repeat_kv
        from vlrlhf_tpu.ops.ring_attention import ring_attention

        n_rep = nh // nkv
        out = ring_attention(
            q,
            _repeat_kv(k, n_rep),
            _repeat_kv(v, n_rep),
            mesh=get_global_mesh(),
            axis_name=cfg.sequence_parallel_axis,
            causal=True,
            pad_mask=pad_mask,
        )
        new_cache = None
    else:
        out = multi_head_attention(
            q,
            k,
            v,
            causal=True,
            pad_mask_q=pad_mask,
            pad_mask_kv=pad_mask,
            segment_ids_q=segment_ids,
            segment_ids_kv=segment_ids,
            impl=ctx.attn_impl,
        )
        new_cache = None
    out = checkpoint_name(out.reshape(b, s, nh * hd), "attn_pre_wo")
    return linear(p["wo"], out, ctx.sub("wo")), new_cache


def _mlp_block(p: dict, ctx: Ctx, x: jax.Array) -> jax.Array:
    if "gateup" in p:
        # fused serving layout (models/lm/fuse): one (H, 2*ff) weight
        # stream; a fused gate+up adapter delta (lora.fuse_adapter_sets)
        # rides the "gateup" key inside linear, per-name deltas below
        # cover per-target adapters (PLoRA / partial sets)
        y = linear(p["gateup"], x, ctx.sub("gateup"))
        ff = y.shape[-1] // 2
        gate, up = y[..., :ff], y[..., ff:]
        dg = linear_deltas(x, ctx.sub("gate"))
        if dg is not None:
            gate = gate + dg.astype(gate.dtype)
        du = linear_deltas(x, ctx.sub("up"))
        if du is not None:
            up = up + du.astype(up.dtype)
    else:
        gate = checkpoint_name(
            linear(p["gate"], x, ctx.sub("gate")), "ffn_gate"
        )
        up = checkpoint_name(linear(p["up"], x, ctx.sub("up")), "ffn_up")
    return linear(p["down"], jax.nn.silu(gate) * up, ctx.sub("down"))


def lm_decode(
    cfg: LMConfig,
    params: PyTree,
    *,
    last_token: jax.Array,  # (B,) or (B, 1)
    lengths: jax.Array,  # (B,) current position == cache write slot
    cache: dict,  # {"k": (L, B, nkv, Sc, hd), "v": ...} — DECODE layout
    ctx: Optional[Ctx] = None,
    pending: Optional[dict] = None,  # previous token's kv, not yet in cache
):
    """Single-token decode step, built for speed rather than generality:

      - UNROLLED python loop over layers (constant-index slices of the
        stacked params/cache) instead of lax.scan — the scan carry re-stacks
        the multi-GB cache every token (measured ~2.2 ms/token at B=64 on
        v5e, ROADMAP r1); unrolled + donated buffers update in place.
      - fused Pallas decode-attention over the HEAD-MAJOR cache
        (ops/decode_attention): one pass over cache bytes, no (B, H, 1, Sc)
        f32 logits materialized. The engine transposes the prefill cache to
        (L, B, nkv, Sc, hd) once per generation.
      - DEFERRED cache writes: the current token's k/v ride through the
        kernel as an explicit self-term and are written by ONE batched
        scatter at the start of the NEXT step (`pending`). Writing before
        any kernel reads lets XLA update the donated buffer in place; the
        same scatter placed after the reads copies the full multi-GB cache
        (measured ~2.2 ms extra at B=32 S=1024 on v5e, and per-layer
        scatters cost ~4.3 ms).

    Returns (logits (B, 1, V), new_cache, new_pending). Pass new_pending to
    the next call; the final token's kv simply never lands in the cache
    (nothing attends to it)."""
    ctx = ctx or Ctx()
    if last_token.ndim == 1:
        last_token = last_token[:, None]
    b = last_token.shape[0]
    positions = lengths[:, None]  # (B, 1)
    x = embed(params["embed_tokens"], last_token, cfg.dtype)
    cos, sin = rope_frequencies(
        cfg.rope, positions, seq_len=cache["k"].shape[3]
    )
    nh, nkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim_
    layer_ctx = ctx.sub("layers_scanned")
    ck_all, cv_all = cache["k"], cache["v"]
    ks_all, vs_all = cache.get("k_scale"), cache.get("v_scale")
    quantized_cache = ks_all is not None

    if pending is not None:
        # write_pos == cache_len means "nothing pending" (OOB scatter drops)
        li = jnp.arange(cfg.num_layers)[:, None, None]
        bi2 = jnp.arange(b)[None, :, None]
        hi2 = jnp.arange(nkv)[None, None, :]
        pos3 = pending["pos"][None, :, None]
        if quantized_cache:
            # pending k/v arrive bf16 (the self term used them exactly);
            # quantize per vector at write time (ops/quant.py)
            from vlrlhf_tpu.ops.quant import quantize_kv

            pk, pks = quantize_kv(pending["k"])
            pv_, pvs = quantize_kv(pending["v"])
            ck_all = ck_all.at[li, bi2, hi2, pos3].set(pk, mode="drop")
            cv_all = cv_all.at[li, bi2, hi2, pos3].set(pv_, mode="drop")
            ks_all = ks_all.at[li, bi2, hi2, pos3].set(pks, mode="drop")
            vs_all = vs_all.at[li, bi2, hi2, pos3].set(pvs, mode="drop")
        else:
            ck_all = ck_all.at[li, bi2, hi2, pos3].set(pending["k"], mode="drop")
            cv_all = cv_all.at[li, bi2, hi2, pos3].set(pending["v"], mode="drop")

    from vlrlhf_tpu.ops.decode_attention import decode_attention

    new_ks, new_vs = [], []
    for i in range(cfg.num_layers):
        lp = jax.tree.map(lambda a: a[i], params["layers_scanned"])
        la = None
        if layer_ctx.adapters is not None:
            la = jax.tree.map(lambda a: a[i], layer_ctx.adapters)
        # base PLoRA never applies here: decode/continuation tokens are
        # text positions (im_mask=0 in the reference's forward)
        lctx = dataclasses.replace(layer_ctx, adapters=la, base_adapters=None)
        actx = lctx.sub("attn")
        h = rms_norm(x, lp["input_layernorm"]["weight"], cfg.rms_eps)
        q, k, v = _qkv_proj(lp["attn"], actx, h, nh, nkv, hd)
        q, k = apply_rope(q, k, cos, sin)
        # pending stays in COMPUTE dtype — the next step's self term uses it
        # exactly, and (for int8 caches) quantization happens at write time
        new_ks.append(k[:, 0].astype(cfg.dtype))
        new_vs.append(v[:, 0].astype(cfg.dtype))
        # The STACKED caches go in with a static layer index (slicing before
        # a pallas_call materializes a per-layer copy); the current token's
        # k/v ride as an explicit self-term so the cache write can be
        # DEFERRED — 2L per-layer scatters into the multi-GB cache measured
        # ~4 ms/token at B=32 on v5e; one batched scatter below replaces them.
        out = decode_attention(
            q[:, 0], ck_all, cv_all, k[:, 0], v[:, 0], lengths, layer=i,
            k_scale=ks_all, v_scale=vs_all,
        )
        out = linear(lp["attn"]["wo"], out.reshape(b, 1, nh * hd), actx.sub("wo"))
        x = x + out
        h = rms_norm(x, lp["post_attention_layernorm"]["weight"], cfg.rms_eps)
        x = x + _mlp_block(lp["mlp"], lctx.sub("mlp"), h)

    new_pending = {
        "k": jnp.stack(new_ks, 0),
        "v": jnp.stack(new_vs, 0),
        "pos": lengths,
    }

    hidden = rms_norm(x, params["norm"]["weight"], cfg.rms_eps)
    if cfg.tie_embeddings:
        logits = hidden @ params["embed_tokens"]["embedding"].astype(
            hidden.dtype
        ).T
    else:
        logits = linear(params["lm_head"], hidden, ctx.sub("lm_head"))
    new_cache = {"k": ck_all, "v": cv_all}
    if quantized_cache:
        new_cache["k_scale"], new_cache["v_scale"] = ks_all, vs_all
    return logits, new_cache, new_pending


def flush_pending(cfg: LMConfig, cache: dict, pending: dict) -> dict:
    """Write a deferred kv (`pending`, as produced by lm_decode) into the
    decode cache and return the updated cache. Used where a multi-token
    program takes over from single-token decode (the speculative burst's
    chunk forwards write their own kv immediately, so the pending slot must
    land exactly once, up front). Rows with pos == cache_len are no-ops
    (OOB scatter drops)."""
    b = pending["pos"].shape[0]
    li = jnp.arange(cfg.num_layers)[:, None, None]
    bi = jnp.arange(b)[None, :, None]
    hi = jnp.arange(cfg.num_kv_heads)[None, None, :]
    pos = pending["pos"][None, :, None]
    ck, cv = cache["k"], cache["v"]
    pk, pv = pending["k"], pending["v"]
    out = dict(cache)
    if "k_scale" in cache:
        from vlrlhf_tpu.ops.quant import quantize_kv

        pk, pks = quantize_kv(pk)
        pv, pvs = quantize_kv(pv)
        out["k_scale"] = cache["k_scale"].at[li, bi, hi, pos].set(
            pks, mode="drop"
        )
        out["v_scale"] = cache["v_scale"].at[li, bi, hi, pos].set(
            pvs, mode="drop"
        )
    out["k"] = ck.at[li, bi, hi, pos].set(pk.astype(ck.dtype), mode="drop")
    out["v"] = cv.at[li, bi, hi, pos].set(pv.astype(cv.dtype), mode="drop")
    return out


def lm_prefill_chunk(
    cfg: LMConfig,
    params: PyTree,
    *,
    input_ids: jax.Array,  # (B, C) right-padded chunk (new turn's tokens)
    chunk_lens: jax.Array,  # (B,) real tokens in this chunk
    lengths: jax.Array,  # (B,) tokens already in the cache (chunk offset)
    cache: dict,  # {"k": (L, B, nkv, Sc, hd), ...} — DECODE layout
    ctx: Optional[Ctx] = None,
    pending: Optional[dict] = None,  # deferred kv from a prior decode
    input_embeds: Optional[jax.Array] = None,  # (B, C, D): pre-merged chunk
    # embeddings (continuous batching merges image features into prompt
    # chunks before the LM sees them; input_ids is then ignored)
    return_all_logits: bool = False,  # (B, C, V) instead of the last real
    # position's (B, V) — the speculative-decoding VERIFY step needs the
    # greedy continuation at every draft position (generate/speculative.py)
):
    """Prefill a chunk into a NON-EMPTY cache (multi-turn serving — the
    reference's sglang role has this; round 1's engine assumed an empty
    cache). Chunk kv are written first, then chunk queries attend over the
    whole cache with per-query position masking (dense masked attention:
    chunks are short next to the cache, so the (B, H, C, Sc) scores are
    affordable; a Pallas chunk kernel is a later optimization).

    Returns (last_logits (B, V) — the chunk's last real position's logits,
    the only ones a serving turn samples from — new_cache, new_lengths);
    with return_all_logits, logits are (B, C, V) for every chunk position
    (draft chunks are short, so the buffer is small)."""
    ctx = ctx or Ctx()
    b, c = input_ids.shape
    sc = cache["k"].shape[3]
    nh, nkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim_
    positions = lengths[:, None] + jnp.arange(c)[None, :]  # (B, C)
    x = (
        input_embeds.astype(cfg.dtype)
        if input_embeds is not None
        else embed(params["embed_tokens"], input_ids, cfg.dtype)
    )
    cos, sin = rope_frequencies(cfg.rope, positions, seq_len=sc)
    layer_ctx = ctx.sub("layers_scanned")
    ck_all, cv_all = cache["k"], cache["v"]
    ks_all, vs_all = cache.get("k_scale"), cache.get("v_scale")
    quantized_cache = ks_all is not None
    if quantized_cache:
        from vlrlhf_tpu.ops.quant import quantize_kv

    if pending is not None:
        li = jnp.arange(cfg.num_layers)[:, None, None]
        pbi = jnp.arange(b)[None, :, None]
        phi = jnp.arange(nkv)[None, None, :]
        ppos = pending["pos"][None, :, None]
        pk, pv_ = pending["k"], pending["v"]
        if quantized_cache:
            pk, pks = quantize_kv(pk)
            pv_, pvs = quantize_kv(pv_)
            ks_all = ks_all.at[li, pbi, phi, ppos].set(pks, mode="drop")
            vs_all = vs_all.at[li, pbi, phi, ppos].set(pvs, mode="drop")
        ck_all = ck_all.at[li, pbi, phi, ppos].set(pk, mode="drop")
        cv_all = cv_all.at[li, pbi, phi, ppos].set(pv_, mode="drop")

    chunk_valid = jnp.arange(c)[None, :] < chunk_lens[:, None]  # (B, C)
    bi = jnp.arange(b)[:, None, None]
    hi = jnp.arange(nkv)[None, :, None]
    # pad-row writes park at slot Sc (OOB -> dropped)
    write_pos = jnp.where(chunk_valid, positions, sc)  # (B, C)
    # Pallas chunk attention (ops/chunk_attention.py) streams cache blocks
    # once — no (B, nh, C, Sc) f32 scores, no per-layer dequantized cache
    # copy, stacked-cache block indexing (an XLA slice materializes). Pad
    # queries produce garbage no one reads (their kv never landed).
    use_kernel = (ctx.attn_impl != "xla")

    for i in range(cfg.num_layers):
        lp = jax.tree.map(lambda a: a[i], params["layers_scanned"])
        la = None
        if layer_ctx.adapters is not None:
            la = jax.tree.map(lambda a: a[i], layer_ctx.adapters)
        # base PLoRA never applies here: decode/continuation tokens are
        # text positions (im_mask=0 in the reference's forward)
        lctx = dataclasses.replace(layer_ctx, adapters=la, base_adapters=None)
        actx = lctx.sub("attn")
        h = rms_norm(x, lp["input_layernorm"]["weight"], cfg.rms_eps)
        q, k, v = _qkv_proj(lp["attn"], actx, h, nh, nkv, hd)
        q, k = apply_rope(q, k, cos, sin)
        # write chunk kv: (B, nkv, C) slots
        kt = jnp.transpose(k, (0, 2, 1, 3))  # (B, nkv, C, hd)
        vt = jnp.transpose(v, (0, 2, 1, 3))
        if quantized_cache:
            kq, ks = quantize_kv(kt)
            vq, vs = quantize_kv(vt)
            ck_all = ck_all.at[i, bi, hi, write_pos[:, None, :]].set(
                kq, mode="drop"
            )
            cv_all = cv_all.at[i, bi, hi, write_pos[:, None, :]].set(
                vq, mode="drop"
            )
            ks_all = ks_all.at[i, bi, hi, write_pos[:, None, :]].set(
                ks, mode="drop"
            )
            vs_all = vs_all.at[i, bi, hi, write_pos[:, None, :]].set(
                vs, mode="drop"
            )
        else:
            ck_all = ck_all.at[i, bi, hi, write_pos[:, None, :]].set(
                kt.astype(ck_all.dtype), mode="drop"
            )
            cv_all = cv_all.at[i, bi, hi, write_pos[:, None, :]].set(
                vt.astype(cv_all.dtype), mode="drop"
            )
        from vlrlhf_tpu.ops.chunk_attention import chunk_attention

        out = chunk_attention(
            q, ck_all, cv_all, lengths, layer=i,
            k_scale=ks_all, v_scale=vs_all,
            force_xla=not use_kernel,
        )
        out = linear(lp["attn"]["wo"], out.reshape(b, c, nh * hd), actx.sub("wo"))
        x = x + out
        h = rms_norm(x, lp["post_attention_layernorm"]["weight"], cfg.rms_eps)
        x = x + _mlp_block(lp["mlp"], lctx.sub("mlp"), h)

    hidden = rms_norm(x, params["norm"]["weight"], cfg.rms_eps)
    if not return_all_logits:
        # Only the chunk's LAST real position seeds the next sampled token —
        # gather it before the head ((B, 1, H) @ (H, V) instead of a
        # (B, C, V) buffer + C x the head FLOPs).
        hidden = jnp.take_along_axis(
            hidden, (chunk_lens - 1)[:, None, None], axis=1
        )
    if cfg.tie_embeddings:
        logits = hidden @ params["embed_tokens"]["embedding"].astype(
            hidden.dtype
        ).T
    else:
        logits = linear(params["lm_head"], hidden, ctx.sub("lm_head"))
    new_cache = {"k": ck_all, "v": cv_all}
    if quantized_cache:
        new_cache["k_scale"], new_cache["v_scale"] = ks_all, vs_all
    out_logits = logits if return_all_logits else logits[:, 0]
    return out_logits, new_cache, lengths + chunk_lens


def remat_policy_for(cfg: LMConfig):
    """Checkpoint policy for the per-layer body (None == 'full')."""
    if cfg.remat_policy == "dots":
        return jax.checkpoint_policies.dots_with_no_batch_dims_saveable
    if cfg.remat_policy == "attn":
        return jax.checkpoint_policies.save_only_these_names("attn_out")
    if cfg.remat_policy == "mlp":
        return jax.checkpoint_policies.save_only_these_names(
            "attn_out", "ffn_gate", "ffn_up"
        )
    if cfg.remat_policy == "mlp1":
        # half of 'mlp': one (B*S*ff) intermediate per layer — fits one
        # step up in batch when 'mlp' is a few hundred MB over HBM
        return jax.checkpoint_policies.save_only_these_names(
            "attn_out", "ffn_gate"
        )
    if cfg.remat_policy == "acts":
        # save every named per-layer activation: backward recomputes only
        # norms/rope/elementwise (flash-attn bwd re-derives scores inside
        # its own kernel from the saved q/k/v) — ~(2B*S*ff + ~4B*S*H)
        # bytes/layer; the fastest policy that fits 7B QLoRA on 16 GiB
        return jax.checkpoint_policies.save_only_these_names(
            "attn_out", "ffn_gate", "ffn_up",
            "attn_q", "attn_k", "attn_v", "attn_pre_wo",
        )
    return None


def lm_forward(
    cfg: LMConfig,
    params: PyTree,
    *,
    input_ids: Optional[jax.Array] = None,  # (B, S)
    inputs_embeds: Optional[jax.Array] = None,  # (B, S, H) — multimodal path
    positions: Optional[jax.Array] = None,  # (B, S)
    pad_mask: Optional[jax.Array] = None,  # (B, S)
    segment_ids: Optional[jax.Array] = None,
    ctx: Optional[Ctx] = None,
    cache: Optional[dict] = None,  # {"k": (L,B,nkv,Sc,hd), ...} head-major
    # DECODE layout — prefill writes it directly (no post-hoc transpose)
    kv_mask: Optional[jax.Array] = None,  # (B, Sc)
    cache_len: Optional[int] = None,  # prefill-from-EMPTY: each layer builds
    # its cache inside the scan body as pad(transpose(chunk k/v)) — no
    # zeros slab, no scatter — so only the STACKED output cache is ever
    # live. Passing a concrete zeros cache as scan xs keeps input AND
    # output alive (2x cache HBM at peak; the difference between fitting
    # and OOM for judge co-residency at 7B). Requires the engine's
    # right-padded contract: positions[b, i] == i (KV slot == position).
    kv_cache_dtype=None,  # jnp.int8 -> quantized KV (with per-vector scales)
    return_logits: bool = True,
    return_hidden: bool = False,
):
    """Returns (logits or hidden, new_cache)."""
    ctx = ctx or Ctx()
    if inputs_embeds is None:
        inputs_embeds = embed(params["embed_tokens"], input_ids, cfg.dtype)
    b, s, _ = inputs_embeds.shape
    if positions is None:
        positions = jnp.broadcast_to(jnp.arange(s)[None], (b, s))
    if cache_len is not None:
        assert cache is None, "cache_len is the empty-prefill mode"
        seq_len = cache_len
    else:
        seq_len = cache["k"].shape[3] if cache is not None else s  # Sc
    cos, sin = rope_frequencies(cfg.rope, positions, seq_len=seq_len)

    layer_ctx = ctx.sub("layers_scanned")

    quant_kv = kv_cache_dtype is not None and kv_cache_dtype == jnp.int8

    def body(carry, xs):
        x = carry
        lp, la, lba, li, ck, cv, cks, cvs = xs
        rng = layer_ctx.dropout_rng
        if rng is not None:
            # Distinct dropout stream per layer: the scanned body sees one Ctx,
            # so without this every layer would draw identical LoRA-dropout
            # masks.
            rng = jax.random.fold_in(rng, li)
        lctx = dataclasses.replace(
            layer_ctx, adapters=la, base_adapters=lba, dropout_rng=rng
        )
        h = rms_norm(x, lp["input_layernorm"]["weight"], cfg.rms_eps)
        attn_out, new_kv = _attention_block(
            cfg,
            lp["attn"],
            lctx.sub("attn"),
            h,
            cos,
            sin,
            pad_mask,
            segment_ids,
            positions,
            (ck, cv, cks, cvs) if ck is not None else None,
            kv_mask,
            empty_cache_len=cache_len,
            quantize_cache=quant_kv,
        )
        attn_out = checkpoint_name(attn_out, "attn_out")
        x = x + attn_out
        h = rms_norm(x, lp["post_attention_layernorm"]["weight"], cfg.rms_eps)
        x = x + _mlp_block(lp["mlp"], lctx.sub("mlp"), h)
        if new_kv is None:
            return x, (None, None, None, None)
        return x, new_kv

    if cfg.remat and cache is None and cache_len is None:
        body = jax.checkpoint(
            body, prevent_cse=False, policy=remat_policy_for(cfg)
        )

    if cfg.pipeline_stages > 1 and cache is None and cache_len is None:
        # GPipe pipeline over the mesh's `pipe` axis (training forward only;
        # decode paths run the plain scan — a pipe>1 mesh is a training
        # topology). See models/lm/pipeline.py.
        from vlrlhf_tpu.models.lm.pipeline import pipeline_decoder

        hidden = pipeline_decoder(
            cfg, params["layers_scanned"], layer_ctx, inputs_embeds,
            cos, sin, pad_mask, segment_ids, positions,
        )
        new_k = new_v = new_ks = new_vs = None
    else:
        xs = (
            params["layers_scanned"],
            layer_ctx.adapters,
            layer_ctx.base_adapters,
            jnp.arange(cfg.num_layers),
            cache["k"] if cache is not None else None,
            cache["v"] if cache is not None else None,
            cache.get("k_scale") if cache is not None else None,
            cache.get("v_scale") if cache is not None else None,
        )
        hidden, (new_k, new_v, new_ks, new_vs) = jax.lax.scan(
            body, inputs_embeds, xs
        )
    hidden = rms_norm(hidden, params["norm"]["weight"], cfg.rms_eps)

    new_cache = None
    if cache is not None or cache_len is not None:
        new_cache = {"k": new_k, "v": new_v}
        if new_ks is not None:
            new_cache["k_scale"], new_cache["v_scale"] = new_ks, new_vs

    if not return_logits:
        return hidden, new_cache
    if cfg.tie_embeddings:
        logits = hidden @ params["embed_tokens"]["embedding"].astype(
            hidden.dtype
        ).T
    else:
        logits = linear(params["lm_head"], hidden, ctx.sub("lm_head"))
    if return_hidden:
        return (logits, hidden), new_cache
    return logits, new_cache
