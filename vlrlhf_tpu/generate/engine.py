"""Bucketed prefill + decode generation engine.

Replaces HF `model.generate` under accelerate and the sglang TP server in the
reference's eval fast path (/root/reference/src/vlrlhf/eval/utils.py:51-173)
and TRL PPO's rollout generation (base/trainer.py:437-443).

TPU-first design:
  - ONE jitted program per (prompt-bucket, max_new_tokens) pair: prefill over
    the right-padded prompt chunk writes the KV cache; a `lax.while_loop`
    decodes with early exit when every row has hit a stop token.
  - Right padding everywhere: KV slot index == absolute position, so per-row
    cache writes are a gather-free dynamic update (models/lm/llama.py cache
    path); no left-pad position arithmetic.
  - Multimodal prefill reuses the same static-shape image merge as training.
  - Sharding: params follow their training shardings; batch rows shard over
    (data, fsdp) — generation is data-parallel; TP via the `model` axis on
    the same jitted fn.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp

from vlrlhf_tpu.models.common import Ctx, serving_ctx, embed
from vlrlhf_tpu.models.lm.llama import lm_decode, lm_forward
from vlrlhf_tpu.models.vlm import VLMConfig, vlm_forward
from vlrlhf_tpu.ops.sampling import sample_tokens

PyTree = Any


@dataclasses.dataclass(frozen=True)
class GenerateConfig:
    max_new_tokens: int = 128
    do_sample: bool = False
    temperature: float = 1.0
    top_k: Optional[int] = None
    top_p: Optional[float] = None
    eos_token_ids: tuple[int, ...] = ()
    pad_token_id: int = 0
    # 'device': lax.while_loop decode (one dispatch; best over high-latency
    # control planes like the axon tunnel). 'host': python loop over a
    # donated step (in-place buffers + early exit; best on local TPU-VMs
    # where dispatch is ~1ms and can pipeline).
    decode_mode: str = "device"
    # 'bf16' | 'int8': int8 halves KV-cache HBM (capacity AND decode DMA
    # bytes) with per-vector scales folded into the decode-attention kernel
    # (ops/quant.py:quantize_kv, ops/decode_attention.py). The current
    # token's self term stays bf16-exact.
    kv_cache_dtype: str = "bf16"


def _generate_impl(
    model_cfg: VLMConfig,
    gen_cfg: GenerateConfig,
    cache_len: int,
    params: PyTree,
    input_ids: jax.Array,  # (B, L) right-padded prompts
    pad_mask: jax.Array,  # (B, L)
    prompt_lens: jax.Array,  # (B,)
    pixel_values: Optional[jax.Array],
    image_positions: Optional[jax.Array],
    anyres_gather: Optional[jax.Array],
    qformer_ids: Optional[jax.Array],
    qformer_mask: Optional[jax.Array],
    rng: jax.Array,
    adapters: Optional[PyTree],
    lora_scale: float,
):
    b, l = input_ids.shape
    ctx = serving_ctx(adapters, lora_scale)
    int8_cache = gen_cfg.kv_cache_dtype == "int8"
    # EMPTY-PREFILL mode: no input cache at all — each scan layer builds its
    # head-major (B, nkv, Sc, hd) cache as pad(transpose(chunk k/v)), int8-
    # quantized before the pad when configured, and the scan stacks the
    # outputs into the ONE live (L, B, nkv, Sc, hd) decode cache. The old
    # shape (preallocated zeros in, stacked ys out, then a transpose to
    # head-major) kept up to 3 cache-sized buffers alive at peak. Relies on
    # the right-padded contract: KV slot == position (positions = arange).
    positions = jnp.broadcast_to(jnp.arange(l)[None], (b, l))

    # Prefill needs only the LAST prompt position's logits: gather the
    # hidden state first, then apply the head to (B, 1, H). The dense
    # (B, S, V) head costs S x the FLOPs (1.3 TFLOP at B=8 S=608 for 32k
    # vocab) and a ~1.2 GiB buffer that OOMed judge co-residency.
    hidden, cache = vlm_forward(
        model_cfg,
        params,
        input_ids=input_ids,
        pixel_values=pixel_values,
        image_positions=image_positions,
        anyres_gather=anyres_gather,
        qformer_ids=qformer_ids,
        qformer_mask=qformer_mask,
        pad_mask=pad_mask,
        positions=positions,
        ctx=ctx,
        cache_len=cache_len,
        kv_cache_dtype=jnp.int8 if int8_cache else None,
        return_logits=False,
    )
    from vlrlhf_tpu.models.vlm import lm_head_fn

    last_h = jnp.take_along_axis(
        hidden, (prompt_lens - 1)[:, None, None], axis=1
    )  # (B, 1, H)
    last_logits = lm_head_fn(model_cfg, params, ctx)(last_h)[:, 0]
    rng, krng = jax.random.split(rng)
    first_token = sample_tokens(
        last_logits,
        krng,
        temperature=gen_cfg.temperature,
        top_k=gen_cfg.top_k,
        top_p=gen_cfg.top_p,
        do_sample=gen_cfg.do_sample,
    )
    eos = jnp.asarray(gen_cfg.eos_token_ids or (-1,), jnp.int32)
    done0 = jnp.any(first_token[:, None] == eos[None, :], axis=1)

    out0 = jnp.full((b, gen_cfg.max_new_tokens), gen_cfg.pad_token_id, jnp.int32)
    out0 = out0.at[:, 0].set(jnp.where(done0, gen_cfg.pad_token_id, first_token))
    # cache is already head-major (L, B, nkv, Sc, hd): the decode-attention
    # kernel reads contiguous (Sc, hd) stripes with no relayout.
    return cache, prompt_lens, first_token, done0, out0


def _empty_pending(lm, b: int, cache_len: int) -> dict:
    """No-op pending write: pos == cache_len is out of bounds -> dropped."""
    shape = (lm.num_layers, b, lm.num_kv_heads, lm.head_dim_)
    return {
        "k": jnp.zeros(shape, lm.dtype),
        "v": jnp.zeros(shape, lm.dtype),
        "pos": jnp.full((b,), cache_len, jnp.int32),
    }


def _decode_body(
    model_cfg, gen_cfg, params, ctx, eos,
    cache, pending, lengths, last_token, done, out, step, rng,
):
    """Shared single-token decode used by both loop modes."""
    logits, cache, pending = lm_decode(
        model_cfg.lm,
        params["lm"],
        last_token=last_token,
        lengths=lengths,
        cache=cache,
        ctx=ctx.sub("lm"),
        pending=pending,
    )
    rng, krng = jax.random.split(rng)
    next_token = sample_tokens(
        logits[:, 0],
        krng,
        temperature=gen_cfg.temperature,
        top_k=gen_cfg.top_k,
        top_p=gen_cfg.top_p,
        do_sample=gen_cfg.do_sample,
    )
    next_token = jnp.where(done, gen_cfg.pad_token_id, next_token)
    out = jax.lax.dynamic_update_slice(
        out, next_token[:, None], (jnp.int32(0), step)
    )
    new_done = done | jnp.any(next_token[:, None] == eos[None, :], axis=1)
    lengths = jnp.where(done, lengths, lengths + 1)
    return cache, pending, lengths, next_token, new_done, out, rng


def _decode_many_impl(
    model_cfg: VLMConfig,
    gen_cfg: GenerateConfig,
    params: PyTree,
    cache: dict,
    lengths: jax.Array,
    last_token: jax.Array,
    done: jax.Array,
    out: jax.Array,
    rng: jax.Array,
    adapters: Optional[PyTree],
    lora_scale: float,
):
    """Device-loop decode: all steps in one dispatch (early exit on device)."""
    ctx = serving_ctx(adapters, lora_scale)
    eos = jnp.asarray(gen_cfg.eos_token_ids or (-1,), jnp.int32)
    n_new = gen_cfg.max_new_tokens

    def cond(carry):
        step = carry[0]
        done = carry[5]
        return (step < n_new) & ~jnp.all(done)

    def body(carry):
        step, cache, pending, lengths, last_token, done, out, rng = carry
        cache, pending, lengths, last_token, done, out, rng = _decode_body(
            model_cfg, gen_cfg, params, ctx, eos,
            cache, pending, lengths, last_token, done, out, step, rng,
        )
        return (step + 1, cache, pending, lengths, last_token, done, out, rng)

    pending = _empty_pending(
        model_cfg.lm, lengths.shape[0], cache["k"].shape[3]
    )
    carry = (jnp.int32(1), cache, pending, lengths, last_token, done, out, rng)
    carry = jax.lax.while_loop(cond, body, carry)
    # (cache, pending, lengths, out)
    return carry[1], carry[2], carry[3], carry[6]


def _decode_step_impl(
    model_cfg: VLMConfig,
    gen_cfg: GenerateConfig,
    params: PyTree,
    cache: dict,
    pending: dict,
    lengths: jax.Array,
    last_token: jax.Array,
    done: jax.Array,
    out: jax.Array,
    step: jax.Array,  # scalar int32
    rng: jax.Array,
    adapters: Optional[PyTree],
    lora_scale: float,
):
    """One decode token for every row. Host-driven (not a device while_loop):
    with cache/out donated, XLA updates every buffer in place — a device loop
    carrying the multi-GB cache paid layout copies every iteration, measured
    ~3x slower per token at batch 64."""
    ctx = serving_ctx(adapters, lora_scale)
    eos = jnp.asarray(gen_cfg.eos_token_ids or (-1,), jnp.int32)
    return _decode_body(
        model_cfg, gen_cfg, params, ctx, eos,
        cache, pending, lengths, last_token, done, out, step, rng,
    )


class Generator:
    """Caches one compiled program per (bucket_len, model) shape."""

    def __init__(
        self,
        model_cfg: VLMConfig,
        gen_cfg: GenerateConfig,
        adapters: Optional[PyTree] = None,
        lora_scale: float = 1.0,
    ):
        self.model_cfg = model_cfg
        self.gen_cfg = gen_cfg
        self.adapters = adapters
        self.lora_scale = lora_scale
        self._compiled: dict[int, Any] = {}

    def _fn(self, cache_len: int):
        if cache_len not in self._compiled:
            self._compiled[cache_len] = jax.jit(
                functools.partial(
                    _generate_impl, self.model_cfg, self.gen_cfg, cache_len
                )
            )
        return self._compiled[cache_len]

    def _decode_fn(self):
        if "decode" not in self._compiled:
            self._compiled["decode"] = jax.jit(
                functools.partial(_decode_step_impl, self.model_cfg, self.gen_cfg),
                donate_argnums=(1, 2, 3, 4, 5, 6, 7, 8),
            )
        return self._compiled["decode"]

    def _decode_many_fn(self):
        if "decode_many" not in self._compiled:
            self._compiled["decode_many"] = jax.jit(
                functools.partial(_decode_many_impl, self.model_cfg, self.gen_cfg),
                donate_argnums=(1, 2, 3, 4, 5),
            )
        return self._compiled["decode_many"]

    def __call__(
        self,
        params: PyTree,
        batch: dict,
        rng: Optional[jax.Array] = None,
        early_exit_check_every: int = 8,
        return_state: bool = False,
        cache_len: Optional[int] = None,
    ) -> jax.Array:
        """batch from GenerationCollator (right-padded). Returns (B, N) ids
        (+ the live session state when return_state — see ChatSession).
        `cache_len` reserves extra slots (multi-turn sessions)."""
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        l = batch["input_ids"].shape[1]
        if cache_len is None:
            # 128-align derived lengths: the decode kernel wants exact
            # 128-multiple S blocks (int8 scale blocks put block_s on
            # lanes). Explicit cache_len (session budgets) stays verbatim.
            cache_len = -(-(l + self.gen_cfg.max_new_tokens) // 128) * 128
        fn = self._fn(cache_len)
        cache, lengths, last_token, done, out = fn(
            params,
            jnp.asarray(batch["input_ids"]),
            jnp.asarray(batch["pad_mask"]),
            jnp.asarray(batch["prompt_lens"]),
            None
            if batch.get("pixel_values") is None
            else jnp.asarray(batch["pixel_values"]),
            None
            if batch.get("image_positions") is None
            else jnp.asarray(batch["image_positions"]),
            None
            if batch.get("anyres_gather") is None
            else jnp.asarray(batch["anyres_gather"]),
            None
            if batch.get("qformer_input_ids") is None
            else jnp.asarray(batch["qformer_input_ids"]),
            None
            if batch.get("qformer_mask") is None
            else jnp.asarray(batch["qformer_mask"]),
            rng,
            self.adapters,
            self.lora_scale,
        )
        # _generate_impl consumed split(rng)[1] for the first token and
        # discarded the advanced key; re-derive it here or the first decode
        # step would re-split the ORIGINAL rng and sample token 1 with the
        # SAME subkey as token 0 (a correlation the speculative marginal
        # test caught: t1 repeated t0's categorical draw far too often).
        rng = jax.random.split(rng)[0]
        def _with_state(cache, pending, lengths, out):
            state = {"cache": cache, "pending": pending, "lengths": lengths}
            return (out, state) if return_state else out

        if self.gen_cfg.max_new_tokens <= 1:
            if return_state:
                pending = _empty_pending(
                    self.model_cfg.lm, lengths.shape[0], cache["k"].shape[3]
                )
                return _with_state(cache, pending, lengths, out)
            return out
        if self.gen_cfg.decode_mode == "device":
            cache, pending, lengths, out = self._decode_many_fn()(
                params, cache, lengths, last_token, done, out, rng,
                self.adapters, self.lora_scale,
            )
            return _with_state(cache, pending, lengths, out)
        decode = self._decode_fn()
        pending = _empty_pending(
            self.model_cfg.lm, lengths.shape[0], cache["k"].shape[3]
        )
        # slot `prompt_lens` holds the first generated token; loop writes 1..
        for step in range(1, self.gen_cfg.max_new_tokens):
            cache, pending, lengths, last_token, done, out, rng = decode(
                params, cache, pending, lengths, last_token, done, out,
                jnp.int32(step), rng, self.adapters, self.lora_scale,
            )
            if (
                early_exit_check_every
                and step % early_exit_check_every == 0
                and bool(jax.device_get(jnp.all(done)))
            ):
                break
        return _with_state(cache, pending, lengths, out)


def generate(
    model_cfg: VLMConfig,
    params: PyTree,
    batch: dict,
    gen_cfg: GenerateConfig,
    rng: Optional[jax.Array] = None,
    adapters: Optional[PyTree] = None,
    lora_scale: float = 1.0,
) -> jax.Array:
    return Generator(model_cfg, gen_cfg, adapters, lora_scale)(params, batch, rng)


def _extend_impl(
    model_cfg: VLMConfig,
    gen_cfg: GenerateConfig,
    params: PyTree,
    cache: dict,
    pending: dict,
    lengths: jax.Array,  # (B,) tokens currently in context
    new_ids: jax.Array,  # (B, C) right-padded next-turn tokens
    chunk_lens: jax.Array,  # (B,)
    rng: jax.Array,
    adapters: Optional[PyTree],
    lora_scale: float,
):
    """Chunk-prefill a new turn into the live cache, sample the first
    response token, decode to completion — all one dispatch."""
    from vlrlhf_tpu.models.lm.llama import lm_prefill_chunk

    ctx = serving_ctx(adapters, lora_scale)
    b = new_ids.shape[0]
    last_logits, cache, lengths = lm_prefill_chunk(
        model_cfg.lm,
        params["lm"],
        input_ids=new_ids,
        chunk_lens=chunk_lens,
        lengths=lengths,
        cache=cache,
        ctx=ctx.sub("lm"),
        pending=pending,
    )
    rng, krng = jax.random.split(rng)
    first_token = sample_tokens(
        last_logits, krng, temperature=gen_cfg.temperature,
        top_k=gen_cfg.top_k, top_p=gen_cfg.top_p, do_sample=gen_cfg.do_sample,
    )
    eos = jnp.asarray(gen_cfg.eos_token_ids or (-1,), jnp.int32)
    done0 = jnp.any(first_token[:, None] == eos[None, :], axis=1)
    out0 = jnp.full((b, gen_cfg.max_new_tokens), gen_cfg.pad_token_id, jnp.int32)
    out0 = out0.at[:, 0].set(jnp.where(done0, gen_cfg.pad_token_id, first_token))
    cache, pending, lengths, out = _decode_many_impl(
        model_cfg, gen_cfg, params, cache, lengths, first_token,
        done0, out0, rng, adapters, lora_scale,
    )
    return cache, pending, lengths, out


class ChatSession:
    """Multi-turn serving over one cache (the reference's sglang-server role
    with session reuse; round 1's engine re-prefilled from scratch per turn).

    Flow: start(prompt_batch) decodes turn 1; extend(new_ids) chunk-prefills
    the next turn's tokens (include the previous response's terminator — its
    kv was never computed, so it must arrive as input) and decodes. Rows are
    right-padded; all shapes bucketed per call."""

    def __init__(self, generator: "Generator", cache_len: Optional[int] = None):
        self.gen = generator
        self.cache_len = cache_len  # total session budget (prompt+all turns)
        self.state: Optional[dict] = None

    def start(self, params: PyTree, batch: dict, rng=None) -> "jax.Array":
        self._params = params
        tokens, state = self.gen(
            params, batch, rng=rng, return_state=True,
            cache_len=self.cache_len,
        )
        self.state = state
        return tokens

    def extend(self, new_ids, chunk_lens, rng=None):
        """new_ids (B, C) np right-padded; returns (B, max_new_tokens)."""
        assert self.state is not None, "call start() first"
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        c = new_ids.shape[1]
        key = ("extend", c)
        if key not in self.gen._compiled:
            self.gen._compiled[key] = jax.jit(
                functools.partial(_extend_impl, self.gen.model_cfg,
                                  self.gen.gen_cfg),
                # donate the session cache/pending: the functional update
                # aliases in place instead of copying the multi-GB KV
                # buffers every turn (self.state is reassigned below, so the
                # donated buffers are never re-read)
                donate_argnums=(1, 2),
            )
        s = self.state
        sc = s["cache"]["k"].shape[3]
        needed = int(jnp.max(s["lengths"])) + c + self.gen.gen_cfg.max_new_tokens
        if needed > sc:
            raise ValueError(
                f"session cache full: need {needed} slots, have {sc} — start "
                "a new session with a larger cache (longer max_new_tokens "
                "headroom) or trim the conversation"
            )
        cache, pending, lengths, out = self.gen._compiled[key](
            self._params, s["cache"], s["pending"], s["lengths"],
            jnp.asarray(new_ids), jnp.asarray(chunk_lens), rng,
            self.gen.adapters, self.gen.lora_scale,
        )
        self.state = {"cache": cache, "pending": pending, "lengths": lengths}
        return out
