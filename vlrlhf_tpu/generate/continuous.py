"""Continuous-batching (slot-refill) serving engine.

The reference's eval fast path is an sglang tensor-parallel server
(/root/reference/src/vlrlhf/eval/utils.py:123-173) whose core throughput win
is continuous batching: when a sequence finishes, its slot is refilled with
the next pending prompt while other sequences keep decoding — a static batch
instead idles every finished slot until the batch's straggler completes.

TPU-first design (round 3, v3). Two compiled program families:

  - ADMIT (per prompt-bucket x group-size): ONE dispatch fusing the full
    multimodal prefill (vision tower + merge + LM,
    generate/engine._generate_impl) of the slots admitted this round into a
    prompt-bucket-sized scratch cache WITH the scatter into the big
    (L, B, nkv, Sc, hd) head-major cache at the freed slots (donated), the
    parking of their stale deferred writes, AND the scheduler-state rows of
    the admitted slots. Exactly the prompts' FLOPs — a first cut that
    piggybacked prompt chunks on full-batch decode steps paid B x the prompt
    FLOPs in padding and measured 4x SLOWER than static batching.
  - DECODE BURST: up to `decode_burst` tokens for every active slot in ONE
    dispatch (lax.while_loop over the Pallas decode step, donated buffers).
    ADAPTIVE: per-row budgets live on device, so finishes are device-visible
    — with queued work the loop exits once `exit_free` slots retire (refill
    latency ~1 token); with an empty queue it runs long, amortizing the
    fixed cost of a dispatch.

Control-plane traffic is the scheduler's tax, and over the axon tunnel every
eager transfer costs milliseconds — so ALL scheduler state
(lengths / last_token / active / remaining budget) is DEVICE-RESIDENT,
updated in place by both program families (donated), as is the sampling rng
(threaded admit -> admit -> burst; the host never splits it). The host's
only per-round device traffic is the jitted call argument upload (numpy
prompt rows ride the dispatch, never eager jnp.asarray) and ONE packed
(B, burst+2) download per burst: [first-token echo | tokens | final length].
The v2 design re-uploaded host-composed state and downloaded the admit's
first tokens separately — two extra tunnel syncs per refill round.
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from vlrlhf_tpu.generate.engine import (
    GenerateConfig,
    _decode_body,
    _empty_pending,
    _generate_impl,
)
from vlrlhf_tpu.models.common import Ctx, serving_ctx

PyTree = Any

FREE, DECODE = 0, 2


@dataclasses.dataclass
class Request:
    """One serving request (prompt ids already image-expanded, as emitted by
    VLProcessor.expand_image_tokens / GenerationCollator rows)."""

    input_ids: np.ndarray  # (L,)
    pixel_values: Optional[np.ndarray] = None  # (H, W, 3), one image
    image_positions: Optional[np.ndarray] = None  # (N_img_tok,)
    qformer_input_ids: Optional[np.ndarray] = None
    anyres_gather: Optional[np.ndarray] = None
    max_new_tokens: Optional[int] = None  # per-request cap (else gen_cfg's)
    adapter_idx: int = 0  # multi-adapter serving: which registered LoRA set
    # decodes this request (ContinuousEngine adapter_sets; S-LoRA role)


# Scheduler state rows (device-resident (4, B) int32).
_LEN, _TOK, _ACT, _REM = 0, 1, 2, 3


def _cb_burst_impl(
    model_cfg,
    gen_cfg: GenerateConfig,
    max_burst: int,
    exit_free: int,  # compile-time burst-exit threshold: stop once this
    # many active slots have retired (0 = never, queue empty -> run long).
    # Exiting on EVERY finish paid one host turnaround per request (tunnel
    # latency); waiting for a small group of finishes cuts the dispatch
    # count AND lets refills share a batched prefill, while an idle slot
    # costs only ~1 extra decode step per few idle tokens (bandwidth-bound
    # steps are ~flat in the active-row count)
    params: PyTree,
    cache: dict,
    pending: dict,
    state: jax.Array,  # (4, B) int32 device-resident scheduler state
    hist: Optional[jax.Array],  # (B, Sc) int32 token history — present on
    # speculative engines (the adaptive gate runs PLAIN bursts between spec
    # bursts; the draft history must keep tracking emitted tokens or the
    # next spec burst drafts from a stale suffix). None on plain engines.
    rng: jax.Array,
    adapters: Optional[PyTree],
    lora_scale: float,
):
    """Adaptive decode burst: up to `max_burst` tokens for every active slot
    in one dispatch. Returns (cache, pending, state, hist, rng,
    packed (B, max_burst+2): [first-token echo | tokens | final length])."""
    ctx = serving_ctx(adapters, lora_scale)
    eos = jnp.asarray(gen_cfg.eos_token_ids or (-1,), jnp.int32)
    lengths0, last0 = state[_LEN], state[_TOK]
    active0 = state[_ACT].astype(bool)
    remaining = state[_REM]
    b = lengths0.shape[0]
    sc = cache["k"].shape[3]
    out = jnp.full((b, max_burst), gen_cfg.pad_token_id, jnp.int32)
    # park stale deferred writes of inactive slots (freed rows must not leak
    # a late kv write into a subsequently admitted prompt's range)
    pending = dict(pending, pos=jnp.where(active0, pending["pos"], sc))

    def cond(carry):
        i, _cache, _pending, _lengths, _last, done, _out, _hist, _rng = carry
        go = (i < max_burst) & ~jnp.all(done)
        if exit_free:
            freed = jnp.sum((done & active0).astype(jnp.int32))
            go &= freed < exit_free
        return go

    def body(carry):
        i, cache, pending, lengths, last_token, done, out, hist, rng = carry
        lengths_in = lengths
        cache, pending, lengths, last_token, done, out, rng = _decode_body(
            model_cfg, gen_cfg, params, ctx, eos,
            cache, pending, lengths, last_token, done, out, i, rng,
        )
        if hist is not None:
            # hist invariant (see _cb_spec_burst_impl): valid length is
            # lengths + 1, so this iteration's token lands at lengths_in + 1
            adv = lengths > lengths_in
            hpos = jnp.where(adv, lengths_in + 1, sc)
            hist = hist.at[jnp.arange(b), hpos].set(
                last_token, mode="drop"
            )
        done = done | (active0 & ((lengths - lengths0) >= remaining))
        return (i + 1, cache, pending, lengths, last_token, done, out,
                hist, rng)

    carry = (jnp.int32(0), cache, pending, lengths0, last0, ~active0,
             out, hist, rng)
    carry = jax.lax.while_loop(cond, body, carry)
    _, cache, pending, lengths, last_token, done, out, hist, rng = carry
    state = jnp.stack([
        lengths,
        last_token,
        (active0 & ~done).astype(jnp.int32),
        remaining - (lengths - lengths0),
    ])
    packed = jnp.concatenate(
        [last0[:, None], out, lengths[:, None]], axis=1
    )
    return cache, pending, state, hist, rng, packed


def _device_draft(
    hist: jax.Array,  # (B, S) int32 token history (prompt + emitted)
    hlen: jax.Array,  # (B,) valid history length
    k: int,
    pad_id: int,
) -> jax.Array:
    """Vectorized prompt-lookup drafting ON DEVICE — the exact semantics of
    generate/speculative.prompt_lookup_draft (latest earlier occurrence of
    the trailing bigram; continuation pad-filled; repeat-last fallback), as
    O(B*S) integer compares + one gather. The host version rebuilt drafts
    from a host-side token mirror per chunk; inside the CB burst's
    while_loop the history never leaves the chip."""
    b, s = hist.shape
    idx = jnp.arange(s - 1)
    t1 = jnp.take_along_axis(hist, jnp.maximum(hlen - 2, 0)[:, None], axis=1)
    t2 = jnp.take_along_axis(hist, jnp.maximum(hlen - 1, 0)[:, None], axis=1)
    m = (hist[:, :-1] == t1) & (hist[:, 1:] == t2)
    # exclude the query bigram itself and anything beyond the history
    m &= idx[None, :] <= (hlen - 3)[:, None]
    best = jnp.max(jnp.where(m, idx[None, :], -1), axis=1)  # (B,) latest hit
    found = best >= 0
    gidx = best[:, None] + 2 + jnp.arange(k)[None, :]  # (B, k) continuation
    cont = jnp.take_along_axis(hist, jnp.clip(gidx, 0, s - 1), axis=1)
    cont = jnp.where(gidx < hlen[:, None], cont, pad_id)
    last = jnp.take_along_axis(hist, jnp.maximum(hlen - 1, 0)[:, None], axis=1)
    return jnp.where(found[:, None], cont, jnp.broadcast_to(last, (b, k)))


def _cb_spec_burst_impl(
    model_cfg,
    gen_cfg: GenerateConfig,
    max_burst: int,
    exit_free: int,
    k_draft: int,
    params: PyTree,
    cache: dict,
    pending: dict,
    state: jax.Array,  # (4, B) int32
    hist: jax.Array,  # (B, Sc) int32 device-resident token history
    rng: jax.Array,
    adapters: Optional[PyTree],
    lora_scale: float,
):
    """Speculative decode burst: the while_loop body verifies a K-token
    prompt-lookup draft per slot in ONE lm_prefill_chunk forward through the
    live cache (return_all_logits) and emits the accepted prefix plus the
    model's own continuation — up to K+1 tokens per iteration for one
    weight-stream pass (the chunk's extra query rows ride the same weight
    reads, so a verify costs about one decode step; measured 17.6 ms at K=3
    vs 18.5 ms plain at 7B int8 B=8). Greedy output is bit-identical to the
    plain burst (tests pin it); sampled mode is the same lossless point-mass
    rejection sampling as generate/speculative.py, vectorized per chunk
    position. Same packed-download contract as _cb_burst_impl, so the host
    scheduler is shared.

    History/length invariant: hist holds prompt + every emitted token;
    hist_len == cache length + 1 (the newest emitted token's kv is written
    by the NEXT chunk, which starts with it). The reference has no
    speculation at all (sglang-0.1 serving, eval/utils.py:123-173)."""
    from vlrlhf_tpu.models.lm.llama import flush_pending, lm_prefill_chunk
    from vlrlhf_tpu.ops.sampling import warp_logits

    ctx = serving_ctx(adapters, lora_scale)
    lm_ctx = ctx.sub("lm")
    eos = jnp.asarray(gen_cfg.eos_token_ids or (-1,), jnp.int32)
    pad_id = gen_cfg.pad_token_id
    c = k_draft + 1
    lengths0, last0 = state[_LEN], state[_TOK]
    active0 = state[_ACT].astype(bool)
    remaining = state[_REM]
    b = lengths0.shape[0]
    sc = cache["k"].shape[3]
    out = jnp.full((b, max_burst), pad_id, jnp.int32)
    # park stale deferred writes of inactive slots, then land the rest ONCE:
    # chunk forwards write their own kv immediately, so nothing stays
    # deferred inside the loop (pending is returned empty)
    pending = dict(pending, pos=jnp.where(active0, pending["pos"], sc))
    cache = flush_pending(model_cfg.lm, cache, pending)
    pending_out = dict(pending, pos=jnp.full((b,), sc, jnp.int32))
    jj = jnp.arange(c)[None, :]
    rows = jnp.arange(b)[:, None]

    def cond(carry):
        i, _cache, _hist, lengths, _last, done, _out, _rng = carry
        delta = lengths - lengths0
        # rows with fewer than C slots left in `out` sit this burst out
        # (the next burst resumes them) — emitting a partial chunk would
        # desync the emitted count from the kv the chunk wrote
        can = (~done) & (delta + c <= max_burst)
        go = (i < max_burst) & jnp.any(can)
        if exit_free:
            freed = jnp.sum((done & active0).astype(jnp.int32))
            go &= freed < exit_free
        return go

    def body(carry):
        i, cache, hist, lengths, last_token, done, out, rng = carry
        delta = lengths - lengths0
        hlen = lengths + 1  # history includes the not-yet-written last token
        drafts = _device_draft(hist, hlen, k_draft, pad_id)
        chunk = jnp.concatenate([last_token[:, None], drafts], axis=1)
        active_now = (~done) & (delta + c <= max_burst)
        clens = jnp.where(active_now, c, 0)  # clen 0 parks all kv writes
        logits, cache, _ = lm_prefill_chunk(
            model_cfg.lm, params["lm"],
            input_ids=chunk, chunk_lens=clens, lengths=lengths,
            cache=cache, ctx=lm_ctx, return_all_logits=True,
        )  # (B, C, V)
        rng, krng = jax.random.split(rng)
        if not gen_cfg.do_sample:
            tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # (B, C)
            match = tok[:, :-1] == chunk[:, 1:]
        else:
            warped = warp_logits(
                logits.astype(jnp.float32), gen_cfg.temperature,
                gen_cfg.top_k, gen_cfg.top_p,
            )
            p = jax.nn.softmax(warped, axis=-1)
            d_next = chunk[:, 1:]  # draft proposed for position j's output
            p_draft = jnp.take_along_axis(
                p[:, :-1], d_next[..., None].astype(jnp.int32), axis=-1
            )[..., 0]  # (B, C-1)
            r_u, r_res, r_full = jax.random.split(krng, 3)
            match = jax.random.uniform(r_u, p_draft.shape) < p_draft
            # residual at j: p minus the draft token, renormalized — a
            # categorical over the draft-masked warped logits
            v = warped.shape[-1]
            excl = jnp.where(
                jnp.arange(v)[None, None, :] == d_next[..., None],
                -jnp.inf, warped[:, :-1],
            )
            res = jax.random.categorical(r_res, excl, axis=-1)
            full = jax.random.categorical(r_full, warped, axis=-1)
            n_acc = jnp.sum(
                jnp.cumprod(match.astype(jnp.int32), axis=1), axis=1
            )  # (B,) accepted draft count
            res_pad = jnp.concatenate([res, res[:, -1:]], axis=1)
            d_pad = jnp.concatenate([d_next, d_next[:, -1:]], axis=1)
            # position j emits: accepted draft (j < a), the residual
            # resample at the rejection point, or the bonus full sample
            # when every draft survived (j == a == C-1)
            tok = jnp.where(
                jj < n_acc[:, None], d_pad,
                jnp.where(jj == c - 1, full, res_pad),
            ).astype(jnp.int32)
            # re-derive match against the emitted tokens so the shared
            # accept-prefix logic below sees the same semantics as greedy
            match = (jj[:, : c - 1] < n_acc[:, None])
        acc_prefix = jnp.cumprod(match.astype(jnp.int32), axis=1)
        allowed = jnp.concatenate(
            [jnp.ones((b, 1), jnp.int32), acc_prefix], axis=1
        ).astype(bool)  # (B, C): drafts 0..j-1 all accepted
        rem_now = remaining - delta
        allowed &= jj < rem_now[:, None]
        allowed &= active_now[:, None]
        is_eos = jnp.any(tok[..., None] == eos[None, None, :], axis=-1)
        eos_before = jnp.cumsum(is_eos.astype(jnp.int32), axis=1) - is_eos
        emit = allowed & (eos_before == 0)
        n_emit = jnp.sum(emit.astype(jnp.int32), axis=1)  # == kv advance
        cols = jnp.where(emit, delta[:, None] + jj, max_burst)
        out = out.at[rows, cols].set(tok, mode="drop")
        hpos = jnp.where(emit, hlen[:, None] + jj, sc)
        hist = hist.at[rows, hpos].set(tok, mode="drop")
        new_last = jnp.take_along_axis(
            tok, jnp.maximum(n_emit - 1, 0)[:, None], axis=1
        )[:, 0]
        last_token = jnp.where(n_emit > 0, new_last, last_token)
        lengths = lengths + n_emit
        done = done | jnp.any(emit & is_eos, axis=1)
        done = done | ((lengths - lengths0) >= remaining)
        return (i + 1, cache, hist, lengths, last_token, done, out, rng)

    carry = (jnp.int32(0), cache, hist, lengths0, last0, ~active0, out, rng)
    carry = jax.lax.while_loop(cond, body, carry)
    _, cache, hist, lengths, last_token, done, out, rng = carry
    state = jnp.stack([
        lengths,
        last_token,
        (active0 & ~done).astype(jnp.int32),
        remaining - (lengths - lengths0),
    ])
    packed = jnp.concatenate(
        [last0[:, None], out, lengths[:, None]], axis=1
    )
    return cache, pending_out, state, hist, rng, packed


def _admit_impl(
    model_cfg,
    gen_cfg: GenerateConfig,
    scratch_len: int,  # prompt bucket — the scratch cache is sized to it,
    # NOT the full cache_len (a full-length scratch at group size n_slots
    # doubles the multi-GB cache and OOMs)
    cache_len: int,
    params: PyTree,
    big_cache: dict,
    big_pending: dict,
    state: jax.Array,  # (4, B) int32, donated
    hist: Optional[jax.Array],  # (B, Sc) int32 token history (speculative
    # engines only; None otherwise) — prompt ids + the first sampled token
    # land here so the burst's device-side prompt lookup sees them
    slots: jax.Array,  # (Bp,) int32 target slots (may repeat: see below)
    budgets: jax.Array,  # (Bp,) int32 per-request max_new_tokens
    input_ids, pad_mask, prompt_lens, pv, ipos, gather, qi, qm,
    rng, adapters, lora_scale,
):
    """Fused admission: full multimodal prefill of the admitted group +
    scatter into the big cache's `slots` first scratch_len positions
    (donated: in-place rows) + parking of those slots' stale deferred
    writes + the admitted slots' scheduler-state rows — ONE dispatch per
    admission round, NO download (the first sampled token reaches the host
    as the next burst's echo column). Duplicate slots are allowed ONLY with
    identical row content (group padding replicates the last request, so
    racing writes carry the same bytes). Stale kv beyond scratch_len is
    never attended (slot <= position masking) and is overwritten as decode
    proceeds."""
    rng, krng = jax.random.split(rng)
    small, _, first_token, done0, _ = _generate_impl(
        model_cfg, gen_cfg, scratch_len, params, input_ids, pad_mask,
        prompt_lens, pv, ipos, gather, qi, qm, krng, adapters, lora_scale,
    )
    out = {
        k: big_cache[k].at[:, slots, :, 0:scratch_len].set(small[k])
        for k in big_cache
    }
    pend = dict(
        big_pending, pos=big_pending["pos"].at[slots].set(cache_len)
    )
    rem = budgets - 1  # the prefill itself emitted the first token
    active = (~done0) & (rem > 0)
    state = state.at[_LEN, slots].set(prompt_lens)
    state = state.at[_TOK, slots].set(first_token)
    state = state.at[_ACT, slots].set(active.astype(jnp.int32))
    state = state.at[_REM, slots].set(rem)
    if hist is not None:
        # prompt ids + first token seed the burst's device-side prompt
        # lookup; pad columns beyond prompt_len are masked by hlen there
        lb = input_ids.shape[1]
        hist = hist.at[slots[:, None], jnp.arange(lb)[None, :]].set(input_ids)
        hist = hist.at[slots, prompt_lens].set(first_token)
    return out, pend, state, hist, rng


class ContinuousEngine:
    """Slot-refill serving over a fixed B-slot cache."""

    def __init__(
        self,
        model_cfg,
        gen_cfg: GenerateConfig,
        n_slots: int = 8,
        cache_len: int = 1024,
        prefill_chunk: int = 128,  # prompt-length bucket multiple
        decode_burst: int = 0,  # 0 = gen_cfg.max_new_tokens (the
        # while_loop exits early on finishes anyway; a long bound makes the
        # queue-empty tail ONE dispatch)
        max_prefill_group: int = 2,  # scratch-cache memory cap: at 7B on a
        # 16 GiB chip with a bf16 cache there is room for ~2 slot-rows of
        # prefill scratch (born head-major inside the prefill scan — no
        # relayout transient); an int8 KV cache affords 4-8
        exit_free: int = 2,  # burst-exit threshold: wait for this many
        # finishes before paying a host turnaround (see _cb_burst_impl)
        adapters: Optional[PyTree] = None,
        adapter_sets=None,  # list of adapter pytrees for MULTI-adapter
        # serving: one base model, N LoRA sets, per-request selection via
        # Request.adapter_idx. Stacked once (lora.stack_adapter_sets); each
        # dispatch carries a per-row one-hot mix so every set's delta is
        # computed once per step, mixed by a (B, N) matmul. Mutually
        # exclusive with `adapters`.
        lora_scale: float = 1.0,
        emit_stop_token: bool = False,  # include the eos token in the
        # returned response (the static engine writes it to `out`; PPO
        # rollouts need it so the reward lands on the eos position exactly
        # as TRL's, while eval decode strips it and keeps the default)
        speculative_k: int = 0,  # >0: decode bursts verify K-token
        # device-side prompt-lookup drafts per slot (_cb_spec_burst_impl) —
        # up to K+1 tokens per weight-stream pass; greedy stays
        # bit-identical, sampling stays lossless. 0 = plain one-token steps.
        speculative_adaptive: bool = True,  # host-side acceptance gate
        # (active only when speculative_k > 0): the scheduler tracks an EMA
        # of wall-seconds per emitted token for the speculative and plain
        # burst programs and dispatches whichever is cheaper, re-probing
        # the idle mode every _probe_every bursts. Workloads whose drafts
        # rarely hit (the verify chunk then costs more than a one-token
        # step for 1 emitted token) degrade to ~plain throughput instead
        # of paying the measured ~1.4x all-miss verify tax; echo-heavy
        # workloads stay in spec mode. Plain bursts keep the draft history
        # current (hist threads through both programs), so switching back
        # is seamless.
        # NOTE r5: "mixed admission" (prompts prefilling chunk-by-chunk
        # WHILE active slots decode, one packed dispatch) was built in r4
        # and REMOVED in r5 after losing its own benchmark 5.7x on chip
        # (1685 ms/admit vs classic's 294, r4_sweep_results.log). The loss
        # is architectural: the Pallas chunk-attention kernel's VMEM
        # budget caps the prompt chunk at 64 tokens (int8 KV), so a
        # 640-token admit pays ~10 full weight streams where the classic
        # batched prefill is MXU-bound and streams weights ~once. Classic
        # admission already beats the 1.3x CB bar (1.328x, exact-size
        # admit groups); the engine stays lean (VERDICT r4 next-item 5).
    ):
        self.model_cfg = model_cfg
        self.gen_cfg = gen_cfg
        self.emit_stop_token = emit_stop_token
        self.speculative_k = max(0, speculative_k)
        self.speculative_adaptive = bool(speculative_adaptive) and (
            self.speculative_k > 0
        )
        self._probe_every = 16  # adaptive gate: re-probe the idle burst
        # mode once per this many bursts (tests shrink it)
        self.n_slots = n_slots
        self.cache_len = cache_len
        self.prefill_chunk = max(prefill_chunk, 1)
        self.decode_burst = max(decode_burst or gen_cfg.max_new_tokens, 1)
        if self.speculative_k:
            # a spec burst emits whole K+1 chunks only: a burst shorter than
            # one chunk could never advance any slot (host would spin)
            self.decode_burst = max(
                self.decode_burst, self.speculative_k + 1
            )
        self.max_prefill_group = max(max_prefill_group, 1)
        self.exit_free = max(exit_free, 1)
        self.adapters = adapters
        self._stacked = None
        self._fused_adapters: dict = {}  # keyed by id(layout source tree)
        self.n_adapter_sets = 0
        if adapter_sets:
            assert adapters is None, (
                "pass either adapters (single set) or adapter_sets (multi)"
            )
            from vlrlhf_tpu.lora.lora import stack_adapter_sets

            self._stacked = stack_adapter_sets(list(adapter_sets))
            self.n_adapter_sets = len(adapter_sets)
        self.lora_scale = lora_scale
        self._compiled: dict = {}

    def _adapters_arg(self, idxs, params=None):
        """Per-dispatch adapters argument: the stacked sets + a one-hot
        (B, N) mix row per request/slot (rides the jitted call as numpy).

        When `params` carry the FUSED serving layout (fuse_lm_params:
        wqkv/gateup), the adapter tree is transformed once to the matching
        fused layout (lora.fuse_adapter_sets) — the r5 N-sweep measured
        the per-target path op-count-bound at decode (2.1x tax for one
        r=64 set), and fusion cuts the per-layer adapter matmuls 14 -> 8."""
        tree = self._stacked if self._stacked is not None else self.adapters
        if tree is None:
            return None
        if (
            params is not None
            and isinstance(params.get("lm"), dict)
            and "wqkv" in params["lm"].get("layers_scanned", {}).get(
                "attn", {}
            )
        ):
            key = id(tree)
            if key not in self._fused_adapters:
                from vlrlhf_tpu.lora.lora import fuse_adapter_sets

                n = max(self.n_adapter_sets, 1)
                self._fused_adapters[key] = jax.jit(
                    lambda t: fuse_adapter_sets(t, n)
                )(tree)
            tree = self._fused_adapters[key]
        if self._stacked is None:
            return tree
        idxs = np.asarray(idxs, np.int64)
        mix = np.zeros((len(idxs), self.n_adapter_sets), np.float32)
        mix[np.arange(len(idxs)), idxs] = 1.0
        return dict(tree, __mix__=mix)

    def _admit_fn(self, scratch_len: int):
        key = ("admit", scratch_len)
        if key not in self._compiled:
            self._compiled[key] = jax.jit(
                functools.partial(
                    _admit_impl, self.model_cfg, self.gen_cfg,
                    scratch_len, self.cache_len,
                ),
                # big cache, pending, state (+ hist when speculative)
                donate_argnums=(1, 2, 3, 4) if self.speculative_k
                else (1, 2, 3),
            )
        return self._compiled[key]

    def _burst_fn(self, exit_free: int, spec: Optional[bool] = None):
        if spec is None:
            spec = bool(self.speculative_k)
        key = ("burst", exit_free, spec)
        if key not in self._compiled:
            if spec:
                self._compiled[key] = jax.jit(
                    functools.partial(
                        _cb_spec_burst_impl, self.model_cfg, self.gen_cfg,
                        self.decode_burst, exit_free, self.speculative_k,
                    ),
                    donate_argnums=(1, 2, 3, 4),  # cache/pending/state/hist
                )
            else:
                # plain burst; threads hist (None on plain engines — an
                # empty-pytree donation is a no-op) so the adaptive gate's
                # plain bursts keep the spec draft history consistent
                self._compiled[key] = jax.jit(
                    functools.partial(
                        _cb_burst_impl, self.model_cfg, self.gen_cfg,
                        self.decode_burst, exit_free,
                    ),
                    donate_argnums=(1, 2, 3, 4),
                )
        return self._compiled[key]

    # ---------------- admission ----------------

    def _admit_group(self, params, cache, pending, state, hist, group,
                     requests, rng):
        """One batched prefill for all (slot, req) pairs admitted this
        round with the same prompt bucket. All inputs ride the jitted
        dispatch as numpy — NO eager uploads. Returns (cache, pending,
        state, hist, rng)."""
        slots = [s for s, _ in group]
        reqs = [requests[ridx] for _, ridx in group]
        lb = max(
            -(-len(r.input_ids) // self.prefill_chunk) * self.prefill_chunk
            for r in reqs
        )
        # EXACT group size — the r3 power-of-two padding replicated the last
        # request into up to bp-1 ghost rows, each paying the full 7B
        # prefill FLOPs (cb_profile r4: admits averaged 2.4 real rows, so
        # dispatches of 3 ran as 4 — ~20% of the admit segment's 39% time
        # share was padding). One compiled program per real size instead
        # (warmup covers 1..max_prefill_group).
        bp = len(group)
        rows = np.zeros((bp, lb), np.int32)
        pad = np.zeros((bp, lb), bool)
        plens = np.zeros((bp,), np.int32)
        budgets = np.zeros((bp,), np.int32)
        for i in range(bp):
            r = reqs[min(i, len(reqs) - 1)]
            ids = np.asarray(r.input_ids, np.int32)
            rows[i, : len(ids)] = ids
            pad[i, : len(ids)] = True
            plens[i] = len(ids)
            budgets[i] = r.max_new_tokens or self.gen_cfg.max_new_tokens
        r0 = reqs[0]
        pv = ipos = gather = qi = qm = None
        if r0.pixel_values is not None:
            if r0.anyres_gather is not None:
                pv = np.stack([
                    np.asarray(reqs[min(i, len(reqs) - 1)].pixel_values)
                    for i in range(bp)
                ])
                gather = np.stack([
                    np.asarray(reqs[min(i, len(reqs) - 1)].anyres_gather,
                               np.int32)
                    for i in range(bp)
                ])
            else:
                pv = np.stack([
                    np.asarray(reqs[min(i, len(reqs) - 1)].pixel_values)[None]
                    for i in range(bp)
                ])
            ipos = np.stack([
                np.asarray(reqs[min(i, len(reqs) - 1)].image_positions,
                           np.int32)
                for i in range(bp)
            ])
            if r0.qformer_input_ids is not None:
                ql = max(len(r.qformer_input_ids) for r in reqs)
                qn = np.zeros((bp, ql), np.int32)
                qmk = np.zeros((bp, ql), bool)
                for i in range(bp):
                    q = np.asarray(
                        reqs[min(i, len(reqs) - 1)].qformer_input_ids,
                        np.int32,
                    )
                    qn[i, : len(q)] = q
                    qmk[i, : len(q)] = True
                qi, qm = qn, qmk
        # padding rows replicate the last request's content, so their
        # duplicate-slot writes carry identical bytes (safe scatter race)
        slot_vec = np.full((bp,), slots[-1], np.int32)
        slot_vec[: len(slots)] = slots
        aidx = [
            getattr(reqs[min(i, len(reqs) - 1)], "adapter_idx", 0)
            for i in range(bp)
        ]
        cache, pending, state, hist, rng = self._admit_fn(lb)(
            params, cache, pending, state, hist, slot_vec, budgets,
            rows, pad, plens, pv, ipos, gather, qi, qm,
            rng, self._adapters_arg(aidx, params), self.lora_scale,
        )
        return cache, pending, state, hist, rng

    def _fresh_buffers(self):
        gen_cfg = self.gen_cfg
        b, sc = self.n_slots, self.cache_len
        lm = self.model_cfg.lm
        kv_dt = jnp.int8 if gen_cfg.kv_cache_dtype == "int8" else lm.dtype
        shape = (lm.num_layers, b, lm.num_kv_heads, sc, lm.head_dim_)
        cache = {"k": jnp.zeros(shape, kv_dt), "v": jnp.zeros(shape, kv_dt)}
        if gen_cfg.kv_cache_dtype == "int8":
            sshape = (lm.num_layers, b, lm.num_kv_heads, sc)
            cache["k_scale"] = jnp.zeros(sshape, jnp.bfloat16)
            cache["v_scale"] = jnp.zeros(sshape, jnp.bfloat16)
        pending = _empty_pending(lm, b, sc)
        state = jnp.zeros((4, b), jnp.int32)
        hist = (
            jnp.zeros((b, sc), jnp.int32) if self.speculative_k else None
        )
        return cache, pending, state, hist

    def _burst(self, params, cache, pending, state, hist, rng, exit_free,
               slot_aidx, spec: Optional[bool] = None):
        """Dispatch one decode burst (plain or speculative — both programs
        share the (cache, pending, state, hist, rng, packed) contract)."""
        adapters = self._adapters_arg(slot_aidx, params)
        return self._burst_fn(exit_free, spec)(
            params, cache, pending, state, hist, rng,
            adapters, self.lora_scale,
        )

    def warmup(self, params, example: Request) -> None:
        """Compile every program the scheduler can hit — admit at all
        power-of-two group sizes and burst at all exit thresholds — so a
        measured/served run never stalls on a mid-flight XLA compile
        (minutes at 7B)."""
        cache, pending, state, hist = self._fresh_buffers()
        sizes = set(range(1, self.max_prefill_group + 1))
        rng = jax.device_put(jax.random.PRNGKey(0))
        b = self.n_slots
        for bp in sorted(sizes):
            group = [(i % b, 0) for i in range(bp)]
            cache, pending, state, hist, rng = self._admit_group(
                params, cache, pending, state, hist, group, [example], rng
            )
        modes = (
            (True, False) if self.speculative_adaptive
            else (None,)
        )
        for spec in modes:
            for ef in sorted({0, 1, self.exit_free}):
                cache, pending, state, hist, rng, packed = self._burst(
                    params, cache, pending, state, hist, rng, ef,
                    [0] * self.n_slots, spec=spec,
                )
        np.asarray(packed)

    # ---------------- the scheduler ----------------

    def run(
        self,
        params: PyTree,
        requests: Sequence[Request],
        rng: Optional[jax.Array] = None,
        progress: bool = False,
    ) -> list[list[int]]:
        """Serve all requests; returns response token ids per request, in
        request order. Admission is FIFO into whichever slots free first."""
        sc = self.cache_len
        for r in requests:
            need = len(r.input_ids) + (
                r.max_new_tokens or self.gen_cfg.max_new_tokens
            )
            if need > sc:
                raise ValueError(
                    f"request needs {need} cache slots, engine has {sc}"
                )
        responses: list = [None] * len(requests)
        self.serve(
            params,
            _ListSource(requests),
            lambda ridx, toks: responses.__setitem__(ridx, toks),
            rng=rng,
            progress=progress,
        )
        return responses

    def serve(
        self,
        params: PyTree,
        source,
        on_finish,
        rng: Optional[jax.Array] = None,
        progress: bool = False,
        on_token=None,  # callable(ridx, tok) per streamed response token
        # (fires burst-granular on the scheduler thread; eos excluded)
    ) -> None:
        """Generic slot-refill scheduler loop — the engine's heart, shared
        by batch mode (run/_ListSource) and the live server
        (generate/server.py QueueSource, which feeds requests as they
        arrive over HTTP and blocks in wait() when idle).

        source protocol:
          take()    -> (ridx, Request) | None   — next request, if any NOW
          pending() -> int                      — queued count (burst-exit
                                                  threshold heuristic)
          done()    -> bool                     — no request will EVER
                                                  arrive again
          wait()    -> None                     — block briefly for work
        on_finish(ridx, tokens) fires as each request completes.
        """
        gen_cfg = self.gen_cfg
        b = self.n_slots
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        rng = jax.device_put(rng)  # carried on device across all dispatches

        cache, pending, state, hist = self._fresh_buffers()

        # host MIRROR of the device scheduler state — updated only from the
        # packed burst downloads; its finish decisions replicate the
        # device's (same eos set, same budgets), so they never drift
        phase = np.full((b,), FREE, np.int32)
        lengths = np.zeros((b,), np.int32)
        stop_at = np.zeros((b,), np.int32)
        req_idx = np.full((b,), -1, np.int32)
        inflight: dict = {}  # ridx -> Request (alive while slot occupied)
        resp: dict = {}  # ridx -> token list being accumulated
        eos = set(gen_cfg.eos_token_ids or ())
        live = 0
        it = 0
        n_done = 0
        # dispatch counters, exposed for perf tools (tools/spec_e2e.py):
        # tokens-emitted / last_bursts is the per-burst yield — under
        # speculation that ratio IS the measured acceptance evidence
        self.last_bursts = 0
        self.last_admits = 0
        # adaptive speculation gate (see __init__): per-mode EMA of
        # wall-seconds per emitted token, measured at the packed download
        # (a sync point both modes pay). Hysteresis: switch only on a >=10%
        # advantage so alternating near-ties don't thrash program switches.
        adaptive = self.speculative_adaptive
        use_spec = True
        ema: dict = {True: None, False: None}
        self.last_spec_bursts = 0
        # Gate cost model: FULL inter-burst interval per emitted token, not
        # device-burst time per token. Two earlier cuts measured
        # dispatch->download and lost to two artifacts: (1) bursts queue
        # behind async admit prefills, so burst-after-admit samples ran ~3x
        # long (the FIRST burst is always speculative — its EMA started
        # poisoned and the gate locked to plain even on echo workloads
        # where raw spec measured 1.25x e2e); (2) the per-burst HOST gap
        # (consume/record/scheduling, ~tens of ms on a 1-CPU host) is paid
        # per burst, and emitting up to K+1 tokens per loop iteration means
        # spec finishes a burst budget in fewer bursts — an e2e win
        # invisible to device-only timing. So: t_mark advances at each
        # burst download, and when adaptive is on, admits are force-
        # completed (one tiny state fetch per admit round) and t_mark reset
        # — every measured interval is then host gap + dispatch + burst,
        # which is exactly the e2e cost the gate should minimize.
        t_mark = None
        # probe cadence: exponential backoff — each probe that CONFIRMS
        # the current mode doubles the interval (cap 8x base), a mode
        # switch resets it. Steady-state probe overhead decays to ~1%
        # while a workload shift is still noticed within ~2 intervals.
        probe_gap = self._probe_every
        next_probe = 1

        def finish(slot: int):
            nonlocal live, n_done
            ridx = int(req_idx[slot])
            phase[slot] = FREE
            req_idx[slot] = -1
            live -= 1
            n_done += 1
            on_finish(ridx, resp.pop(ridx))
            inflight.pop(ridx)

        def record(slot: int, tok: int) -> bool:
            """Append one sampled token; False when the slot retired."""
            ridx = int(req_idx[slot])
            if tok in eos:
                # a FIRST-token eos stays out of the response either way:
                # the static engine masks it to an empty response
                # (engine.py out0), and PPO reward positions must agree
                # between the static and CB rollout paths
                if self.emit_stop_token and resp[ridx]:
                    resp[ridx].append(tok)
                finish(slot)
                return False
            resp[ridx].append(tok)
            if on_token is not None:
                on_token(ridx, tok)
            if len(resp[ridx]) >= stop_at[slot]:
                finish(slot)
                return False
            return True

        newly: set[int] = set()

        def consume(packed) -> None:
            """Drain one packed burst download into the host mirror. A slot
            in `newly` consumes its first token from the echo column exactly
            once (the admit dispatch itself downloads nothing)."""
            packed = np.asarray(packed)
            echo, toks = packed[:, 0], packed[:, 1:-1]
            new_lengths = packed[:, -1]
            for i in range(b):
                if phase[i] != DECODE:
                    continue
                if i in newly:
                    # a newly admitted slot's first token arrives as the
                    # echo (the admit dispatch itself downloads nothing)
                    newly.discard(i)
                    if not record(i, int(echo[i])):
                        continue
                # tokens sampled == device length advance (the final one is
                # eos when the device stopped early); counting by pad
                # sentinel would misfire when pad is a real vocab id
                n_adv = int(new_lengths[i]) - int(lengths[i])
                for t in toks[i, :n_adv]:
                    if not record(i, int(t)):
                        break
                if phase[i] == DECODE:
                    lengths[i] = int(new_lengths[i])

        while True:
            # admit every free slot this round; same-bucket prompts share
            # one batched prefill dispatch
            admits: list[tuple[int, int]] = []
            for slot in range(b):
                if phase[slot] != FREE:
                    continue
                item = source.take()
                if item is None:
                    break
                ridx, r = item
                need = len(r.input_ids) + (
                    r.max_new_tokens or gen_cfg.max_new_tokens
                )
                if need > self.cache_len:
                    raise ValueError(
                        f"request needs {need} cache slots, engine has "
                        f"{self.cache_len}"
                    )
                inflight[ridx] = r
                resp[ridx] = []
                admits.append((slot, ridx))
            if admits:
                by_bucket: dict[tuple, list] = {}
                for slot, ridx in admits:
                    r = inflight[ridx]
                    lb = -(-len(r.input_ids)
                           // self.prefill_chunk) * self.prefill_chunk
                    # modality signature: a text-only row must never share a
                    # prefill group with an image row (the group's pixel /
                    # qformer / anyres layout follows its first request)
                    key = (
                        lb,
                        r.pixel_values is not None,
                        r.qformer_input_ids is not None,
                        None if r.anyres_gather is None else (
                            np.asarray(r.pixel_values).shape[0],
                            len(r.anyres_gather),
                        ),
                    )
                    by_bucket.setdefault(key, []).append((slot, ridx))
                groups = []
                g = self.max_prefill_group
                for glist in by_bucket.values():
                    groups.extend(
                        glist[i : i + g] for i in range(0, len(glist), g)
                    )
                for group in groups:
                    cache, pending, state, hist, rng = (
                        self._admit_group(
                            params, cache, pending, state, hist, group,
                            inflight, rng,
                        )
                    )
                    self.last_admits += 1
                    for slot, ridx in group:
                        req_idx[slot] = ridx
                        r = inflight[ridx]
                        stop_at[slot] = (
                            r.max_new_tokens or gen_cfg.max_new_tokens
                        )
                        lengths[slot] = len(r.input_ids)
                        phase[slot] = DECODE
                        live += 1
                        newly.add(slot)
                if adaptive:
                    # force the admit wave to completion (tiny fetch — the
                    # one adaptive-only sync) and restart the interval
                    # clock: admit execution must not be attributed to the
                    # next burst's mode (see the gate cost-model comment)
                    np.asarray(state)
                    t_mark = time.perf_counter()
            if live == 0:
                if source.done():
                    return
                source.wait()
                continue
            exit_free = min(self.exit_free, source.pending(), live)
            slot_aidx = [
                getattr(inflight[int(req_idx[i])], "adapter_idx", 0)
                if req_idx[i] >= 0 else 0
                for i in range(b)
            ]
            mode = None
            if adaptive:
                mode = use_spec
                if it == next_probe:
                    # refresh the idle mode's EMA; the first probe on the
                    # SECOND burst bootstraps the other mode's estimate, so
                    # low-acceptance workloads escape spec mode almost
                    # immediately (and echo workloads re-enter it)
                    mode = not use_spec
            cache, pending, state, hist, rng, packed = self._burst(
                params, cache, pending, state, hist, rng, exit_free,
                slot_aidx, spec=mode,
            )
            packed = np.asarray(packed)  # ONE download per burst (sync)
            if adaptive:
                # snapshot BEFORE consume mutates phase/lengths
                dec = phase == DECODE
                emitted = int((packed[dec, -1] - lengths[dec]).sum())
            consume(packed)
            if adaptive:
                # the interval endpoint sits AFTER consume: the host-side
                # drain cost scales with this burst's token count and must
                # be attributed to the burst that produced the tokens.
                # (Measured r5: with the endpoint before consume, the rare
                # plain probe burst in spec steady-state inherited the
                # PREVIOUS spec burst's larger drain, inflating plain's
                # per-token cost — the gate held spec on a sampled t=0.2
                # workload at acceptance 0.73 and lost 14% e2e.)
                now = time.perf_counter()
                if t_mark is not None and emitted > 0:
                    c = (now - t_mark) / emitted
                    ema[mode] = (
                        c if ema[mode] is None
                        else 0.7 * ema[mode] + 0.3 * c
                    )
                was = use_spec
                if ema[True] is not None and ema[False] is not None:
                    # ASYMMETRIC hysteresis (measured r5: the symmetric 0.9
                    # gate held spec on a sampled t=0.2 caption workload at
                    # acceptance 0.73/chunk and lost 14% e2e — the active
                    # mode's EMA refreshes every burst while the idle mode's
                    # goes stale across the probe backoff, so spec needs a
                    # clear margin to hold). Plain is the safe mode: any
                    # measured plain advantage exits spec; entering spec
                    # requires a >=10% advantage.
                    if use_spec and ema[False] < ema[True]:
                        use_spec = False
                    elif not use_spec and ema[True] < 0.9 * ema[False]:
                        use_spec = True
                if mode != was:  # this burst was a probe
                    probe_gap = (
                        self._probe_every if use_spec != was
                        else min(2 * probe_gap, 8 * self._probe_every)
                    )
                    next_probe = it + probe_gap
                t_mark = now
                self.last_spec_bursts += int(mode)
            it += 1
            self.last_bursts = it
            if progress and it % 16 == 0:
                print(f"  cb burst={it} done={n_done} live={live}")


class _ListSource:
    """Batch-mode request source: a fixed list, drained FIFO."""

    def __init__(self, requests: Sequence[Request]):
        self._q = list(enumerate(requests))
        self._i = 0

    def take(self):
        if self._i >= len(self._q):
            return None
        item = self._q[self._i]
        self._i += 1
        return item

    def pending(self) -> int:
        return len(self._q) - self._i

    def done(self) -> bool:
        return self._i >= len(self._q)

    def wait(self) -> None:  # pragma: no cover — batch mode never idles
        pass
