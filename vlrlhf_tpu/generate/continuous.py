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
    rng: jax.Array,
    adapters: Optional[PyTree],
    lora_scale: float,
):
    """Adaptive decode burst: up to `max_burst` tokens for every active slot
    in one dispatch. Returns (cache, pending, state, rng,
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
        i, _cache, _pending, _lengths, _last, done, _out, _rng = carry
        go = (i < max_burst) & ~jnp.all(done)
        if exit_free:
            freed = jnp.sum((done & active0).astype(jnp.int32))
            go &= freed < exit_free
        return go

    def body(carry):
        i, cache, pending, lengths, last_token, done, out, rng = carry
        cache, pending, lengths, last_token, done, out, rng = _decode_body(
            model_cfg, gen_cfg, params, ctx, eos,
            cache, pending, lengths, last_token, done, out, i, rng,
        )
        done = done | (active0 & ((lengths - lengths0) >= remaining))
        return (i + 1, cache, pending, lengths, last_token, done, out, rng)

    carry = (jnp.int32(0), cache, pending, lengths0, last0, ~active0,
             out, rng)
    carry = jax.lax.while_loop(cond, body, carry)
    _, cache, pending, lengths, last_token, done, out, rng = carry
    state = jnp.stack([
        lengths,
        last_token,
        (active0 & ~done).astype(jnp.int32),
        remaining - (lengths - lengths0),
    ])
    packed = jnp.concatenate(
        [last0[:, None], out, lengths[:, None]], axis=1
    )
    return cache, pending, state, rng, packed


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
    return out, pend, state, rng


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
    ):
        self.model_cfg = model_cfg
        self.gen_cfg = gen_cfg
        self.emit_stop_token = emit_stop_token
        self.n_slots = n_slots
        self.cache_len = cache_len
        self.prefill_chunk = max(prefill_chunk, 1)
        self.decode_burst = max(decode_burst or gen_cfg.max_new_tokens, 1)
        self.max_prefill_group = max(max_prefill_group, 1)
        self.exit_free = max(exit_free, 1)
        self.adapters = adapters
        self._stacked = None
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

    def _adapters_arg(self, idxs):
        """Per-dispatch adapters argument: the stacked sets + a one-hot
        (B, N) mix row per request/slot (rides the jitted call as numpy)."""
        if self._stacked is None:
            return self.adapters
        idxs = np.asarray(idxs, np.int64)
        mix = np.zeros((len(idxs), self.n_adapter_sets), np.float32)
        mix[np.arange(len(idxs)), idxs] = 1.0
        return dict(self._stacked, __mix__=mix)

    def _admit_fn(self, scratch_len: int):
        key = ("admit", scratch_len)
        if key not in self._compiled:
            self._compiled[key] = jax.jit(
                functools.partial(
                    _admit_impl, self.model_cfg, self.gen_cfg,
                    scratch_len, self.cache_len,
                ),
                donate_argnums=(1, 2, 3),  # big cache, pending, state
            )
        return self._compiled[key]

    def _burst_fn(self, exit_free: int):
        key = ("burst", exit_free)
        if key not in self._compiled:
            self._compiled[key] = jax.jit(
                functools.partial(
                    _cb_burst_impl, self.model_cfg, self.gen_cfg,
                    self.decode_burst, exit_free,
                ),
                donate_argnums=(1, 2, 3),
            )
        return self._compiled[key]

    # ---------------- admission ----------------

    def _admit_group(self, params, cache, pending, state, group, requests,
                     rng):
        """One batched prefill for all (slot, req) pairs admitted this
        round with the same prompt bucket; group size padded to a power of
        two (repeats of the last row; duplicate slot writes carry identical
        bytes). All inputs ride the jitted dispatch as numpy — NO eager
        uploads, NO download. Returns (cache, pending, state, rng)."""
        slots = [s for s, _ in group]
        reqs = [requests[ridx] for _, ridx in group]
        lb = max(
            -(-len(r.input_ids) // self.prefill_chunk) * self.prefill_chunk
            for r in reqs
        )
        bp = 1
        while bp < len(group):
            bp *= 2
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
        return self._admit_fn(lb)(
            params, cache, pending, state, slot_vec, budgets,
            rows, pad, plens, pv, ipos, gather, qi, qm,
            rng, self._adapters_arg(aidx), self.lora_scale,
        )

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
        return cache, pending, state

    def warmup(self, params, example: Request) -> None:
        """Compile every program the scheduler can hit — admit at all
        power-of-two group sizes and burst at all exit thresholds — so a
        measured/served run never stalls on a mid-flight XLA compile
        (minutes at 7B)."""
        cache, pending, state = self._fresh_buffers()
        sizes, s = {1}, 1
        while s < self.max_prefill_group:
            s *= 2
            sizes.add(min(s, self.max_prefill_group))
        rng = jax.device_put(jax.random.PRNGKey(0))
        b = self.n_slots
        for bp in sorted(sizes):
            group = [(i % b, 0) for i in range(bp)]
            cache, pending, state, rng = self._admit_group(
                params, cache, pending, state, group, [example], rng
            )
        for ef in sorted({0, 1, self.exit_free}):
            cache, pending, state, rng, packed = self._burst_fn(ef)(
                params, cache, pending, state, rng,
                self._adapters_arg([0] * self.n_slots), self.lora_scale,
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

        cache, pending, state = self._fresh_buffers()

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
            newly: set[int] = set()
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
                    cache, pending, state, rng = self._admit_group(
                        params, cache, pending, state, group, inflight, rng
                    )
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
            cache, pending, state, rng, packed = self._burst_fn(exit_free)(
                params, cache, pending, state, rng,
                self._adapters_arg(slot_aidx), self.lora_scale,
            )
            packed = np.asarray(packed)  # the round's ONE device download
            echo, toks = packed[:, 0], packed[:, 1:-1]
            new_lengths = packed[:, -1]
            for i in range(b):
                if phase[i] != DECODE:
                    continue
                # a newly admitted slot's first token arrives as the echo
                # (the admit dispatch downloads nothing)
                if i in newly and not record(i, int(echo[i])):
                    continue
                # tokens sampled this burst == device length advance (the
                # final one is eos when the device stopped early); counting
                # by pad sentinel would misfire when pad is a real vocab id
                n_adv = int(new_lengths[i]) - int(lengths[i])
                for t in toks[i, :n_adv]:
                    if not record(i, int(t)):
                        break
                if phase[i] == DECODE:
                    lengths[i] = int(new_lengths[i])
            it += 1
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
