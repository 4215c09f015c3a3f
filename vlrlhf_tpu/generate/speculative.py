"""Exact-greedy speculative decoding: prompt-lookup drafts + chunk verify.

Serving capability beyond the reference's stack (its sglang-0.1-era server
has no speculation; /root/reference/src/vlrlhf/eval/utils.py:123-173). The
output is PROVABLY identical to plain greedy decoding — speculation only
changes how many forward passes produce it:

  draft   — guess the next K tokens by PROMPT LOOKUP (find the most recent
            occurrence of the current bigram in prompt + generated text and
            propose what followed it — zero model cost, host-side numpy).
            VQA/caption answers echo question spans constantly, so lookup
            hits are common exactly where this engine serves.
  verify  — ONE chunked forward over [last_token, draft...] through the
            live KV cache (lm_prefill_chunk return_all_logits=True): the
            greedy argmax at position i is the model's true continuation
            after chunk[0..i]. The longest prefix of drafts matching those
            continuations is accepted, plus the model's own next token —
            a hit emits up to K+1 tokens for one dispatch, a total miss
            still emits 1 (never slower in tokens/dispatch).

Per-row cache-position invariant: a verify chunk writes kv at positions
[length, length+C); rejected positions hold stale kv, but every position is
rewritten by the next chunk before any query attends it (chunks are
contiguous from the accepted length, and attention masks slot <= position).

Sampled mode (do_sample=True) is LOSSLESS speculative sampling (Leviathan
et al. 2023) specialized to point-mass drafts: the prompt-lookup draft d is
a deterministic proposal, so the acceptance probability min(1, p(d)/q(d))
reduces to p(d) under the warped target distribution p (same
temperature/top-k/top-p warping as the plain engine, shared via
ops/sampling.warp_logits), and the rejection residual norm(max(p - q, 0))
is p with d excluded, renormalized — i.e. on reject we sample from p minus
the draft token. Each emitted token is marginally distributed EXACTLY as a
plain sampled decode step (the point-mass algebra: P(emit x) =
p(d)·[x=d] + (1-p(d))·p(x)/(1-p(d))·[x≠d] = p(x)); only the rng stream
differs, so outputs are distribution-identical, not bit-identical
(tests/test_speculative.py pins top_k=1 == greedy exactly and checks the
marginal distribution statistically).

int8 KV caches work, with one numeric caveat: the plain decode path keeps
the CURRENT token's kv exact (the kernel's bf16 self term) while a verify
chunk reads its own freshly-quantized kv — tokens can differ from the
plain engine's within int8 cache quantization noise (bf16 caches are
bit-identical, which the tests pin). Host-driven loop: one
dispatch verifies up to K+1 tokens, so dispatch-count drops by the mean
acceptance factor — the right trade over a high-latency control plane (the
axon tunnel pays ~0.55 ms/dispatch) and on local hosts alike.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vlrlhf_tpu.models.common import Ctx
from vlrlhf_tpu.generate.engine import GenerateConfig, Generator

PyTree = Any


def prompt_lookup_draft(
    src: list[int], k: int, pad_token_id: int
) -> list[int]:
    """Propose k tokens: find the latest earlier occurrence of the current
    bigram in src and return the tokens that followed it. Misses cost
    nothing (verify rejects); pad-fill when there is no history."""
    n = len(src)
    if n >= 2:
        t1, t2 = src[-2], src[-1]
        # scan backwards, excluding the bigram at the very end itself
        for i in range(n - 3, -1, -1):
            if src[i] == t1 and src[i + 1] == t2:
                cont = src[i + 2 : i + 2 + k]
                if cont:
                    return cont + [pad_token_id] * (k - len(cont))
                break
    if n:
        return [src[-1]] * k  # repeat-last fallback (cheap runs of tokens)
    return [pad_token_id] * k


class SpeculativeGenerator:
    """Drop-in for Generator's __call__ (greedy mode): same batch dict in,
    same (B, max_new_tokens) ids out, bit-identical tokens."""

    def __init__(
        self,
        model_cfg,
        gen_cfg: GenerateConfig,
        adapters: Optional[PyTree] = None,
        lora_scale: float = 1.0,
        k_draft: int = 7,
    ):
        self.model_cfg = model_cfg
        self.gen_cfg = gen_cfg
        self.k = max(1, k_draft)
        # prefill-only engine: max_new_tokens=1 returns right after the
        # prompt forward with the live cache state
        self._prefill = Generator(
            model_cfg,
            dataclasses.replace(gen_cfg, max_new_tokens=1),
            adapters,
            lora_scale,
        )
        self.adapters = adapters
        self.lora_scale = lora_scale
        self._verify = None
        self.verify_calls = 0  # dispatch count (tests + tok/dispatch stats)

    def _verify_fn(self):
        if self._verify is None:
            cfg = self.model_cfg
            gcfg = self.gen_cfg

            def _chunk_logits(params, cache, chunk_ids, chunk_lens, lengths,
                              adapters, lora_scale):
                from vlrlhf_tpu.models.lm.llama import lm_prefill_chunk

                ctx = Ctx(adapters=adapters, lora_scale=lora_scale)
                return lm_prefill_chunk(
                    cfg.lm, params["lm"],
                    input_ids=chunk_ids, chunk_lens=chunk_lens,
                    lengths=lengths, cache=cache, ctx=ctx.sub("lm"),
                    return_all_logits=True,
                )

            if not gcfg.do_sample:

                def fn(params, cache, chunk_ids, chunk_lens, lengths,
                       adapters, lora_scale):
                    logits, cache, _ = _chunk_logits(
                        params, cache, chunk_ids, chunk_lens, lengths,
                        adapters, lora_scale,
                    )
                    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                    return greedy, cache

            else:

                def fn(params, cache, chunk_ids, chunk_lens, lengths, rng,
                       adapters, lora_scale):
                    from vlrlhf_tpu.ops.sampling import warp_logits

                    logits, cache, _ = _chunk_logits(
                        params, cache, chunk_ids, chunk_lens, lengths,
                        adapters, lora_scale,
                    )  # (B, C, V)
                    warped = warp_logits(
                        logits.astype(jnp.float32), gcfg.temperature,
                        gcfg.top_k, gcfg.top_p,
                    )
                    p = jax.nn.softmax(warped, axis=-1)
                    # position j's distribution is compared against the NEXT
                    # chunk token (the draft at j+1); last column is unused
                    # (the bonus position samples from full p instead).
                    d_next = jnp.concatenate(
                        [chunk_ids[:, 1:], chunk_ids[:, -1:]], axis=1
                    )  # (B, C)
                    p_draft = jnp.take_along_axis(
                        p, d_next[..., None].astype(jnp.int32), axis=-1
                    )[..., 0]  # (B, C)
                    r_u, r_res, r_full = jax.random.split(rng, 3)
                    accept = (
                        jax.random.uniform(r_u, p_draft.shape) < p_draft
                    )
                    v = warped.shape[-1]
                    excl = jnp.where(
                        jnp.arange(v)[None, None, :] == d_next[..., None],
                        -jnp.inf, warped,
                    )
                    resample = jax.random.categorical(
                        r_res, excl, axis=-1
                    ).astype(jnp.int32)
                    full = jax.random.categorical(
                        r_full, warped, axis=-1
                    ).astype(jnp.int32)
                    return accept, resample, full, cache

            # donate the cache: verify rewrites it in place every step
            donate = (1,)
            self._verify = jax.jit(fn, donate_argnums=donate)
        return self._verify

    def __call__(
        self,
        params: PyTree,
        batch: dict,
        rng=None,  # accepted for interface parity; greedy ignores it
        cache_len: Optional[int] = None,
    ) -> np.ndarray:
        gcfg = self.gen_cfg
        n_new, k = gcfg.max_new_tokens, self.k
        ids = np.asarray(batch["input_ids"])
        b, l = ids.shape
        plens = np.asarray(batch["prompt_lens"])
        if cache_len is None:
            # verify chunks write up to k slots past the final token
            cache_len = -(-(l + n_new + k + 1) // 128) * 128
        cache, lengths_dev, first_token, done0, _ = self._prefill._fn(
            cache_len
        )(
            params,
            jnp.asarray(ids),
            jnp.asarray(batch["pad_mask"]),
            jnp.asarray(plens),
            None if batch.get("pixel_values") is None
            else jnp.asarray(batch["pixel_values"]),
            None if batch.get("image_positions") is None
            else jnp.asarray(batch["image_positions"]),
            None if batch.get("anyres_gather") is None
            else jnp.asarray(batch["anyres_gather"]),
            None if batch.get("qformer_input_ids") is None
            else jnp.asarray(batch["qformer_input_ids"]),
            None if batch.get("qformer_mask") is None
            else jnp.asarray(batch["qformer_mask"]),
            rng if rng is not None else jax.random.PRNGKey(0),
            self.adapters,
            self.lora_scale,
        )
        eos = set(int(t) for t in (gcfg.eos_token_ids or ()))
        first = np.asarray(first_token)
        done = np.asarray(done0).copy()
        lengths = np.asarray(lengths_dev).copy()  # == prompt_lens

        src = [list(map(int, ids[i, : plens[i]])) for i in range(b)]
        emitted: list[list[int]] = [[] for _ in range(b)]
        last = np.full((b,), gcfg.pad_token_id, np.int32)
        for i in range(b):
            if not done[i]:
                emitted[i].append(int(first[i]))
                src[i].append(int(first[i]))
                last[i] = first[i]
        done |= np.array([len(e) >= n_new for e in emitted])

        verify = self._verify_fn()
        c = k + 1
        # verify rng stream: the prefill consumed a split of `rng` for the
        # first token; fold before re-splitting so verify keys never collide
        # with the prefill's.
        vrng = jax.random.fold_in(
            rng if rng is not None else jax.random.PRNGKey(0), 0x5bec
        )
        while not done.all():
            chunk = np.full((b, c), gcfg.pad_token_id, np.int32)
            clens = np.zeros((b,), np.int32)
            for i in range(b):
                if done[i]:
                    continue
                remaining = n_new - len(emitted[i])
                ci = 1 + min(k, remaining - 1)
                draft = prompt_lookup_draft(src[i], ci - 1, gcfg.pad_token_id)
                chunk[i, 0] = last[i]
                chunk[i, 1:ci] = draft[: ci - 1]
                clens[i] = ci
            if gcfg.do_sample:
                vrng, sub = jax.random.split(vrng)
                acc, res, full, cache = verify(
                    params, cache, jnp.asarray(chunk), jnp.asarray(clens),
                    jnp.asarray(lengths), sub, self.adapters,
                    self.lora_scale,
                )
                acc, res, full = (
                    np.asarray(acc), np.asarray(res), np.asarray(full)
                )
            else:
                greedy, cache = verify(
                    params, cache, jnp.asarray(chunk), jnp.asarray(clens),
                    jnp.asarray(lengths), self.adapters, self.lora_scale,
                )
                g = np.asarray(greedy)
            self.verify_calls += 1
            for i in range(b):
                ci = int(clens[i])
                if ci == 0:
                    continue
                if gcfg.do_sample:
                    # accepted draft prefix: draft j+1 survives its p(d)
                    # coin flip; the token emitted at the stop position is
                    # the residual resample (reject) or the bonus sample
                    # (all drafts accepted).
                    a = 0
                    while a < ci - 1 and acc[i, a]:
                        a += 1
                    toks = [int(chunk[i, j + 1]) for j in range(a)]
                    toks.append(
                        int(full[i, a]) if a == ci - 1 else int(res[i, a])
                    )
                else:
                    # draft j (chunk[i, j+1]) is accepted iff the model's
                    # continuation after chunk[..j] equals it
                    a = 0
                    while a < ci - 1 and g[i, a] == chunk[i, a + 1]:
                        a += 1
                    toks = [int(g[i, j]) for j in range(a + 1)]
                advanced = 0
                for tok in toks:
                    advanced += 1  # this chunk position's kv is now valid
                    if tok in eos:
                        # the engine writes the eos token to `out` (it only
                        # masks a FIRST-token eos) — match exactly
                        emitted[i].append(tok)
                        done[i] = True
                        break
                    emitted[i].append(tok)
                    src[i].append(tok)
                    last[i] = tok
                    if len(emitted[i]) >= n_new:
                        done[i] = True
                        break
                lengths[i] += advanced
            done |= np.array([len(e) >= n_new for e in emitted])

        out = np.full((b, n_new), gcfg.pad_token_id, np.int32)
        for i in range(b):
            out[i, : len(emitted[i])] = emitted[i]
        return out
