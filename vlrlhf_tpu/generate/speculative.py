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

Greedy only (do_sample=False): sampled acceptance needs rejection-sampling
corrections — out of scope until a workload needs it.

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
        assert not gen_cfg.do_sample, (
            "speculative decoding is greedy-only (sampled acceptance needs "
            "rejection-sampling corrections)"
        )
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

            def fn(params, cache, chunk_ids, chunk_lens, lengths,
                   adapters, lora_scale):
                from vlrlhf_tpu.models.lm.llama import lm_prefill_chunk

                ctx = Ctx(adapters=adapters, lora_scale=lora_scale)
                logits, cache, _ = lm_prefill_chunk(
                    cfg.lm, params["lm"],
                    input_ids=chunk_ids, chunk_lens=chunk_lens,
                    lengths=lengths, cache=cache, ctx=ctx.sub("lm"),
                    return_all_logits=True,
                )
                greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                return greedy, cache

            # donate the cache: verify rewrites it in place every step
            self._verify = jax.jit(fn, donate_argnums=(1,))
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
            greedy, cache = verify(
                params, cache, jnp.asarray(chunk), jnp.asarray(clens),
                jnp.asarray(lengths), self.adapters, self.lora_scale,
            )
            self.verify_calls += 1
            g = np.asarray(greedy)
            for i in range(b):
                ci = int(clens[i])
                if ci == 0:
                    continue
                # accepted draft prefix: draft j (chunk[i, j+1]) is accepted
                # iff the model's continuation after chunk[..j] equals it
                a = 0
                while a < ci - 1 and g[i, a] == chunk[i, a + 1]:
                    a += 1
                advanced = 0
                for j in range(a + 1):  # emit g[i, 0..a]
                    tok = int(g[i, j])
                    advanced += 1  # chunk token j's kv is now valid context
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
