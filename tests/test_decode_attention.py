"""Pallas decode-attention kernel vs the XLA oracle (interpret mode on CPU).

Covers GQA, per-row lengths, the deferred-write self-term (current token's
k/v not yet in cache), the stacked-cache layer indexing, and the empty-cache
edge (length 0 => output == v_cur exactly)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vlrlhf_tpu.ops.decode_attention import decode_attention


@pytest.mark.parametrize(
    "b,nh,nkv,hd,s",
    [(4, 8, 8, 64, 256), (3, 8, 2, 128, 304), (2, 4, 4, 128, 512)],
)
def test_kernel_matches_oracle(b, nh, nkv, hd, s):
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    q = jax.random.normal(ks[0], (b, nh, hd), jnp.float32)
    k = jax.random.normal(ks[1], (b, nkv, s, hd), jnp.float32)
    v = jax.random.normal(ks[2], (b, nkv, s, hd), jnp.float32)
    kc = jax.random.normal(ks[3], (b, nkv, hd), jnp.float32)
    vc = jax.random.normal(ks[4], (b, nkv, hd), jnp.float32)
    lengths = jnp.asarray(
        np.random.default_rng(0).integers(0, s - 1, b), jnp.int32
    )
    want = decode_attention(q, k, v, kc, vc, lengths, force_xla=True)
    got = decode_attention(q, k, v, kc, vc, lengths)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_stacked_cache_layer_indexing():
    L, b, nh, nkv, hd, s = 3, 2, 4, 4, 64, 128
    ks = jax.random.split(jax.random.PRNGKey(1), 5)
    q = jax.random.normal(ks[0], (b, nh, hd), jnp.float32)
    k = jax.random.normal(ks[1], (L, b, nkv, s, hd), jnp.float32)
    v = jax.random.normal(ks[2], (L, b, nkv, s, hd), jnp.float32)
    kc = jax.random.normal(ks[3], (b, nkv, hd), jnp.float32)
    vc = jax.random.normal(ks[4], (b, nkv, hd), jnp.float32)
    lengths = jnp.asarray([60, 100], jnp.int32)
    for layer in range(L):
        want = decode_attention(
            q, k[layer], v[layer], kc, vc, lengths, force_xla=True
        )
        got = decode_attention(q, k, v, kc, vc, lengths, layer=layer)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-4, err_msg=f"layer {layer}"
        )


def test_empty_cache_attends_only_self():
    """length 0: garbage cache must be fully masked; softmax over the single
    self term => output == v_cur."""
    ks = jax.random.split(jax.random.PRNGKey(2), 3)
    q = jax.random.normal(ks[0], (2, 4, 64), jnp.float32)
    k = jnp.full((2, 4, 128, 64), 1e9, jnp.float32)
    v = jnp.full((2, 4, 128, 64), 1e9, jnp.float32)
    kc = jax.random.normal(ks[1], (2, 4, 64), jnp.float32)
    vc = jax.random.normal(ks[2], (2, 4, 64), jnp.float32)
    got = decode_attention(q, k, v, kc, vc, jnp.zeros((2,), jnp.int32))
    np.testing.assert_allclose(np.asarray(got), np.asarray(vc), atol=1e-5)


def test_lm_decode_matches_lm_forward_cached_path():
    """lm_decode (unrolled + kernel + deferred writes) must reproduce the
    scan-based lm_forward cache path token by token."""
    from vlrlhf_tpu.models.common import Ctx
    from vlrlhf_tpu.models.lm.llama import (
        LMConfig, init_lm_params, lm_decode, lm_forward,
    )

    cfg = LMConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64, num_layers=2,
        num_heads=4, num_kv_heads=2, head_dim=8, dtype=jnp.float32,
        remat=False,
    )
    params = init_lm_params(cfg, jax.random.PRNGKey(0))
    b, prompt_len, cache_len = 2, 8, 24
    ids = jax.random.randint(jax.random.PRNGKey(1), (b, prompt_len), 0, 64)

    # prefill via lm_forward (engine layout), transpose to decode layout
    cache = {
        "k": jnp.zeros((2, b, cache_len, 2, 8), jnp.float32),
        "v": jnp.zeros((2, b, cache_len, 2, 8), jnp.float32),
    }
    kv_mask = jnp.arange(cache_len)[None] < prompt_len
    logits, cache = lm_forward(
        cfg, params, input_ids=ids,
        positions=jnp.broadcast_to(jnp.arange(prompt_len)[None], (b, prompt_len)),
        pad_mask=jnp.ones((b, prompt_len), bool),
        cache=cache, kv_mask=jnp.broadcast_to(kv_mask, (b, cache_len)),
    )
    dec_cache = {
        "k": jnp.transpose(cache["k"], (0, 1, 3, 2, 4)),
        "v": jnp.transpose(cache["v"], (0, 1, 3, 2, 4)),
    }
    tok = jnp.argmax(logits[:, prompt_len - 1], -1)
    lengths = jnp.full((b,), prompt_len, jnp.int32)
    pending = None

    # oracle: full-forward logits over the growing sequence
    seq = ids
    for step in range(4):
        logits_dec, dec_cache, pending = lm_decode(
            cfg, params, last_token=tok, lengths=lengths,
            cache=dec_cache, ctx=Ctx(), pending=pending,
        )
        seq = jnp.concatenate([seq, tok[:, None]], 1)
        full_logits, _ = lm_forward(
            cfg, params, input_ids=seq,
            pad_mask=jnp.ones_like(seq, bool),
        )
        np.testing.assert_allclose(
            np.asarray(logits_dec[:, 0]), np.asarray(full_logits[:, -1]),
            atol=2e-4, rtol=2e-3, err_msg=f"step {step}",
        )
        tok = jnp.argmax(logits_dec[:, 0], -1)
        lengths = lengths + 1
