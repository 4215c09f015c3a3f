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

    # prefill via lm_forward — writes the head-major decode layout directly
    cache = {
        "k": jnp.zeros((2, b, 2, cache_len, 8), jnp.float32),
        "v": jnp.zeros((2, b, 2, cache_len, 8), jnp.float32),
    }
    kv_mask = jnp.arange(cache_len)[None] < prompt_len
    logits, dec_cache = lm_forward(
        cfg, params, input_ids=ids,
        positions=jnp.broadcast_to(jnp.arange(prompt_len)[None], (b, prompt_len)),
        pad_mask=jnp.ones((b, prompt_len), bool),
        cache=cache, kv_mask=jnp.broadcast_to(kv_mask, (b, cache_len)),
    )
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


def _quantize_cache(k, v):
    from vlrlhf_tpu.ops.quant import quantize_kv

    kq, ks = quantize_kv(k)
    vq, vs = quantize_kv(v)
    return kq, vq, ks, vs


@pytest.mark.parametrize("b,nh,nkv,hd,s", [(4, 8, 8, 64, 256), (3, 8, 2, 128, 304)])
def test_int8_cache_kernel_matches_dequant_oracle(b, nh, nkv, hd, s):
    """Quantized-cache kernel == XLA attention over the DEQUANTIZED cache
    (identical math, so identical up to f32 reduction order)."""
    ks_ = jax.random.split(jax.random.PRNGKey(3), 5)
    q = jax.random.normal(ks_[0], (b, nh, hd), jnp.float32)
    k = jax.random.normal(ks_[1], (b, nkv, s, hd), jnp.float32)
    v = jax.random.normal(ks_[2], (b, nkv, s, hd), jnp.float32)
    kc = jax.random.normal(ks_[3], (b, nkv, hd), jnp.float32)
    vc = jax.random.normal(ks_[4], (b, nkv, hd), jnp.float32)
    lengths = jnp.asarray(
        np.random.default_rng(1).integers(0, s - 1, b), jnp.int32
    )
    kq, vq, ksc, vsc = _quantize_cache(k, v)
    want = decode_attention(
        q, kq, vq, kc, vc, lengths, force_xla=True, k_scale=ksc, v_scale=vsc
    )
    got = decode_attention(q, kq, vq, kc, vc, lengths, k_scale=ksc, v_scale=vsc)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-3)


def test_int8_cache_close_to_bf16_cache():
    """Per-vector int8 quantization error stays small end to end."""
    b, nh, nkv, hd, s = 2, 4, 4, 64, 128
    ks_ = jax.random.split(jax.random.PRNGKey(4), 5)
    q = jax.random.normal(ks_[0], (b, nh, hd), jnp.float32)
    k = jax.random.normal(ks_[1], (b, nkv, s, hd), jnp.float32)
    v = jax.random.normal(ks_[2], (b, nkv, s, hd), jnp.float32)
    kc = jax.random.normal(ks_[3], (b, nkv, hd), jnp.float32)
    vc = jax.random.normal(ks_[4], (b, nkv, hd), jnp.float32)
    lengths = jnp.asarray([100, 64], jnp.int32)
    exact = decode_attention(q, k, v, kc, vc, lengths, force_xla=True)
    kq, vq, ksc, vsc = _quantize_cache(k, v)
    quant = decode_attention(q, kq, vq, kc, vc, lengths, k_scale=ksc, v_scale=vsc)
    err = np.abs(np.asarray(quant) - np.asarray(exact))
    assert err.max() < 0.05, err.max()


def test_int8_stacked_cache_layer_indexing():
    L, b, nh, nkv, hd, s = 2, 2, 4, 4, 64, 128
    ks_ = jax.random.split(jax.random.PRNGKey(5), 5)
    q = jax.random.normal(ks_[0], (b, nh, hd), jnp.float32)
    k = jax.random.normal(ks_[1], (L, b, nkv, s, hd), jnp.float32)
    v = jax.random.normal(ks_[2], (L, b, nkv, s, hd), jnp.float32)
    kc = jax.random.normal(ks_[3], (b, nkv, hd), jnp.float32)
    vc = jax.random.normal(ks_[4], (b, nkv, hd), jnp.float32)
    lengths = jnp.asarray([60, 100], jnp.int32)
    kq, vq, ksc, vsc = _quantize_cache(k, v)
    for layer in range(L):
        want = decode_attention(
            q, kq[layer], vq[layer], kc, vc, lengths, force_xla=True,
            k_scale=ksc[layer], v_scale=vsc[layer],
        )
        got = decode_attention(
            q, kq, vq, kc, vc, lengths, layer=layer, k_scale=ksc, v_scale=vsc
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-3,
            err_msg=f"layer {layer}",
        )


def test_lm_decode_int8_cache_close_to_bf16():
    """Full decode loop with the int8 cache tracks the bf16-cache logits."""
    from vlrlhf_tpu.models.common import Ctx
    from vlrlhf_tpu.models.lm.llama import (
        LMConfig, init_lm_params, lm_decode, lm_forward,
    )
    from vlrlhf_tpu.ops.quant import quantize_kv

    cfg = LMConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64, num_layers=2,
        num_heads=4, num_kv_heads=2, head_dim=8, dtype=jnp.float32,
        remat=False,
    )
    params = init_lm_params(cfg, jax.random.PRNGKey(0))
    b, prompt_len, cache_len = 2, 8, 24
    ids = jax.random.randint(jax.random.PRNGKey(1), (b, prompt_len), 0, 64)
    cache = {
        "k": jnp.zeros((2, b, 2, cache_len, 8), jnp.float32),
        "v": jnp.zeros((2, b, 2, cache_len, 8), jnp.float32),
    }
    kv_mask = jnp.arange(cache_len)[None] < prompt_len
    logits, cache = lm_forward(
        cfg, params, input_ids=ids,
        positions=jnp.broadcast_to(jnp.arange(prompt_len)[None], (b, prompt_len)),
        pad_mask=jnp.ones((b, prompt_len), bool),
        cache=cache, kv_mask=jnp.broadcast_to(kv_mask, (b, cache_len)),
    )
    bf16_cache = {"k": cache["k"], "v": cache["v"]}
    kq, ksc = quantize_kv(cache["k"])
    vq, vsc = quantize_kv(cache["v"])
    q_cache = {"k": kq, "v": vq, "k_scale": ksc, "v_scale": vsc}

    tok = jnp.argmax(logits[:, prompt_len - 1], -1)
    lengths = jnp.full((b,), prompt_len, jnp.int32)
    pend_a = pend_b = None
    for step in range(4):
        la, bf16_cache, pend_a = lm_decode(
            cfg, params, last_token=tok, lengths=lengths,
            cache=bf16_cache, ctx=Ctx(), pending=pend_a,
        )
        lb, q_cache, pend_b = lm_decode(
            cfg, params, last_token=tok, lengths=lengths,
            cache=q_cache, ctx=Ctx(), pending=pend_b,
        )
        assert "k_scale" in q_cache
        a, b_ = np.asarray(la[:, 0]), np.asarray(lb[:, 0])
        # head_dim is only 8 here, so per-vector int8 error is at its worst;
        # check the logit vectors stay globally close (cosine + scale)
        cos = float(
            (a.ravel() @ b_.ravel())
            / (np.linalg.norm(a) * np.linalg.norm(b_))
        )
        assert cos > 0.985, (step, cos)
        assert np.abs(a - b_).max() < 0.15 * np.abs(a).max(), step
        # same greedy tokens (tiny model, margins are wide)
        tok = jnp.argmax(la[:, 0], -1)
        lengths = lengths + 1


def test_engine_int8_kv_cache_generates():
    from tests.test_dpo_step import tiny_vlm_config
    from vlrlhf_tpu.generate.engine import GenerateConfig, Generator
    from vlrlhf_tpu.models.vlm import init_vlm_params

    cfg = tiny_vlm_config()
    params = init_vlm_params(cfg, jax.random.PRNGKey(0))
    b, l = 2, 32
    ids = jax.random.randint(jax.random.PRNGKey(3), (b, l), 1, 100)
    batch = {
        "input_ids": ids,
        "pad_mask": jnp.ones((b, l), bool),
        "prompt_lens": jnp.full((b,), l, jnp.int32),
    }
    out_bf16 = np.asarray(
        Generator(cfg, GenerateConfig(max_new_tokens=8, pad_token_id=0))(
            params, batch
        )
    )
    out_int8 = np.asarray(
        Generator(
            cfg,
            GenerateConfig(
                max_new_tokens=8, pad_token_id=0, kv_cache_dtype="int8"
            ),
        )(params, batch)
    )
    assert out_int8.shape == (b, 8)
    # greedy decode on a random tiny model: int8 cache should track bf16
    # for at least the first tokens (wide argmax margins)
    assert (out_int8[:, 0] == out_bf16[:, 0]).all()
