"""Pallas chunk attention (ops/chunk_attention.py) vs the dense oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vlrlhf_tpu.ops.chunk_attention import chunk_attention


def _mk(b, c, nh, nkv, sc, hd, layers=None, seed=0, int8=False):
    ks = jax.random.split(jax.random.PRNGKey(seed), 4)
    q = jax.random.normal(ks[0], (b, c, nh, hd), jnp.float32)
    shape = (b, nkv, sc, hd) if layers is None else (layers, b, nkv, sc, hd)
    if int8:
        kc = jax.random.randint(ks[1], shape, -127, 127).astype(jnp.int8)
        vc = jax.random.randint(ks[2], shape, -127, 127).astype(jnp.int8)
        ssh = shape[:-1]
        k_s = (jax.random.uniform(ks[3], ssh) * 0.05 + 0.01).astype(
            jnp.bfloat16
        )
        v_s = (jax.random.uniform(ks[0], ssh) * 0.05 + 0.01).astype(
            jnp.bfloat16
        )
        return q, kc, vc, k_s, v_s
    kc = jax.random.normal(ks[1], shape, jnp.float32)
    vc = jax.random.normal(ks[2], shape, jnp.float32)
    return q, kc, vc, None, None


@pytest.mark.parametrize("c,nh,nkv", [(4, 4, 4), (8, 8, 2), (1, 4, 2)])
def test_chunk_attention_matches_dense(c, nh, nkv):
    b, sc, hd = 3, 64, 16
    q, kc, vc, _, _ = _mk(b, c, nh, nkv, sc, hd, seed=1)
    lengths = jnp.asarray([0, 13, 40], jnp.int32)
    got = chunk_attention(q, kc, vc, lengths)
    want = chunk_attention(q, kc, vc, lengths, force_xla=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4
    )


def test_chunk_attention_stacked_layer_indexing():
    b, c, nh, nkv, sc, hd = 2, 4, 4, 4, 64, 16
    q, kc, vc, _, _ = _mk(b, c, nh, nkv, sc, hd, layers=3, seed=2)
    lengths = jnp.asarray([7, 22], jnp.int32)
    for layer in (0, 2):
        got = chunk_attention(q, kc, vc, lengths, layer=layer)
        want = chunk_attention(
            q, kc, vc, lengths, layer=layer, force_xla=True
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4,
            err_msg=f"layer {layer}",
        )


def test_chunk_attention_int8_cache():
    b, c, nh, nkv, sc, hd = 2, 4, 8, 4, 128, 16
    q, kc, vc, k_s, v_s = _mk(b, c, nh, nkv, sc, hd, layers=2, seed=3,
                              int8=True)
    lengths = jnp.asarray([5, 100], jnp.int32)
    got = chunk_attention(q, kc, vc, lengths, layer=1,
                          k_scale=k_s, v_scale=v_s)
    want = chunk_attention(q, kc, vc, lengths, layer=1,
                           k_scale=k_s, v_scale=v_s, force_xla=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=5e-3, rtol=1e-2
    )


def test_chunk_attention_multiblock_lengths_edge():
    """Lengths straddling block boundaries with multiple S blocks."""
    b, c, nh, nkv, sc, hd = 4, 8, 4, 4, 256, 16
    q, kc, vc, _, _ = _mk(b, c, nh, nkv, sc, hd, seed=4)
    lengths = jnp.asarray([0, 127, 128, 247], jnp.int32)
    got = chunk_attention(q, kc, vc, lengths, block_s=128)
    want = chunk_attention(q, kc, vc, lengths, force_xla=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4
    )


def test_prefill_chunk_kernel_matches_dense_path():
    """lm_prefill_chunk end to end: kernel vs ctx.attn_impl='xla' dense."""
    from vlrlhf_tpu.models.common import Ctx
    from vlrlhf_tpu.models.lm.llama import (
        LMConfig,
        init_lm_params,
        lm_forward,
        lm_prefill_chunk,
    )

    cfg = LMConfig(
        vocab_size=97, hidden_size=32, intermediate_size=48, num_layers=2,
        num_heads=4, num_kv_heads=2, dtype=jnp.float32, remat=False,
    )
    params = init_lm_params(cfg, jax.random.PRNGKey(5))
    ids = jax.random.randint(jax.random.PRNGKey(6), (2, 8), 1, 90)
    lens = jnp.asarray([6, 8], jnp.int32)
    pad = jnp.arange(8)[None, :] < lens[:, None]
    _, cache = lm_forward(cfg, params, input_ids=ids, pad_mask=pad,
                          cache_len=24)
    chunk = jax.random.randint(jax.random.PRNGKey(7), (2, 5), 1, 90)
    clens = jnp.asarray([3, 5], jnp.int32)
    outs = {}
    for name, impl in (("kernel", "auto"), ("dense", "xla")):
        logits, _, _ = lm_prefill_chunk(
            cfg, params, input_ids=chunk, chunk_lens=clens, lengths=lens,
            cache=jax.tree.map(jnp.copy, cache), ctx=Ctx(attn_impl=impl),
        )
        outs[name] = np.asarray(logits)
    np.testing.assert_allclose(
        outs["kernel"], outs["dense"], atol=2e-4, rtol=1e-4
    )
