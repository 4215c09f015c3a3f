"""Flash attention kernel vs XLA reference attention (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vlrlhf_tpu.ops.attention import make_attention_mask, reference_attention
from vlrlhf_tpu.ops.flash_attention import flash_attention


def _rand_qkv(key, b, s, h, d, hkv=None):
    kq, kk, kv = jax.random.split(key, 3)
    hkv = hkv or h
    q = jax.random.normal(kq, (b, s, h, d), jnp.float32)
    k = jax.random.normal(kk, (b, s, hkv, d), jnp.float32)
    v = jax.random.normal(kv, (b, s, hkv, d), jnp.float32)
    return q, k, v


def _ref(q, k, v, causal=True, pad_q=None, pad_kv=None, seg_q=None, seg_kv=None):
    b, s = q.shape[0], q.shape[1]
    pad_q = pad_q if pad_q is not None else jnp.ones((b, s), bool)
    pad_kv = pad_kv if pad_kv is not None else jnp.ones((b, k.shape[1]), bool)
    mask = make_attention_mask(pad_q, pad_kv, causal, seg_q, seg_kv)
    return reference_attention(q, k, v, mask=mask)


@pytest.mark.parametrize("causal", [True, False])
def test_forward_matches_reference(causal):
    q, k, v = _rand_qkv(jax.random.PRNGKey(0), 2, 256, 4, 64)
    out = flash_attention(q, k, v, causal=causal, block_q=128, block_kv=128)
    ref = _ref(q, k, v, causal=causal)
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)


def test_forward_unaligned_seq_padding():
    # 200 is not a multiple of 128: wrapper must pad and un-pad correctly.
    q, k, v = _rand_qkv(jax.random.PRNGKey(1), 1, 200, 2, 64)
    out = flash_attention(q, k, v, causal=True, block_q=128, block_kv=128)
    ref = _ref(q, k, v, causal=True)
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)


def test_forward_gqa():
    q, k, v = _rand_qkv(jax.random.PRNGKey(2), 1, 128, 8, 32, hkv=2)
    out = flash_attention(q, k, v, causal=True, block_q=128, block_kv=128)
    ref = _ref(q, k, v, causal=True)
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)


def test_forward_padding_and_segments():
    b, s = 2, 256
    q, k, v = _rand_qkv(jax.random.PRNGKey(3), b, s, 2, 64)
    lengths = jnp.array([s, 130])
    pad = jnp.arange(s)[None, :] < lengths[:, None]
    # Two packed segments per row.
    seg = (jnp.arange(s)[None, :] >= 100).astype(jnp.int32)
    seg = jnp.broadcast_to(seg, (b, s))
    out = flash_attention(
        q, k, v, causal=True,
        pad_mask_q=pad, pad_mask_kv=pad,
        segment_ids_q=seg, segment_ids_kv=seg,
        block_q=128, block_kv=128,
    )
    ref = _ref(q, k, v, True, pad, pad, seg, seg)
    valid = np.asarray(pad)
    np.testing.assert_allclose(
        np.asarray(out)[valid], np.asarray(ref)[valid], atol=2e-5, rtol=2e-5
    )


@pytest.mark.parametrize("causal", [True, False])
def test_backward_matches_reference(causal):
    q, k, v = _rand_qkv(jax.random.PRNGKey(4), 1, 128, 2, 64)

    def loss_flash(q, k, v):
        o = flash_attention(q, k, v, causal=causal, block_q=128, block_kv=128)
        return jnp.sum(o * jnp.cos(o))

    def loss_ref(q, k, v):
        o = _ref(q, k, v, causal=causal)
        return jnp.sum(o * jnp.cos(o))

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gf, gr, name in zip(g_flash, g_ref, "qkv"):
        np.testing.assert_allclose(gf, gr, atol=5e-5, rtol=5e-4, err_msg=f"d{name}")


def test_backward_with_segments_and_padding():
    b, s = 1, 256
    q, k, v = _rand_qkv(jax.random.PRNGKey(5), b, s, 2, 64)
    pad = (jnp.arange(s)[None, :] < 190).astype(bool)
    seg = (jnp.arange(s)[None, :] >= 64).astype(jnp.int32)

    def loss_flash(q, k, v):
        o = flash_attention(
            q, k, v, causal=True,
            pad_mask_q=pad, pad_mask_kv=pad,
            segment_ids_q=seg, segment_ids_kv=seg,
            block_q=128, block_kv=128,
        )
        return jnp.sum(jnp.where(pad[..., None, None], o, 0.0) ** 2)

    def loss_ref(q, k, v):
        o = _ref(q, k, v, True, pad, pad, seg, seg)
        return jnp.sum(jnp.where(pad[..., None, None], o, 0.0) ** 2)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gf, gr, name in zip(g_flash, g_ref, "qkv"):
        np.testing.assert_allclose(gf, gr, atol=5e-5, rtol=5e-4, err_msg=f"d{name}")
