"""Ring attention over an 8-way sequence-sharded mesh vs single-device."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vlrlhf_tpu.core.mesh import MeshConfig, make_mesh
from vlrlhf_tpu.ops.attention import make_attention_mask, reference_attention
from vlrlhf_tpu.ops.ring_attention import ring_attention


@pytest.mark.parametrize("causal", [True, False])
def test_ring_matches_full_attention(causal):
    mesh = make_mesh(MeshConfig(data=1, fsdp=8, model=1))
    b, s, h, d = 2, 8 * 16, 2, 16
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(kq, (b, s, h, d), jnp.float32)
    k = jax.random.normal(kk, (b, s, h, d), jnp.float32)
    v = jax.random.normal(kv, (b, s, h, d), jnp.float32)

    out = ring_attention(q, k, v, mesh, axis_name="fsdp", causal=causal)
    mask = make_attention_mask(
        jnp.ones((b, s), bool), jnp.ones((b, s), bool), causal
    )
    ref = reference_attention(q, k, v, mask=mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5,
                               rtol=2e-5)


def test_ring_with_padding():
    mesh = make_mesh(MeshConfig(data=1, fsdp=8, model=1))
    b, s, h, d = 1, 8 * 16, 2, 16
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(1), 3)
    q = jax.random.normal(kq, (b, s, h, d), jnp.float32)
    k = jax.random.normal(kk, (b, s, h, d), jnp.float32)
    v = jax.random.normal(kv, (b, s, h, d), jnp.float32)
    pad = (jnp.arange(s)[None, :] < 100).astype(bool)  # pads mid-shard

    out = ring_attention(q, k, v, mesh, causal=True, pad_mask=pad)
    mask = make_attention_mask(pad, pad, True)
    ref = reference_attention(q, k, v, mask=mask)
    valid = np.asarray(pad[0])
    np.testing.assert_allclose(
        np.asarray(out)[0][valid], np.asarray(ref)[0][valid],
        atol=2e-5, rtol=2e-5,
    )


def test_ring_grads_flow():
    mesh = make_mesh(MeshConfig(data=1, fsdp=8, model=1))
    b, s, h, d = 1, 8 * 16, 1, 8
    q = jax.random.normal(jax.random.PRNGKey(2), (b, s, h, d))
    k = jax.random.normal(jax.random.PRNGKey(3), (b, s, h, d))
    v = jax.random.normal(jax.random.PRNGKey(4), (b, s, h, d))

    def loss_ring(q, k, v):
        return jnp.sum(ring_attention(q, k, v, mesh, causal=True) ** 2)

    def loss_ref(q, k, v):
        mask = make_attention_mask(
            jnp.ones((b, s), bool), jnp.ones((b, s), bool), True
        )
        return jnp.sum(reference_attention(q, k, v, mask=mask) ** 2)

    g_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gr, gf in zip(g_ring, g_ref):
        np.testing.assert_allclose(np.asarray(gr), np.asarray(gf), atol=5e-5,
                                   rtol=5e-4)
