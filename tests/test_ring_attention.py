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


def test_lm_forward_sequence_parallel_option_matches_plain():
    """LMConfig.sequence_parallel_axis (VERDICT r1 item 10): the full decoder
    forward under ring attention must match the plain forward — including GQA
    (kv heads repeated before the ring) and padding."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from vlrlhf_tpu.core.mesh import MeshConfig, make_mesh
    from vlrlhf_tpu.models.lm.llama import LMConfig, init_lm_params, lm_forward

    make_mesh(MeshConfig(data=1, fsdp=8, model=1))  # registers global mesh
    cfg = LMConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64, num_layers=2,
        num_heads=4, num_kv_heads=2, head_dim=8, dtype=jnp.float32,
        remat=False,
    )
    params = init_lm_params(cfg, jax.random.PRNGKey(0))
    b, s = 2, 32  # seq divisible by the 8-way axis
    ids = jax.random.randint(jax.random.PRNGKey(1), (b, s), 0, 128)
    pad = jnp.asarray(np.arange(s)[None, :] < np.asarray([s, s - 5])[:, None])

    plain, _ = lm_forward(cfg, params, input_ids=ids, pad_mask=pad)
    sp_cfg = dataclasses.replace(cfg, sequence_parallel_axis="fsdp")
    ring, _ = lm_forward(sp_cfg, params, input_ids=ids, pad_mask=pad)
    np.testing.assert_allclose(
        np.asarray(ring)[np.asarray(pad)], np.asarray(plain)[np.asarray(pad)],
        atol=2e-4, rtol=2e-3,
    )


def test_sequence_parallel_dpo_step_runs_on_mesh():
    """End-to-end: a DPO step with sequence-parallel attention compiles and
    runs on the virtual mesh, loss finite and equal to log(2) at step 0."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from tests.test_dpo_step import _setup, tiny_batch, tiny_vlm_config
    from vlrlhf_tpu.core.mesh import MeshConfig, make_mesh
    from vlrlhf_tpu.lora.lora import LoraConfig, init_lora
    from vlrlhf_tpu.models.vlm import init_vlm_params
    from vlrlhf_tpu.train.dpo import DPOConfig, make_dpo_step
    from vlrlhf_tpu.train.train_state import (
        OptimizerConfig, init_train_state, make_optimizer,
    )

    make_mesh(MeshConfig(data=1, fsdp=8, model=1))
    base = tiny_vlm_config()
    cfg = dataclasses.replace(
        base, lm=dataclasses.replace(base.lm, sequence_parallel_axis="fsdp")
    )
    params = init_vlm_params(cfg, jax.random.PRNGKey(0))
    lcfg = LoraConfig(r=4, alpha=8.0, target_patterns=(r"lm/.*attn/",))
    adapters = init_lora(params, lcfg, jax.random.PRNGKey(1))
    tx = make_optimizer(
        OptimizerConfig(learning_rate=1e-3, warmup_steps=1, total_steps=10),
        adapters,
    )
    state = init_train_state(adapters, tx)
    step = make_dpo_step(cfg, DPOConfig(lora_scale=lcfg.scale), tx)
    batch = tiny_batch(jax.random.PRNGKey(2), n_pairs=2, seq=48)
    _, m = step(state, params, batch)
    np.testing.assert_allclose(float(m["loss"]), np.log(2.0), atol=1e-5)
