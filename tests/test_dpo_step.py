"""End-to-end DPO step on a tiny VLM: invariants + FSDP-sharded parity."""

import jax
import jax.numpy as jnp
import numpy as np

from vlrlhf_tpu.core.mesh import MeshConfig, make_mesh
from vlrlhf_tpu.core.partitioning import batch_spec, default_lm_rules, shard_pytree
from vlrlhf_tpu.lora.lora import LoraConfig, init_lora
from vlrlhf_tpu.models.lm.llama import LMConfig
from vlrlhf_tpu.models.vision.vit import ViTConfig
from vlrlhf_tpu.models.vlm import ProjectorConfig, VLMConfig, init_vlm_params
from vlrlhf_tpu.train.dpo import DPOConfig, make_dpo_step
from vlrlhf_tpu.train.train_state import (
    OptimizerConfig,
    init_train_state,
    make_optimizer,
)

IMG_TOKEN = 100
N_IMG_TOKENS = 16


def tiny_vlm_config():
    return VLMConfig(
        lm=LMConfig(
            vocab_size=128, hidden_size=32, intermediate_size=64,
            num_layers=2, num_heads=4, num_kv_heads=4,
            dtype=jnp.float32, remat=False,
        ),
        vision=ViTConfig(
            image_size=16, patch_size=4, hidden_size=16, num_layers=2,
            num_heads=2, mlp_dim=32, feature_layer=-2, drop_class_token=True,
            dtype=jnp.float32, remat=False,
        ),
        projector=ProjectorConfig(kind="mlp2x_gelu", in_dim=16, out_dim=32),
        image_token_id=IMG_TOKEN,
        num_image_tokens=N_IMG_TOKENS,
    )


def tiny_batch(key, n_pairs=2, seq=48):
    kids, kimg, kpref = jax.random.split(key, 3)
    b2 = 2 * n_pairs
    ids = jax.random.randint(kids, (b2, seq), 0, 100)
    # image tokens at positions 2..18 for every row
    img_pos = jnp.broadcast_to(jnp.arange(2, 2 + N_IMG_TOKENS)[None], (b2, N_IMG_TOKENS))
    ids = jax.vmap(lambda r, p: r.at[p].set(IMG_TOKEN))(ids, img_pos)
    labels = jnp.where(
        jnp.arange(seq)[None] >= 30, ids, -100
    )  # completion = last 18 tokens
    pad = jnp.ones((b2, seq), bool)
    pixels = jax.random.randint(kimg, (n_pairs, 1, 16, 16, 3), 0, 255).astype(
        jnp.float32
    ) / 255.0
    return {
        "input_ids": ids,
        "labels": labels,
        "pad_mask": pad,
        "pixel_values": pixels,
        "image_positions": img_pos.astype(jnp.int32),
    }


def _setup(loss_type="sigmoid", lr=5e-3):
    cfg = tiny_vlm_config()
    params = init_vlm_params(cfg, jax.random.PRNGKey(0))
    lcfg = LoraConfig(r=4, alpha=8.0, target_patterns=(r"lm/.*attn/", r"lm/.*mlp/"))
    adapters = init_lora(params, lcfg, jax.random.PRNGKey(1))
    dcfg = DPOConfig(beta=0.1, loss_type=loss_type, lora_scale=lcfg.scale)
    ocfg = OptimizerConfig(learning_rate=lr, warmup_steps=1, total_steps=50)
    tx = make_optimizer(ocfg, adapters)
    state = init_train_state(adapters, tx)
    step = make_dpo_step(cfg, dcfg, tx)
    batch = tiny_batch(jax.random.PRNGKey(2))
    return cfg, params, state, step, batch


def test_step0_loss_is_log2():
    """Zero-init LoRA => policy == ref => sigmoid DPO loss = log(2)."""
    _, params, state, step, batch = _setup()
    _, metrics = step(state, params, batch)
    np.testing.assert_allclose(float(metrics["loss"]), np.log(2.0), atol=1e-5)
    np.testing.assert_allclose(float(metrics["rewards/margins"]), 0.0, atol=1e-5)


def test_loss_decreases_and_margins_grow():
    _, params, state, step, batch = _setup()
    losses, margins = [], []
    for _ in range(12):
        state, metrics = step(state, params, batch)
        losses.append(float(metrics["loss"]))
        margins.append(float(metrics["rewards/margins"]))
    assert losses[-1] < losses[0] - 1e-3, losses
    assert margins[-1] > 0.0, margins


def test_ddpo_and_ipo_variants_run():
    for lt in ("ddpo", "ipo", "kto_pair", "hinge"):
        _, params, state, step, batch = _setup(loss_type=lt)
        if lt == "ddpo":
            lm = (batch["labels"] != -100) & (
                jax.random.uniform(jax.random.PRNGKey(3), batch["labels"].shape) > 0.3
            )
            batch = dict(batch, loss_mask=lm)
        state, m1 = step(state, params, batch)
        state, m2 = step(state, params, batch)
        assert np.isfinite(m1["loss"]) and np.isfinite(m2["loss"]), lt


def test_sharded_step_matches_unsharded():
    cfg, params, state, step, batch = _setup()
    batch = tiny_batch(jax.random.PRNGKey(9), n_pairs=4)  # divisible by dp=4
    _, m_unsharded = step(state, params, batch)  # donates `state`

    mesh = make_mesh(MeshConfig(data=2, fsdp=2, model=2))
    rules = default_lm_rules()
    params_s = shard_pytree(rules, params, mesh)
    # state was donated above — rebuild it (deterministic init), then shard
    _, _, state, _, _ = _setup()
    from vlrlhf_tpu.core.partitioning import make_sharding

    state_s = jax.tree.map(jax.device_put, state, make_sharding(rules, state, mesh))
    from jax.sharding import NamedSharding

    batch_s = jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, batch_spec())), batch
    )
    _, m_sharded = step(state_s, params_s, batch_s)
    np.testing.assert_allclose(
        float(m_sharded["loss"]), float(m_unsharded["loss"]), atol=1e-5
    )
    np.testing.assert_allclose(
        float(m_sharded["rewards/margins"]),
        float(m_unsharded["rewards/margins"]),
        atol=1e-5,
    )


def test_precomputed_ref_logps_match_online():
    """Precompute pass + cached-ref step == online-ref step (same loss)."""
    from vlrlhf_tpu.train.dpo import make_ref_logps_fn

    cfg, params, state, step, batch = _setup()
    _, m_online = step(state, params, batch)

    # precompute ref logps for the same batch, attach, rebuild step
    dcfg = DPOConfig(beta=0.1, loss_type="sigmoid", lora_scale=8.0 / 4)
    fn = make_ref_logps_fn(cfg, dcfg)
    c, r = fn(params, batch)
    batch2 = dict(batch, ref_chosen_logps=c, ref_rejected_logps=r)
    _, _, state2, step2, _ = _setup()
    _, m_cached = step2(state2, params, batch2)
    np.testing.assert_allclose(
        float(m_cached["loss"]), float(m_online["loss"]), atol=1e-5
    )
    np.testing.assert_allclose(
        float(m_cached["rewards/margins"]), float(m_online["rewards/margins"]),
        atol=1e-5,
    )


def test_chunked_logits_matches_dense_path():
    """logits_chunk path == dense path: same loss/metrics and same updated
    adapters (the scan + per-chunk checkpoint changes memory, not math).
    Chunk 16 with seq 48 exercises multi-chunk + the seq%chunk==0 case;
    chunk 20 exercises padding (48 = 2*20 + 8)."""
    cfg, params, state0, _, batch = _setup()
    lcfg = LoraConfig(r=4, alpha=8.0,
                      target_patterns=(r"lm/.*attn/", r"lm/.*mlp/"))
    ocfg = OptimizerConfig(learning_rate=5e-3, warmup_steps=1, total_steps=50)

    def run(logits_chunk):
        adapters = init_lora(params, lcfg, jax.random.PRNGKey(1))
        # non-zero adapters so policy != ref and grads are nontrivial
        adapters = jax.tree.map(
            lambda x: x + 0.01 * jnp.ones_like(x), adapters
        )
        tx = make_optimizer(ocfg, adapters)
        state = init_train_state(adapters, tx)
        dcfg = DPOConfig(beta=0.1, lora_scale=lcfg.scale,
                         logits_chunk=logits_chunk)
        step = make_dpo_step(cfg, dcfg, tx)
        return step(state, params, batch)

    s_dense, m_dense = run(0)
    for chunk in (16, 20):
        s_ch, m_ch = run(chunk)
        for k in m_dense:
            np.testing.assert_allclose(
                float(m_ch[k]), float(m_dense[k]), rtol=2e-5, atol=2e-6,
                err_msg=f"{k} (chunk={chunk})"
            )
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6),
            s_ch.trainable, s_dense.trainable,
        )


def test_chunked_logits_ddpo_loss_mask():
    """chunked path honors the DDPO diff mask identically."""
    cfg, params, state0, _, batch = _setup(loss_type="ddpo")
    b2, seq = batch["input_ids"].shape
    rng = np.random.default_rng(0)
    batch = dict(batch)
    batch["loss_mask"] = jnp.asarray(rng.integers(0, 2, (b2, seq)))
    lcfg = LoraConfig(r=4, alpha=8.0,
                      target_patterns=(r"lm/.*attn/", r"lm/.*mlp/"))
    ocfg = OptimizerConfig(learning_rate=5e-3, warmup_steps=1, total_steps=50)

    def run(logits_chunk):
        adapters = init_lora(params, lcfg, jax.random.PRNGKey(1))
        # non-zero adapters: zero margins would make accuracies knife-edge
        adapters = jax.tree.map(
            lambda x: x + 0.01 * jnp.ones_like(x), adapters
        )
        tx = make_optimizer(ocfg, adapters)
        state = init_train_state(adapters, tx)
        dcfg = DPOConfig(beta=0.1, loss_type="ddpo", lora_scale=lcfg.scale,
                         logits_chunk=logits_chunk)
        step = make_dpo_step(cfg, dcfg, tx)
        return step(state, params, batch)

    _, m_dense = run(0)
    _, m_ch = run(16)
    for k in m_dense:
        np.testing.assert_allclose(
            float(m_ch[k]), float(m_dense[k]), rtol=2e-5, atol=2e-6,
            err_msg=k,
        )
