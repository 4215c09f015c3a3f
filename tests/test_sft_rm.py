"""SFT and RM train steps on the tiny VLM."""

import jax
import jax.numpy as jnp
import numpy as np

from tests.test_dpo_step import tiny_batch, tiny_vlm_config
from vlrlhf_tpu.lora.lora import LoraConfig, init_lora
from vlrlhf_tpu.models.vlm import init_rm_head, init_vlm_params
from vlrlhf_tpu.train.rm import RMConfig, make_rm_step
from vlrlhf_tpu.train.sft import SFTConfig, make_sft_step
from vlrlhf_tpu.train.train_state import (
    OptimizerConfig,
    init_train_state,
    make_optimizer,
)


def test_sft_adapter_loss_decreases():
    cfg = tiny_vlm_config()
    params = init_vlm_params(cfg, jax.random.PRNGKey(0))
    lcfg = LoraConfig(r=4, alpha=8.0, target_patterns=(r"lm/.*attn/", r"lm/.*mlp/"))
    adapters = init_lora(params, lcfg, jax.random.PRNGKey(1))
    tx = make_optimizer(
        OptimizerConfig(learning_rate=5e-3, warmup_steps=1, total_steps=40),
        adapters,
    )
    state = init_train_state(adapters, tx)
    step = make_sft_step(cfg, SFTConfig(lora_scale=lcfg.scale), tx)
    full = tiny_batch(jax.random.PRNGKey(2))
    batch = {
        "input_ids": full["input_ids"][:2],
        "labels": full["labels"][:2],
        "pad_mask": full["pad_mask"][:2],
        "pixel_values": full["pixel_values"],
        "image_positions": full["image_positions"][:2],
    }
    losses = []
    for _ in range(10):
        state, m = step(state, params, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] - 1e-3, losses


def test_sft_full_ft_with_frozen_vision():
    cfg = tiny_vlm_config()
    params = init_vlm_params(cfg, jax.random.PRNGKey(0))
    tx = make_optimizer(
        OptimizerConfig(
            learning_rate=1e-3, warmup_steps=1, total_steps=40,
            freeze_patterns=(r"^vision/",),
        ),
        params,
    )
    state = init_train_state(params, tx)
    step = make_sft_step(cfg, SFTConfig(mode="full"), tx)
    full = tiny_batch(jax.random.PRNGKey(2))
    batch = {k: (v[:2] if k != "pixel_values" else v) for k, v in full.items()}
    vision_before = jax.tree.map(np.asarray, state.trainable["vision"])
    norm_before = np.asarray(state.trainable["lm"]["norm"]["weight"])
    for _ in range(3):
        # full mode: trainable IS the params; base_params unused (and state is
        # donated, so passing the aliased params tree would use freed buffers)
        state, m = step(state, None, batch)
    assert np.isfinite(m["loss"])
    # vision tower unchanged, LM changed
    for a, b in zip(
        jax.tree.leaves(vision_before), jax.tree.leaves(state.trainable["vision"])
    ):
        np.testing.assert_array_equal(a, b)
    assert not np.allclose(
        norm_before, np.asarray(state.trainable["lm"]["norm"]["weight"])
    )


def test_rm_step_accuracy_improves():
    cfg = tiny_vlm_config()
    params = init_vlm_params(cfg, jax.random.PRNGKey(0))
    lcfg = LoraConfig(r=4, alpha=8.0, target_patterns=(r"lm/.*attn/",))
    trainable = {
        "adapters": init_lora(params, lcfg, jax.random.PRNGKey(1)),
        "rm_head": init_rm_head(cfg.lm.hidden_size, jnp.float32),
    }
    tx = make_optimizer(
        OptimizerConfig(learning_rate=5e-3, warmup_steps=1, total_steps=60),
        trainable,
    )
    state = init_train_state(trainable, tx)
    step = make_rm_step(cfg, RMConfig(lora_scale=lcfg.scale), tx)
    batch = tiny_batch(jax.random.PRNGKey(3))
    first_loss, last = None, None
    for i in range(15):
        state, m = step(state, params, batch)
        if i == 0:
            first_loss = float(m["loss"])
            # zero-init rm head -> all scores 0 -> loss = log 2
            np.testing.assert_allclose(first_loss, np.log(2.0), atol=1e-5)
        last = m
    assert float(last["loss"]) < first_loss
    assert float(last["accuracy"]) == 1.0  # overfit one batch


def test_sft_chunked_logits_matches_dense():
    """SFTConfig.logits_chunk path == dense CE: same loss and same updated
    adapters, in adapter AND full-ft mode (full mode flows lm_head/embed
    grads through the chunked scan)."""
    cfg = tiny_vlm_config()
    params = init_vlm_params(cfg, jax.random.PRNGKey(0))
    full = tiny_batch(jax.random.PRNGKey(2))
    batch = {
        "input_ids": full["input_ids"][:2],
        "labels": full["labels"][:2],
        "pad_mask": full["pad_mask"][:2].at[:, -5:].set(False),
        "pixel_values": full["pixel_values"],
        "image_positions": full["image_positions"][:2],
    }
    lcfg = LoraConfig(r=4, alpha=8.0,
                      target_patterns=(r"lm/.*attn/", r"lm/.*mlp/"))
    ocfg = OptimizerConfig(learning_rate=5e-3, warmup_steps=1, total_steps=40)

    def run(mode, chunk):
        if mode == "adapter":
            trainable = init_lora(params, lcfg, jax.random.PRNGKey(1))
            trainable = jax.tree.map(
                lambda x: x + 0.01 * jnp.ones_like(x), trainable
            )
            base = params
        else:
            # copy: the jitted step donates state.trainable, and full mode
            # would otherwise consume the shared params tree
            trainable, base = jax.tree.map(jnp.array, params), None
        tx = make_optimizer(ocfg, trainable)
        state = init_train_state(trainable, tx)
        step = make_sft_step(
            cfg, SFTConfig(lora_scale=lcfg.scale, mode=mode,
                           logits_chunk=chunk), tx
        )
        return step(state, base, batch)

    for mode in ("adapter", "full"):
        s_dense, m_dense = run(mode, 0)
        s_ch, m_ch = run(mode, 16)
        np.testing.assert_allclose(
            float(m_ch["loss"]), float(m_dense["loss"]), rtol=2e-5,
            err_msg=mode,
        )
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                a, b, rtol=2e-4, atol=1e-6
            ),
            s_ch.trainable, s_dense.trainable,
        )
