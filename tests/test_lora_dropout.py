"""LoRA dropout wiring (VERDICT r1 item 4) + unfrozen-vision DPO (item 5a).

The reference trains with peft LoRA dropout 0.05 by default
(/root/reference/src/vlrlhf/utils/auto_load.py:560-571); round 1 accepted the
flag but never set Ctx.lora_dropout. These tests pin the now-wired behavior:
  - step-0 DPO loss is log(2) even with dropout on (b=0 => delta=0),
  - once adapters are non-zero, dropout changes the POLICY forward,
  - the dropout stream is deterministic per step (bit-exact resume holds),
  - frozen_vision=False multimodal DPO runs (per-pair pixels tiled to 2B).
"""

import jax
import jax.numpy as jnp
import numpy as np

from tests.test_dpo_step import _setup, tiny_batch, tiny_vlm_config
from vlrlhf_tpu.lora.lora import LoraConfig, init_lora
from vlrlhf_tpu.models.vlm import init_vlm_params
from vlrlhf_tpu.train.dpo import DPOConfig, make_dpo_step
from vlrlhf_tpu.train.train_state import (
    OptimizerConfig,
    init_train_state,
    make_optimizer,
)


def _setup_dropout(lora_dropout=0.0, frozen_vision=True, seed=0, lr=5e-3):
    cfg = tiny_vlm_config()
    params = init_vlm_params(cfg, jax.random.PRNGKey(0))
    lcfg = LoraConfig(r=4, alpha=8.0, target_patterns=(r"lm/.*attn/", r"lm/.*mlp/"))
    adapters = init_lora(params, lcfg, jax.random.PRNGKey(1))
    dcfg = DPOConfig(
        beta=0.1, lora_scale=lcfg.scale, lora_dropout=lora_dropout,
        dropout_seed=seed, frozen_vision=frozen_vision,
    )
    tx = make_optimizer(
        OptimizerConfig(learning_rate=lr, warmup_steps=1, total_steps=50),
        adapters,
    )
    state = init_train_state(adapters, tx)
    step = make_dpo_step(cfg, dcfg, tx)
    return cfg, params, state, step


def _copy(tree):
    return jax.tree.map(jnp.copy, tree)


def test_step0_loss_log2_with_dropout_on():
    """b=0 at init => LoRA delta is 0 regardless of dropout masks."""
    _, params, state, step = _setup_dropout(lora_dropout=0.5)
    batch = tiny_batch(jax.random.PRNGKey(2))
    _, metrics = step(state, params, batch)
    np.testing.assert_allclose(float(metrics["loss"]), np.log(2.0), atol=1e-5)


def test_dropout_changes_policy_forward_once_adapters_nonzero():
    # Train 5 steps WITHOUT dropout to make adapters non-trivial.
    cfg, params, state, step = _setup_dropout(lora_dropout=0.0)
    batch = tiny_batch(jax.random.PRNGKey(2))
    for _ in range(5):
        state, m_plain = step(state, params, batch)
    trained = _copy(state.trainable)

    # Same trained adapters, dropout off vs on: policy logps must differ,
    # and two different dropout seeds must differ from each other.
    losses = {}
    for name, (p_drop, seed) in {
        "off": (0.0, 0), "on_a": (0.5, 0), "on_b": (0.5, 7)
    }.items():
        _, _, state_i, step_i = _setup_dropout(lora_dropout=p_drop, seed=seed)
        state_i = jax.tree_util.tree_map(lambda x: x, state_i)
        # splice the trained adapters in (fresh opt state is fine: we read
        # the loss computed BEFORE the update)
        from vlrlhf_tpu.train.train_state import TrainState

        state_i = TrainState(state_i.step, _copy(trained), state_i.opt_state)
        _, m = step_i(state_i, params, batch)
        losses[name] = float(m["logps/chosen"])
    assert losses["on_a"] != losses["off"]
    assert losses["on_a"] != losses["on_b"]


def test_dropout_stream_is_deterministic_per_step():
    """Same seed + same state.step => identical masks => identical loss."""
    batch = tiny_batch(jax.random.PRNGKey(2))
    vals = []
    for _ in range(2):
        cfg, params, state, step = _setup_dropout(lora_dropout=0.3)
        for _ in range(3):
            state, m = step(state, params, batch)
        vals.append(float(m["loss"]))
    assert vals[0] == vals[1]


def test_unfrozen_vision_multimodal_dpo_runs():
    """frozen_vision=False with per-pair pixel_values: the round-1 crash
    (mismatched batch dims in merge_multimodal_embeddings) is fixed by
    tiling image inputs to 2B inside the step."""
    _, params, state, step = _setup_dropout(frozen_vision=False)
    batch = tiny_batch(jax.random.PRNGKey(2))
    assert batch["pixel_values"].shape[0] * 2 == batch["input_ids"].shape[0]
    state, m1 = step(state, params, batch)
    np.testing.assert_allclose(float(m1["loss"]), np.log(2.0), atol=1e-5)
    state, m2 = step(state, params, batch)
    assert np.isfinite(float(m2["loss"]))


def test_unfrozen_matches_frozen_at_step0():
    """With zero-init adapters the frozen-tower fast path and the in-step
    tower path must produce identical ref logps => identical loss/margins."""
    _, params, state_f, step_f = _setup_dropout(frozen_vision=True)
    _, _, state_u, step_u = _setup_dropout(frozen_vision=False)
    batch = tiny_batch(jax.random.PRNGKey(4))
    _, mf = step_f(state_f, params, batch)
    _, mu = step_u(state_u, params, batch)
    np.testing.assert_allclose(
        float(mf["logps/chosen"]), float(mu["logps/chosen"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(mf["loss"]), float(mu["loss"]), atol=1e-6
    )
