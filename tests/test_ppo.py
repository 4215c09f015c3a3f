"""PPO: first-update invariants + reward learning on a synthetic signal."""

import jax
import jax.numpy as jnp
import numpy as np

from tests.test_dpo_step import tiny_vlm_config
from vlrlhf_tpu.generate.engine import GenerateConfig, Generator
from vlrlhf_tpu.lora.lora import LoraConfig, init_lora
from vlrlhf_tpu.models.vlm import init_vlm_params
from vlrlhf_tpu.train.ppo import (
    AdaptiveKLController,
    PPOConfig,
    make_ppo_fns,
    rollout_to_batch,
)
from vlrlhf_tpu.train.train_state import (
    OptimizerConfig,
    init_train_state,
    make_optimizer,
)

TARGET_TOKEN = 42
PAD = 0


def _setup():
    cfg = tiny_vlm_config()
    params = init_vlm_params(cfg, jax.random.PRNGKey(0))
    lcfg = LoraConfig(r=4, alpha=8.0, target_patterns=(r"lm/.*attn/", r"lm/.*mlp/"))
    trainable = {
        "adapters": init_lora(params, lcfg, jax.random.PRNGKey(1)),
        "v_head": {"kernel": jnp.zeros((cfg.lm.hidden_size, 1))},
    }
    ppo_cfg = PPOConfig(lora_scale=lcfg.scale, ppo_epochs=2, init_kl_coef=0.05)
    tx = make_optimizer(
        OptimizerConfig(learning_rate=8e-3, warmup_steps=1, total_steps=200,
                        max_grad_norm=1.0),
        trainable,
    )
    state = init_train_state(trainable, tx)
    stats_fn, update_fn = make_ppo_fns(cfg, ppo_cfg, tx)
    return cfg, params, lcfg, ppo_cfg, state, stats_fn, update_fn


def _prompts(b=8, ln=12, L=16):
    ids = jax.random.randint(jax.random.PRNGKey(5), (b, L), 5, 90)
    return {
        "input_ids": np.asarray(ids),
        "pad_mask": np.asarray(jnp.arange(L)[None, :] < ln),
        "prompt_lens": np.full((b,), ln, np.int32),
        "pixel_values": None,
        "image_positions": None,
    }


def _reward(batch):
    """Dense signal: fraction of response tokens with id < 64 (half vocab)."""
    ids, m = batch["input_ids"], batch["response_mask"]
    hits = ((ids < 64) & m).sum(1)
    return jnp.asarray(hits / np.maximum(m.sum(1), 1), jnp.float32)


def test_rollout_to_batch_explicit_lengths():
    """resp_lens from the engine must win over pad-sentinel counting: a
    SAMPLED token equal to pad_id mid-response is a real token, and the
    trailing eos must stay at the response end (the reward position)."""
    import numpy as np

    pb = {
        "input_ids": np.asarray([[7, 8, 9, 0, 0, 0]], np.int32),
        "prompt_lens": np.asarray([3], np.int32),
    }
    eos = 99
    # response: [5, PAD-as-real-token, eos] — 3 real tokens
    tokens = np.asarray([[5, 0, eos, 0, 0, 0]], np.int32)
    naive = rollout_to_batch(pb, tokens, 0)
    exact = rollout_to_batch(pb, tokens, 0, resp_lens=[3])
    # the fallback undercounts (2) and drops the eos from the splice
    assert naive["response_mask"].sum() == 2
    assert exact["response_mask"].sum() == 3
    row = exact["input_ids"][0]
    assert row[3] == 5 and row[4] == 0 and row[5] == eos
    assert exact["pad_mask"][0, :6].all()


def test_first_update_invariants():
    cfg, params, lcfg, ppo_cfg, state, stats_fn, update_fn = _setup()
    gen = Generator(
        cfg,
        GenerateConfig(max_new_tokens=6, do_sample=True, temperature=1.0,
                       pad_token_id=PAD),
        adapters=state.trainable["adapters"],
        lora_scale=lcfg.scale,
    )
    pb = _prompts()
    tokens = gen(params, pb, rng=jax.random.PRNGKey(3))
    batch = rollout_to_batch(pb, tokens, PAD)
    stats = stats_fn(params, state.trainable, batch, _reward(batch),
                     jnp.asarray(ppo_cfg.init_kl_coef))
    # adapters unchanged since rollout -> policy == old policy:
    state, m = update_fn(state, params, batch, stats)
    np.testing.assert_allclose(float(m["ppo/ratio_mean"]), 1.0, atol=1e-4)
    np.testing.assert_allclose(float(m["ppo/policy/clipfrac"]), 0.0, atol=1e-6)
    # whitened zero-mean advantages + ratio 1 -> pg loss ~ 0
    np.testing.assert_allclose(float(m["ppo/loss/policy"]), 0.0, atol=1e-3)
    assert np.isfinite(float(m["ppo/loss/value"]))


def test_ppo_increases_reward():
    cfg, params, lcfg, ppo_cfg, state, stats_fn, update_fn = _setup()
    kl_ctl = AdaptiveKLController(ppo_cfg)
    rewards_per_step = []
    rng = jax.random.PRNGKey(0)
    for it in range(10):
        gen = Generator(
            cfg,
            GenerateConfig(max_new_tokens=6, do_sample=True, temperature=1.0,
                           pad_token_id=PAD),
            adapters=state.trainable["adapters"],
            lora_scale=lcfg.scale,
        )
        pb = _prompts()
        rng, krng = jax.random.split(rng)
        tokens = gen(params, pb, rng=krng)
        batch = rollout_to_batch(pb, tokens, PAD)
        scores = _reward(batch)
        rewards_per_step.append(float(jnp.mean(scores)))
        stats = stats_fn(params, state.trainable, batch, scores,
                         jnp.asarray(kl_ctl.value))
        for _ in range(ppo_cfg.ppo_epochs):
            state, m = update_fn(state, params, batch, stats)
        kl_ctl.update(float(stats.kl), n_steps=len(scores))
        assert np.isfinite(float(m["ppo/loss/total"])), m
    # policy should shift toward rewarded tokens
    assert np.mean(rewards_per_step[-3:]) > np.mean(rewards_per_step[:3]), (
        rewards_per_step
    )


def test_ppo_with_separate_value_adapter():
    """use_value_adapter mode: distinct LoRA set for the value trunk."""
    cfg, params, lcfg, ppo_cfg, _, stats_fn, update_fn = _setup()
    trainable = {
        "adapters": init_lora(params, lcfg, jax.random.PRNGKey(1)),
        "value_adapters": init_lora(params, lcfg, jax.random.PRNGKey(5)),
        "v_head": {"kernel": jnp.zeros((cfg.lm.hidden_size, 1))},
    }
    from vlrlhf_tpu.train.train_state import (
        OptimizerConfig, init_train_state, make_optimizer,
    )
    from vlrlhf_tpu.train.ppo import make_ppo_fns

    tx = make_optimizer(
        OptimizerConfig(learning_rate=1e-3, warmup_steps=1, total_steps=20),
        trainable,
    )
    state = init_train_state(trainable, tx)
    stats_fn, update_fn = make_ppo_fns(cfg, ppo_cfg, tx)
    gen = Generator(
        cfg, GenerateConfig(max_new_tokens=4, do_sample=True, pad_token_id=PAD),
        adapters=state.trainable["adapters"], lora_scale=lcfg.scale,
    )
    pb = _prompts(b=4)
    tokens = gen(params, pb, rng=jax.random.PRNGKey(3))
    batch = rollout_to_batch(pb, tokens, PAD)
    stats = stats_fn(params, state.trainable, batch, _reward(batch),
                     jnp.asarray(0.05))
    state, m = update_fn(state, params, batch, stats)
    assert np.isfinite(float(m["ppo/loss/total"]))
    # value adapters received gradient (b matrices move away from zero init)
    va = state.trainable["value_adapters"]
    import jax as _jax
    flat = _jax.tree_util.tree_flatten_with_path(va)[0]
    b_moved = any(
        float(jnp.linalg.norm(g)) > 0
        for kp, g in flat if str(kp[-1]).endswith("'b')")
    )
    assert b_moved or any(float(jnp.linalg.norm(g)) > 0 for _, g in flat)


def test_minibatched_epochs_match_fullbatch_when_mb_equals_b():
    """minibatch_size == batch => ppo_update_epochs is exactly ppo_epochs
    sequential full-batch updates (TRL's loop degenerates to ours)."""
    from vlrlhf_tpu.train.ppo import ppo_update_epochs

    cfg, params, lcfg, ppo_cfg, state, stats_fn, update_fn = _setup()
    gen = Generator(
        cfg, GenerateConfig(max_new_tokens=4, do_sample=True, pad_token_id=PAD),
        adapters=state.trainable["adapters"], lora_scale=lcfg.scale,
    )
    pb = _prompts(b=4)
    tokens = gen(params, pb, rng=jax.random.PRNGKey(3))
    batch = rollout_to_batch(pb, tokens, PAD)
    stats = stats_fn(params, state.trainable, batch, _reward(batch),
                     jnp.asarray(0.05))

    # reference: manual epochs on a fresh state
    _, _, _, _, state_a, _, update_a = _setup()
    for _ in range(ppo_cfg.ppo_epochs):
        state_a, m_a = update_a(state_a, params, batch, stats)

    _, _, _, _, state_b, _, update_b = _setup()
    mb_cfg = PPOConfig(lora_scale=lcfg.scale, ppo_epochs=ppo_cfg.ppo_epochs,
                       minibatch_size=4)  # == b
    state_b, m_b = ppo_update_epochs(
        update_b, state_b, params, batch, stats, mb_cfg, seed=0
    )
    np.testing.assert_allclose(
        float(m_a["ppo/loss/total"]), float(m_b["ppo/loss/total"]), atol=1e-6
    )
    la = jax.tree_util.tree_leaves(state_a.trainable)
    lb = jax.tree_util.tree_leaves(state_b.trainable)
    for a, b in zip(la, lb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_minibatched_epochs_take_more_optimizer_steps():
    """minibatch_size b/2 => 2 optimizer steps per epoch (opt step count =
    ppo_epochs * n_minibatches), matching TRL's update cadence."""
    from vlrlhf_tpu.train.ppo import ppo_update_epochs

    cfg, params, lcfg, _, state, stats_fn, update_fn = _setup()
    gen = Generator(
        cfg, GenerateConfig(max_new_tokens=4, do_sample=True, pad_token_id=PAD),
        adapters=state.trainable["adapters"], lora_scale=lcfg.scale,
    )
    pb = _prompts(b=4)
    tokens = gen(params, pb, rng=jax.random.PRNGKey(3))
    batch = rollout_to_batch(pb, tokens, PAD)
    stats = stats_fn(params, state.trainable, batch, _reward(batch),
                     jnp.asarray(0.05))
    mb_cfg = PPOConfig(lora_scale=lcfg.scale, ppo_epochs=3, minibatch_size=2)
    state, m = ppo_update_epochs(
        update_fn, state, params, batch, stats, mb_cfg, seed=0
    )
    assert int(state.step) == 3 * 2  # epochs * minibatches
    assert np.isfinite(float(m["ppo/loss/total"]))


def test_skip_consensus_single_process():
    from vlrlhf_tpu.core.dist import any_process_failed

    assert any_process_failed(True) is True
    assert any_process_failed(False) is False


def test_running_moments_match_global_moments():
    """After any sequence of update() calls, RunningMoments.mean/std equal
    the moments of everything seen (TRL core.py RunningMoments semantics:
    parallel-variance batch merge, Bessel-corrected std)."""
    from vlrlhf_tpu.train.ppo import RunningMoments

    rng = np.random.default_rng(0)
    rm = RunningMoments()
    seen = []
    for n in (3, 8, 1, 16):
        xs = rng.normal(2.0, 3.0, size=n)
        rm.update(xs)
        seen.append(xs)
    allx = np.concatenate(seen)
    assert abs(rm.mean - allx.mean()) < 1e-9
    assert abs(rm.std - allx.std(ddof=1)) < 1e-9


def test_score_scaling_and_norm_pipeline():
    """TRL order: scale by running std (optionally shift by running mean),
    THEN clip. First batch with use_score_norm=True whitens to ~unit scale."""
    from vlrlhf_tpu.train.ppo import (PPOConfig, RunningMoments,
                                      preprocess_scores)

    scores = np.array([1.0, 3.0, 5.0, 7.0], np.float32)
    # scaling only: divide by running std of the batch
    cfg = PPOConfig(use_score_scaling=True)
    out = preprocess_scores(scores, cfg, RunningMoments())
    np.testing.assert_allclose(out, scores / scores.std(ddof=1), rtol=1e-5)
    # scaling + norm: whiten by running moments
    cfg = PPOConfig(use_score_scaling=True, use_score_norm=True)
    out = preprocess_scores(scores, cfg, RunningMoments())
    np.testing.assert_allclose(
        out, (scores - scores.mean()) / scores.std(ddof=1), rtol=1e-5
    )
    # clip applies after scaling
    cfg = PPOConfig(use_score_scaling=True, use_score_norm=True,
                    score_clip=0.5)
    out = preprocess_scores(scores, cfg, RunningMoments())
    assert np.abs(out).max() <= 0.5 + 1e-6
    # no flags: passthrough
    cfg = PPOConfig()
    np.testing.assert_allclose(
        preprocess_scores(scores, cfg, RunningMoments()), scores
    )


def test_chunked_token_logps_stats_and_update_match_dense():
    """PPOConfig.logits_chunk: rollout stats (logprobs/ref/advantages) and
    the inner update match the dense-logits path exactly (the scanned
    chunked lm_head changes memory, not math)."""
    cfg, params, lcfg, _, state, _, _ = _setup()
    gen = Generator(
        cfg, GenerateConfig(max_new_tokens=4, do_sample=True, pad_token_id=PAD),
        adapters=state.trainable["adapters"], lora_scale=lcfg.scale,
    )
    pb = _prompts(b=4)
    tokens = gen(params, pb, rng=jax.random.PRNGKey(3))
    batch = rollout_to_batch(pb, tokens, PAD)
    scores = _reward(batch)

    def run(chunk):
        ppo_cfg = PPOConfig(lora_scale=lcfg.scale, ppo_epochs=1,
                            init_kl_coef=0.05, logits_chunk=chunk)
        trainable = {
            "adapters": jax.tree.map(
                lambda x: x + 0.01 * jnp.ones_like(x),
                init_lora(params, lcfg, jax.random.PRNGKey(1)),
            ),
            "v_head": {"kernel": jnp.full((cfg.lm.hidden_size, 1), 0.01)},
        }
        tx = make_optimizer(
            OptimizerConfig(learning_rate=8e-3, warmup_steps=1,
                            total_steps=200, max_grad_norm=1.0),
            trainable,
        )
        st = init_train_state(trainable, tx)
        stats_fn, update_fn = make_ppo_fns(cfg, ppo_cfg, tx)
        stats = stats_fn(params, st.trainable, batch, scores,
                         jnp.asarray(0.05))
        st2, m = update_fn(st, params, batch, stats)
        return stats, st2, m

    s_dense, st_dense, m_dense = run(0)
    for chunk in (8, 6):  # divides and does-not-divide L
        s_ch, st_ch, m_ch = run(chunk)
        np.testing.assert_allclose(
            np.asarray(s_ch.logprobs), np.asarray(s_dense.logprobs),
            rtol=2e-5, atol=2e-6,
        )
        np.testing.assert_allclose(
            np.asarray(s_ch.ref_logprobs), np.asarray(s_dense.ref_logprobs),
            rtol=2e-5, atol=2e-6,
        )
        np.testing.assert_allclose(
            np.asarray(s_ch.advantages), np.asarray(s_dense.advantages),
            rtol=2e-4, atol=2e-5,
        )
        for k in m_dense:
            np.testing.assert_allclose(
                float(m_ch[k]), float(m_dense[k]), rtol=2e-4, atol=2e-6,
                err_msg=f"{k} (chunk={chunk})",
            )
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                a, b, rtol=2e-4, atol=1e-6
            ),
            st_ch.trainable, st_dense.trainable,
        )
