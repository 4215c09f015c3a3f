"""Exact-greedy speculative decoding (generate/speculative.py).

The whole contract is ONE invariant: tokens are bit-identical to the plain
engine's greedy decode — speculation may only change how many dispatches
produce them.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_dpo_step import IMG_TOKEN, N_IMG_TOKENS, tiny_vlm_config
from vlrlhf_tpu.generate.engine import GenerateConfig, Generator
from vlrlhf_tpu.generate.speculative import (
    SpeculativeGenerator,
    prompt_lookup_draft,
)
from vlrlhf_tpu.models.vlm import init_vlm_params


def test_prompt_lookup_draft_unit():
    # bigram (3, 4) occurred earlier; continuation is [5, 6, 7]
    src = [1, 2, 3, 4, 5, 6, 7, 8, 3, 4]
    assert prompt_lookup_draft(src, 3, 0) == [5, 6, 7]
    # latest occurrence wins
    src2 = [3, 4, 9, 1, 3, 4, 7, 7, 3, 4]
    assert prompt_lookup_draft(src2, 2, 0) == [7, 7]
    # no match -> repeat-last fallback
    assert prompt_lookup_draft([1, 2, 3], 2, 0) == [3, 3]
    # continuation shorter than k -> pad-filled
    assert prompt_lookup_draft([5, 6, 9, 5, 6], 3, 0) == [9, 5, 6]
    assert prompt_lookup_draft([], 2, 0) == [0, 0]


def _batch(lens, L, seed, with_image=True, n_rows=None):
    b = n_rows or len(lens)
    ids = jax.random.randint(jax.random.PRNGKey(seed), (b, L), 5, 90)
    img_pos = None
    pixels = None
    if with_image:
        img_pos = jnp.broadcast_to(
            jnp.arange(2, 2 + N_IMG_TOKENS)[None], (b, N_IMG_TOKENS)
        ).astype(jnp.int32)
        ids = jax.vmap(lambda r, p: r.at[p].set(IMG_TOKEN))(ids, img_pos)
        pixels = jax.random.normal(
            jax.random.PRNGKey(seed + 1), (b, 1, 16, 16, 3)
        )
    return {
        "input_ids": ids,
        "pad_mask": jnp.arange(L)[None, :] < jnp.asarray(lens)[:, None],
        "prompt_lens": jnp.asarray(lens, jnp.int32),
        "pixel_values": pixels,
        "image_positions": img_pos,
    }


@pytest.mark.parametrize("k", [1, 3, 7])
def test_speculative_matches_plain_greedy(k):
    cfg = tiny_vlm_config()
    params = init_vlm_params(cfg, jax.random.PRNGKey(0))
    gcfg = GenerateConfig(max_new_tokens=10, pad_token_id=0)
    batch = _batch([20, 26], 32, seed=7)
    want = np.asarray(Generator(cfg, gcfg)(params, batch))
    spec = SpeculativeGenerator(cfg, gcfg, k_draft=k)
    got = spec(params, batch)
    np.testing.assert_array_equal(got, want)
    assert spec.verify_calls >= 1


def test_speculative_eos_early_stop_matches():
    cfg = tiny_vlm_config()
    params = init_vlm_params(cfg, jax.random.PRNGKey(1))
    batch = _batch([12, 16], 16, seed=3, with_image=False)
    # find what greedy emits, then make its 3rd token the eos
    probe = np.asarray(
        Generator(cfg, GenerateConfig(max_new_tokens=8, pad_token_id=0))(
            params, batch
        )
    )
    eos = int(probe[0, 2])
    gcfg = GenerateConfig(
        max_new_tokens=8, pad_token_id=0, eos_token_ids=(eos,)
    )
    want = np.asarray(Generator(cfg, gcfg)(params, batch))
    got = SpeculativeGenerator(cfg, gcfg, k_draft=4)(params, batch)
    np.testing.assert_array_equal(got, want)


def test_speculative_accepts_on_repetitive_model():
    """Zero lm_head -> constant greedy token -> the repeat-last draft is
    always right -> each verify emits k+1 tokens: dispatch count collapses
    versus one-token-per-step decoding."""
    cfg = tiny_vlm_config()
    params = init_vlm_params(cfg, jax.random.PRNGKey(2))
    params["lm"]["lm_head"]["kernel"] = jnp.zeros_like(
        params["lm"]["lm_head"]["kernel"]
    )
    n_new, k = 16, 7
    gcfg = GenerateConfig(max_new_tokens=n_new, pad_token_id=0)
    batch = _batch([10], 16, seed=5, with_image=False)
    want = np.asarray(Generator(cfg, gcfg)(params, batch))
    spec = SpeculativeGenerator(cfg, gcfg, k_draft=k)
    got = spec(params, batch)
    np.testing.assert_array_equal(got, want)
    # 15 post-prefill tokens at k+1=8 per accepted verify -> 2 dispatches
    assert spec.verify_calls <= 3, spec.verify_calls


def test_speculative_sampled_topk1_matches_greedy():
    """top_k=1 sampling is argmax regardless of rng, so the sampled
    speculative path (acceptance coin flips + residual resampling included)
    must reproduce plain greedy bit-exactly — a deterministic end-to-end
    check of the whole sampled code path."""
    cfg = tiny_vlm_config()
    params = init_vlm_params(cfg, jax.random.PRNGKey(0))
    greedy = GenerateConfig(max_new_tokens=10, pad_token_id=0)
    sampled = dataclasses.replace(
        greedy, do_sample=True, top_k=1, temperature=0.7
    )
    batch = _batch([20, 26], 32, seed=7)
    want = np.asarray(Generator(cfg, greedy)(params, batch))
    spec = SpeculativeGenerator(cfg, sampled, k_draft=4)
    got = spec(params, batch, rng=jax.random.PRNGKey(123))
    np.testing.assert_array_equal(got, want)
    assert spec.verify_calls >= 1


def test_speculative_sampled_eos_and_shapes():
    """Sampled mode interface contract: (B, n_new) int32, an eos token is
    written then the row pads out, and non-finished rows carry no pads
    before their last emitted token."""
    cfg = tiny_vlm_config()
    params = init_vlm_params(cfg, jax.random.PRNGKey(1))
    gcfg = GenerateConfig(
        max_new_tokens=8, pad_token_id=0, do_sample=True,
        temperature=0.8, top_k=12, eos_token_ids=(9, 11),
    )
    batch = _batch([12, 16], 16, seed=3, with_image=False)
    out = SpeculativeGenerator(cfg, gcfg, k_draft=3)(
        params, batch, rng=jax.random.PRNGKey(5)
    )
    assert out.shape == (2, 8) and out.dtype == np.int32
    for row in out:
        hits = np.nonzero(np.isin(row, (9, 11)))[0]
        if hits.size:
            assert (row[hits[0] + 1:] == 0).all()


@pytest.mark.slow
def test_speculative_sampled_marginals_match_plain():
    """Lossless speculative sampling: each emitted token is marginally
    distributed exactly like the plain engine's sampled decode. Empirical
    check — N independently-seeded runs of both engines on the same prompt,
    per-position total-variation distance between the histograms must be
    within sampling noise (and far from the distance either histogram has
    to a deliberately-wrong one)."""
    cfg = tiny_vlm_config()
    params = init_vlm_params(cfg, jax.random.PRNGKey(4))
    gcfg = GenerateConfig(
        max_new_tokens=3, pad_token_id=0, do_sample=True,
        temperature=0.5, top_k=5,
    )
    batch = _batch([14], 16, seed=9, with_image=False)
    n_trials = 300
    plain = Generator(cfg, gcfg)
    spec = SpeculativeGenerator(cfg, gcfg, k_draft=2)
    got_p = np.stack([
        np.asarray(plain(params, batch, rng=jax.random.PRNGKey(1000 + t)))[0]
        for t in range(n_trials)
    ])
    got_s = np.stack([
        spec(params, batch, rng=jax.random.PRNGKey(5000 + t))[0]
        for t in range(n_trials)
    ])
    v = cfg.lm.vocab_size

    def _tv(a, b, pos):
        ha = np.bincount(a[:, pos], minlength=v) / len(a)
        hb = np.bincount(b[:, pos], minlength=v) / len(b)
        return 0.5 * np.abs(ha - hb).sum()

    half = n_trials // 2
    for pos in range(3):
        # self-calibrated: the noise floor is the TV between two
        # independent halves of the PLAIN runs (N/2 each); cross-engine TV
        # at full N has ~0.7x that expected noise. 1.8x the floor (+0.03)
        # is a ~2.5-sigma-equivalent margin, while a wrong residual
        # distribution (e.g. not excluding the draft token) sits far above.
        floor = _tv(got_p[:half], got_p[half:], pos)
        cross = _tv(got_p, got_s, pos)
        assert cross < 1.8 * floor + 0.03, (
            f"pos {pos}: cross-tv={cross:.3f} floor={floor:.3f}"
        )


@pytest.mark.slow
def test_speculative_fuzz_differential():
    """Randomized differential: random tiny models, prompt lengths, k, and
    eos sets (drawn from actual greedy outputs so they trigger mid-stream)
    — every configuration must reproduce the plain engine's tokens."""
    rng = np.random.default_rng(0)
    for trial in range(8):
        cfg = tiny_vlm_config()
        params = init_vlm_params(cfg, jax.random.PRNGKey(100 + trial))
        L = int(rng.integers(8, 24))
        lens = sorted(
            int(rng.integers(4, L + 1)) for _ in range(2)
        )
        n_new = int(rng.integers(2, 12))
        batch = _batch(lens, L, seed=200 + trial, with_image=trial % 2 == 0)
        probe = np.asarray(
            Generator(
                cfg, GenerateConfig(max_new_tokens=n_new, pad_token_id=0)
            )(params, batch)
        )
        eos_pool = [int(t) for t in probe.flatten() if t != 0]
        eos = tuple(
            set(rng.choice(eos_pool, size=min(2, len(eos_pool))).tolist())
        ) if eos_pool and trial % 3 else ()
        gcfg = GenerateConfig(
            max_new_tokens=n_new, pad_token_id=0, eos_token_ids=eos
        )
        want = np.asarray(Generator(cfg, gcfg)(params, batch))
        k = int(rng.integers(1, 9))
        got = SpeculativeGenerator(cfg, gcfg, k_draft=k)(params, batch)
        np.testing.assert_array_equal(
            got, want, err_msg=f"trial {trial} k={k} eos={eos} n={n_new}"
        )


def test_eval_runner_speculative_path():
    """EvalRunner(speculative_k>0) serves run_vqa with identical responses
    to the plain engine."""
    from tests.test_eval import fake_image_loader, make_processor
    from vlrlhf_tpu.data.collators import CollatorConfig
    from vlrlhf_tpu.eval.harness import EvalRunner

    cfg = tiny_vlm_config()
    params = init_vlm_params(cfg, jax.random.PRNGKey(0))

    def runner(spec_k):
        return EvalRunner(
            model_cfg=cfg,
            params=params,
            processor=make_processor(num_image_tokens=16),
            gen_cfg=GenerateConfig(max_new_tokens=6, pad_token_id=0),
            collator_cfg=CollatorConfig(
                pad_token_id=0, bucket_multiple=32, image_size=16
            ),
            image_loader=fake_image_loader,
            speculative_k=spec_k,
        )

    rows = [
        {"question": "is there a dog?", "img": None},
        {"question": "what color is the sky in the picture?", "img": None},
    ]
    a = runner(0).run_vqa(rows, batch_size=2)
    b = runner(4).run_vqa(rows, batch_size=2)
    assert [r["response"] for r in a] == [r["response"] for r in b]
