"""Continuous-batching engine vs the static Generator (greedy parity) +
slot-refill scheduling behavior."""

import jax
import numpy as np
import pytest

from tests.test_dpo_step import IMG_TOKEN, N_IMG_TOKENS, tiny_vlm_config
from vlrlhf_tpu.generate.continuous import ContinuousEngine, Request
from vlrlhf_tpu.generate.engine import GenerateConfig, Generator
from vlrlhf_tpu.models.vlm import init_vlm_params


def _requests(n=5, seed=0):
    rng = np.random.default_rng(seed)
    reqs = []
    for i in range(n):
        plen = int(rng.integers(22, 34))
        ids = rng.integers(4, 100, (plen,)).astype(np.int32)
        pos = np.arange(2, 2 + N_IMG_TOKENS, dtype=np.int32)
        ids[pos] = IMG_TOKEN
        pixels = rng.integers(0, 255, (16, 16, 3)).astype(np.float32) / 255.0
        reqs.append(
            Request(
                input_ids=ids,
                pixel_values=pixels,
                image_positions=pos,
                max_new_tokens=int(rng.integers(3, 9)),
            )
        )
    return reqs


def _generator_expected(cfg, params, reqs, max_new=10, eos=()):
    """Per-request greedy reference via the static engine (B=1)."""
    gen = Generator(
        cfg, GenerateConfig(max_new_tokens=max_new, pad_token_id=-1,
                            eos_token_ids=tuple(eos))
    )
    outs = []
    for r in reqs:
        L = len(r.input_ids)
        batch = {
            "input_ids": r.input_ids[None],
            "pad_mask": np.ones((1, L), bool),
            "prompt_lens": np.asarray([L], np.int32),
            "pixel_values": r.pixel_values[None, None],
            "image_positions": r.image_positions[None],
        }
        toks = np.asarray(gen(params, batch))[0]
        # pad_token_id=-1 cannot be sampled, so -1 unambiguously marks
        # past-eos slots (vocab id 0 is a legitimate token)
        keep = []
        for t in toks:
            if t == -1:
                break
            keep.append(int(t))
        outs.append(keep)
    return outs


def test_continuous_matches_static_greedy():
    """2 slots serving 5 mixed-length requests with per-request budgets:
    responses must equal the static engine's greedy output truncated to each
    budget — across refills and chunked prompt admission."""
    cfg = tiny_vlm_config()
    params = init_vlm_params(cfg, jax.random.PRNGKey(0))
    reqs = _requests()
    want_full = _generator_expected(cfg, params, reqs, max_new=10)

    eng = ContinuousEngine(
        cfg, GenerateConfig(max_new_tokens=10, pad_token_id=-1),
        n_slots=2, cache_len=64, prefill_chunk=8,
    )
    got = eng.run(params, reqs)
    for g, w, r in zip(got, want_full, reqs):
        assert g == w[: r.max_new_tokens], (g, w, r.max_new_tokens)


def test_continuous_eos_frees_slot():
    cfg = tiny_vlm_config()
    params = init_vlm_params(cfg, jax.random.PRNGKey(0))
    reqs = _requests(2, seed=3)
    for r in reqs:
        r.max_new_tokens = 8
    want = _generator_expected(cfg, params, reqs, max_new=8)
    assert len(want[0]) >= 3
    eos = want[0][2]  # third token of request 0 becomes the stop token
    want_eos = _generator_expected(cfg, params, reqs, max_new=8, eos=(eos,))
    # the static engine records the eos token itself; the continuous engine
    # returns only the useful tokens before it
    want_eos = [w[:-1] if w and w[-1] == eos else w for w in want_eos]

    eng = ContinuousEngine(
        cfg, GenerateConfig(max_new_tokens=8, pad_token_id=-1,
                            eos_token_ids=(eos,)),
        n_slots=1, cache_len=64, prefill_chunk=16,
    )
    got = eng.run(params, reqs)
    for g, w in zip(got, want_eos):
        assert g == w, (g, w)


def test_continuous_text_only_requests():
    """Rows without images (feat_pos = -1) must not merge anything."""
    cfg = tiny_vlm_config()
    params = init_vlm_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(7)
    reqs = [
        Request(input_ids=rng.integers(4, 100, (12 + 3 * i,)).astype(np.int32),
                max_new_tokens=4)
        for i in range(3)
    ]
    want = _generator_expected_text(cfg, params, reqs)
    eng = ContinuousEngine(
        cfg, GenerateConfig(max_new_tokens=4, pad_token_id=-1),
        n_slots=2, cache_len=48, prefill_chunk=8,
    )
    got = eng.run(params, reqs)
    assert got == want


def _generator_expected_text(cfg, params, reqs):
    gen = Generator(cfg, GenerateConfig(max_new_tokens=4, pad_token_id=-1))
    outs = []
    for r in reqs:
        L = len(r.input_ids)
        batch = {
            "input_ids": r.input_ids[None],
            "pad_mask": np.ones((1, L), bool),
            "prompt_lens": np.asarray([L], np.int32),
            "pixel_values": None,
            "image_positions": None,
        }
        toks = np.asarray(gen(params, batch))[0]
        outs.append([int(t) for t in toks if t != -1])
    return outs


def test_eval_runner_continuous_matches_batched():
    """EvalRunner(continuous_batching=True) reproduces the batched path's
    greedy responses on a small VQA set (incl. image + text-only rows)."""
    import dataclasses as _dc

    from tests.test_eval import fake_image_loader, make_processor
    from vlrlhf_tpu.data.collators import CollatorConfig
    from vlrlhf_tpu.eval.harness import EvalRunner

    cfg = tiny_vlm_config()
    params = init_vlm_params(cfg, jax.random.PRNGKey(0))
    processor = make_processor(num_image_tokens=16)
    base = dict(
        model_cfg=cfg, params=params, processor=processor,
        gen_cfg=GenerateConfig(max_new_tokens=4, pad_token_id=0),
        collator_cfg=CollatorConfig(
            pad_token_id=0, bucket_multiple=32, image_size=16
        ),
        image_loader=fake_image_loader,
    )
    rows = [
        {"question": "what color is the square?", "img": "a.jpg"},
        {"question": "describe the scene in detail", "img": "b.jpg"},
        {"question": "just text, no image here"},
        {"question": "another question about the image", "img": "c.jpg"},
    ]
    want = EvalRunner(**base).run_vqa(rows, batch_size=2)
    got = EvalRunner(**base, continuous_batching=True).run_vqa(
        rows, batch_size=2
    )
    assert [r["response"] for r in got] == [r["response"] for r in want]
