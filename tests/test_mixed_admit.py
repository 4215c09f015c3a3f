"""Mixed admission (chunked prefill + piggybacked decode, one dispatch):
generate/continuous._cb_mixed_admit_impl + models/lm/llama.lm_mixed_step.

The load-bearing property is that turning the mixed path on changes NOTHING
observable: greedy responses are identical to the classic scratch-cache
admit on workloads that force refills, uneven prompt buckets, early eos,
and per-request budgets. (The broader engine behavior — static-engine
parity, speculative bursts, sampled marginals, server integration — is
covered by test_continuous*.py / test_server.py, which run with mixed
admission ON by default.)"""

import numpy as np
import pytest

from vlrlhf_tpu.generate.continuous import ContinuousEngine, Request
from vlrlhf_tpu.generate.engine import GenerateConfig

pytestmark = pytest.mark.core


@pytest.fixture(scope="module")
def tiny():
    import jax

    from vlrlhf_tpu.models.registry import FAMILIES, scale_down
    from vlrlhf_tpu.models.vlm import init_vlm_params

    cfg = scale_down(FAMILIES["llava"].make_config())
    params = jax.jit(lambda k: init_vlm_params(cfg, k))(
        jax.random.PRNGKey(0)
    )
    return cfg, params


def _requests(cfg, n, rng, text_only=False, spread_lens=True):
    n_img = cfg.num_image_tokens
    img = cfg.vision.image_size
    reqs = []
    for i in range(n):
        text_len = int(rng.integers(3, 24)) if spread_lens else 8
        if text_only:
            ids = rng.integers(5, 100, (n_img + text_len,)).astype(np.int32)
            reqs.append(Request(input_ids=ids,
                                max_new_tokens=int(rng.integers(2, 9))))
            continue
        ids = rng.integers(5, 100, (n_img + text_len,)).astype(np.int32)
        pos = np.arange(1, 1 + n_img, dtype=np.int32)
        ids[pos] = cfg.image_token_id
        reqs.append(Request(
            input_ids=ids,
            pixel_values=rng.random((img, img, 3), dtype=np.float32),
            image_positions=pos,
            max_new_tokens=int(rng.integers(2, 9)),
        ))
    return reqs


def _run(cfg, params, reqs, mixed, **kw):
    gen_cfg = GenerateConfig(
        max_new_tokens=8, pad_token_id=0, eos_token_ids=(2,),
        **kw.pop("gen_kw", {}),
    )
    eng = ContinuousEngine(
        cfg, gen_cfg, n_slots=3, cache_len=128, prefill_chunk=16,
        max_prefill_group=2, mixed_admit=mixed, **kw,
    )
    assert eng.mixed_admit == mixed
    return eng.run(params, reqs)


def test_mixed_matches_classic_greedy_with_refills(tiny):
    """9 requests / 3 slots: refills, uneven prompts (different buckets in
    one admission round), per-request budgets."""
    cfg, params = tiny
    rng = np.random.default_rng(0)
    reqs = _requests(cfg, 9, rng)
    want = _run(cfg, params, reqs, mixed=False)
    got = _run(cfg, params, reqs, mixed=True)
    assert got == want
    assert any(len(o) > 0 for o in got)


def test_mixed_matches_classic_text_only(tiny):
    cfg, params = tiny
    rng = np.random.default_rng(1)
    reqs = _requests(cfg, 6, rng, text_only=True)
    want = _run(cfg, params, reqs, mixed=False)
    got = _run(cfg, params, reqs, mixed=True)
    assert got == want


def test_mixed_int8_kv_matches_classic(tiny):
    """int8 KV: quantize-at-write through the packed scatter must agree
    with the classic admit's quantize-through-scratch."""
    cfg, params = tiny
    rng = np.random.default_rng(2)
    reqs = _requests(cfg, 6, rng)
    kw = {"gen_kw": {"kv_cache_dtype": "int8"}}
    want = _run(cfg, params, reqs, mixed=False, **kw)
    got = _run(cfg, params, reqs, mixed=True, **kw)
    assert got == want


def test_mixed_speculative_hist_consistency(tiny):
    """Spec engine with mixed admits: the device-side token history written
    during mixed admission must agree with what spec bursts expect —
    greedy output still matches the plain engine."""
    cfg, params = tiny
    rng = np.random.default_rng(3)
    reqs = _requests(cfg, 6, rng)
    want = _run(cfg, params, reqs, mixed=False)
    got = _run(cfg, params, reqs, mixed=True, speculative_k=3)
    assert got == want


def test_mixed_chunk_cap_divides_bucket(tiny):
    """bf16-KV engines cap the mixed chunk at 64; the cap must divide the
    prompt bucket so every prompt token is consumed exactly once."""
    cfg, params = tiny
    gen_cfg = GenerateConfig(max_new_tokens=4, pad_token_id=0)
    eng = ContinuousEngine(cfg, gen_cfg, n_slots=2, cache_len=256,
                           prefill_chunk=96)
    assert eng.mixed_chunk <= 32 and 96 % eng.mixed_chunk == 0
    eng128 = ContinuousEngine(
        cfg, GenerateConfig(max_new_tokens=4, pad_token_id=0,
                            kv_cache_dtype="int8"),
        n_slots=2, cache_len=256, prefill_chunk=128,
    )
    assert eng128.mixed_chunk == 64 and 128 % eng128.mixed_chunk == 0
    engbf = ContinuousEngine(cfg, gen_cfg, n_slots=2, cache_len=256,
                             prefill_chunk=128)
    assert engbf.mixed_chunk == 32
