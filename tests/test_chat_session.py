"""Multi-turn serving: chunked prefill into a live cache (ChatSession).

The reference's sglang-server role includes session reuse; round 1's engine
asserted an empty cache per call. Golden check: turn-2 generation through
ChatSession.extend must equal one-shot generation over the concatenated
token stream (greedy, fixed token budget)."""

import jax
import jax.numpy as jnp
import numpy as np

from vlrlhf_tpu.generate.engine import ChatSession, GenerateConfig, Generator
from vlrlhf_tpu.models.lm.llama import LMConfig
from vlrlhf_tpu.models.vision.vit import ViTConfig
from vlrlhf_tpu.models.vlm import ProjectorConfig, VLMConfig, init_vlm_params


def _tiny_cfg():
    return VLMConfig(
        lm=LMConfig(
            vocab_size=128, hidden_size=32, intermediate_size=64,
            num_layers=2, num_heads=4, num_kv_heads=2, head_dim=8,
            dtype=jnp.float32, remat=False,
        ),
        vision=ViTConfig(
            image_size=16, patch_size=4, hidden_size=16, num_layers=1,
            num_heads=2, mlp_dim=32, dtype=jnp.float32, remat=False,
        ),
        projector=ProjectorConfig(kind="mlp2x_gelu", in_dim=16, out_dim=32),
        image_token_id=127, num_image_tokens=16,
    )


def test_two_turn_session_matches_oneshot():
    cfg = _tiny_cfg()
    params = init_vlm_params(cfg, jax.random.PRNGKey(0))
    b, l1, n1 = 2, 8, 4
    prompt = np.asarray(
        jax.random.randint(jax.random.PRNGKey(1), (b, l1), 5, 100)
    )
    batch1 = {
        "input_ids": prompt,
        "pad_mask": np.ones((b, l1), bool),
        "prompt_lens": np.full((b,), l1, np.int32),
        "pixel_values": None,
        "image_positions": None,
    }
    turn2 = np.asarray(
        jax.random.randint(jax.random.PRNGKey(2), (b, 3), 5, 100)
    )

    gen = Generator(cfg, GenerateConfig(max_new_tokens=n1, pad_token_id=0))
    session = ChatSession(gen, cache_len=64)
    out1 = np.asarray(session.start(params, batch1))
    assert (out1 != 0).all()  # no eos configured -> full budget generated

    # the final sampled token's kv was never computed; it leads the chunk
    new_ids = np.concatenate([out1[:, -1:], turn2], axis=1)
    out2 = np.asarray(
        session.extend(new_ids, np.full((b,), new_ids.shape[1], np.int32))
    )

    # one-shot oracle over the concatenated stream
    full = np.concatenate([prompt, out1, turn2], axis=1)
    batch_full = {
        "input_ids": full,
        "pad_mask": np.ones_like(full, bool),
        "prompt_lens": np.full((b,), full.shape[1], np.int32),
        "pixel_values": None,
        "image_positions": None,
    }
    gen2 = Generator(cfg, GenerateConfig(max_new_tokens=n1, pad_token_id=0))
    want = np.asarray(gen2(params, batch_full))
    np.testing.assert_array_equal(out2, want)


def test_three_turns_and_cache_full_error():
    cfg = _tiny_cfg()
    params = init_vlm_params(cfg, jax.random.PRNGKey(0))
    b = 2
    prompt = np.asarray(
        jax.random.randint(jax.random.PRNGKey(1), (b, 8), 5, 100)
    )
    batch1 = {
        "input_ids": prompt, "pad_mask": np.ones((b, 8), bool),
        "prompt_lens": np.full((b,), 8, np.int32),
        "pixel_values": None, "image_positions": None,
    }
    gen = Generator(cfg, GenerateConfig(max_new_tokens=4, pad_token_id=0))
    session = ChatSession(gen, cache_len=36)
    out1 = np.asarray(session.start(params, batch1))
    chunk = np.concatenate([out1[:, -1:], prompt[:, :2]], 1)
    out2 = session.extend(chunk, np.full((b,), 3, np.int32))  # 8+4+3+4 = 19
    assert np.asarray(out2).shape == (b, 4)
    out3 = session.extend(chunk, np.full((b,), 3, np.int32))  # 26
    assert np.asarray(out3).shape == (b, 4)
    import pytest

    with pytest.raises(ValueError, match="session cache full"):
        for _ in range(4):
            session.extend(chunk, np.full((b,), 3, np.int32))


def test_two_turn_session_int8_cache_runs():
    """Session reuse over an int8 KV cache: chunk prefill quantizes its
    writes and dequantizes the (small) session cache for the dense read."""
    cfg = _tiny_cfg()
    params = init_vlm_params(cfg, jax.random.PRNGKey(0))
    b, l1, n1 = 2, 8, 4
    prompt = np.asarray(
        jax.random.randint(jax.random.PRNGKey(1), (b, l1), 5, 100)
    )
    batch1 = {
        "input_ids": prompt,
        "pad_mask": np.ones((b, l1), bool),
        "prompt_lens": np.full((b,), l1, np.int32),
        "pixel_values": None,
        "image_positions": None,
    }
    gen = Generator(
        cfg,
        GenerateConfig(max_new_tokens=n1, pad_token_id=0,
                       kv_cache_dtype="int8"),
    )
    session = ChatSession(gen, cache_len=64)
    out1 = np.asarray(session.start(params, batch1))
    assert session.state["cache"]["k"].dtype == jnp.int8
    assert "k_scale" in session.state["cache"]
    turn2 = np.asarray(
        jax.random.randint(jax.random.PRNGKey(2), (b, 3), 5, 100)
    )
    new_ids = np.concatenate([out1[:, -1:], turn2], axis=1)
    out2 = np.asarray(
        session.extend(new_ids, np.full((b,), new_ids.shape[1], np.int32))
    )
    assert out2.shape == (b, n1)
    assert (out2 > 0).all() and (out2 < cfg.lm.vocab_size).all()
    # bf16-cache session as a soft oracle: same first next-turn token
    gen_bf = Generator(cfg, GenerateConfig(max_new_tokens=n1, pad_token_id=0))
    sess_bf = ChatSession(gen_bf, cache_len=64)
    out1_bf = np.asarray(sess_bf.start(params, batch1))
    np.testing.assert_array_equal(out1, out1_bf)
    out2_bf = np.asarray(
        sess_bf.extend(new_ids, np.full((b,), new_ids.shape[1], np.int32))
    )
    assert (out2[:, 0] == out2_bf[:, 0]).all()
