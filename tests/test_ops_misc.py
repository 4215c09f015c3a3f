"""Coverage for smaller ops: dynamic-NTK RoPE, image preprocess, sharding
rule rank handling, sampling."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from vlrlhf_tpu.core.partitioning import ShardingRules, default_lm_rules
from vlrlhf_tpu.ops.image import ImagePreprocessConfig, preprocess_images
from vlrlhf_tpu.ops.rope import RopeConfig, apply_rope, rope_frequencies
from vlrlhf_tpu.ops.sampling import sample_tokens


def test_dynamic_ntk_rope_inactive_within_trained_context():
    """Qwen's dynamic NTK only rescales past max_position_embeddings
    (models/QwenVL/modeling_qwen.py:605-614)."""
    base = RopeConfig(head_dim=16, base=10000.0, max_position_embeddings=64)
    dyn = RopeConfig(
        head_dim=16, base=10000.0, scaling_type="dynamic",
        scaling_factor=1.0, max_position_embeddings=64,
    )
    pos = jnp.arange(32)[None]
    c1, s1 = rope_frequencies(base, pos, seq_len=32)
    c2, s2 = rope_frequencies(dyn, pos, seq_len=32)
    np.testing.assert_allclose(c1, c2, atol=1e-7)

    # beyond the trained context, frequencies must differ (NTK rescale)
    pos_long = jnp.arange(128)[None]
    c3, _ = rope_frequencies(base, pos_long, seq_len=128)
    c4, _ = rope_frequencies(dyn, pos_long, seq_len=128)
    assert not np.allclose(np.asarray(c3), np.asarray(c4))


def test_rope_rotation_preserves_norm():
    cfg = RopeConfig(head_dim=8)
    q = jax.random.normal(jax.random.PRNGKey(0), (1, 6, 2, 8))
    k = jax.random.normal(jax.random.PRNGKey(1), (1, 6, 2, 8))
    cos, sin = rope_frequencies(cfg, jnp.arange(6)[None])
    q2, k2 = apply_rope(q, k, cos, sin)
    np.testing.assert_allclose(
        jnp.linalg.norm(q2, axis=-1), jnp.linalg.norm(q, axis=-1),
        atol=1e-5, rtol=1e-5,
    )


def test_preprocess_images_normalization():
    cfg = ImagePreprocessConfig(size=8, mean=(0.5, 0.5, 0.5), std=(0.25, 0.25, 0.25))
    imgs = jnp.full((2, 16, 16, 3), 255, jnp.uint8)
    out = preprocess_images(imgs, cfg)
    assert out.shape == (2, 8, 8, 3)
    np.testing.assert_allclose(np.asarray(out), (1.0 - 0.5) / 0.25, atol=1e-5)


def test_sharding_rules_rank_padding():
    rules = default_lm_rules()
    # 3D scanned kernel gets a leading None prepended
    spec = rules.spec_for("lm/layers_scanned/attn/wq/kernel", ndim=3)
    assert spec == P(None, "fsdp", "model")
    # bias (1D) under a matched module falls back to replicated
    spec = rules.spec_for("lm/layers_scanned/attn/wq/bias", ndim=2)
    assert spec == P(None, None)
    # unmatched leaf replicated at its rank
    spec = rules.spec_for("lm/norm/weight", ndim=1)
    assert spec == P(None)


def test_sharding_rules_reject_overlong_spec():
    rules = ShardingRules([(r"x", P("fsdp", "model"))])
    import pytest

    with pytest.raises(ValueError):
        rules.spec_for("x", ndim=1)


def test_sampling_top_k_restricts_support():
    logits = jnp.asarray([[0.0, 1.0, 2.0, 3.0]] * 64)
    toks = np.asarray(
        sample_tokens(logits, jax.random.PRNGKey(0), top_k=2, do_sample=True)
    )
    assert set(toks.tolist()) <= {2, 3}


def test_sampling_top_p_keeps_top1():
    logits = jnp.asarray([[10.0, 0.0, 0.0, 0.0]] * 16)
    toks = np.asarray(
        sample_tokens(logits, jax.random.PRNGKey(1), top_p=0.1, do_sample=True)
    )
    assert (toks == 0).all()


def test_greedy_is_argmax():
    logits = jax.random.normal(jax.random.PRNGKey(2), (8, 32))
    toks = sample_tokens(logits, jax.random.PRNGKey(3), do_sample=False)
    np.testing.assert_array_equal(np.asarray(toks), np.argmax(logits, -1))
