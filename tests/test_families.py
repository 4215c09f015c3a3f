"""Every model family: config structure + scaled-down forward + DPO step."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vlrlhf_tpu.lora.lora import LoraConfig, init_lora
from vlrlhf_tpu.models.common import Ctx
from vlrlhf_tpu.models.registry import FAMILIES, resolve_family, scale_down
from vlrlhf_tpu.models.vlm import init_vlm_params, vlm_forward

ALL = sorted(FAMILIES)


def _batch(cfg, key, b=2, seq=48):
    k1, k2 = jax.random.split(key)
    n_tok = cfg.num_image_tokens
    ids = jax.random.randint(k1, (b, seq), 0, 200)
    pos = jnp.broadcast_to(jnp.arange(2, 2 + n_tok)[None], (b, n_tok)).astype(
        jnp.int32
    )
    ids = jax.vmap(lambda r, p: r.at[p].set(cfg.image_token_id))(ids, pos)
    img = cfg.vision.image_size
    pixels = jax.random.normal(k2, (b, 1, img, img, 3), jnp.float32)
    return ids, pos, pixels


@pytest.mark.parametrize("family", ALL)
def test_family_forward(family):
    fam = FAMILIES[family]
    cfg = scale_down(fam.make_config())
    params = init_vlm_params(cfg, jax.random.PRNGKey(0))
    ids, pos, pixels = _batch(cfg, jax.random.PRNGKey(1))
    kwargs = {}
    if cfg.qformer is not None:
        kwargs["qformer_ids"] = jax.random.randint(
            jax.random.PRNGKey(2), (ids.shape[0], 6), 0, cfg.qformer.vocab_size
        )
    logits, _ = vlm_forward(
        cfg, params, input_ids=ids, pixel_values=pixels, image_positions=pos,
        pad_mask=jnp.ones_like(ids, bool), **kwargs,
    )
    assert logits.shape == (*ids.shape, cfg.lm.vocab_size)
    assert np.isfinite(np.asarray(logits)).all()
    # image features actually influence the output
    logits2, _ = vlm_forward(
        cfg, params, input_ids=ids, pixel_values=pixels * 0.5,
        image_positions=pos, pad_mask=jnp.ones_like(ids, bool), **kwargs,
    )
    assert not np.allclose(np.asarray(logits), np.asarray(logits2))


@pytest.mark.parametrize("family", ALL)
def test_family_lora_targets_match(family):
    fam = FAMILIES[family]
    cfg = scale_down(fam.make_config())
    params = init_vlm_params(cfg, jax.random.PRNGKey(0))
    lcfg = LoraConfig(r=2, alpha=4.0, target_patterns=fam.lora_targets)
    adapters = init_lora(params, lcfg, jax.random.PRNGKey(1))
    n = len(jax.tree.leaves(adapters))
    assert n > 0, family
    # adapters must not touch vision / projector / qformer / lm_head
    from vlrlhf_tpu.core.partitioning import tree_paths

    for path, _ in tree_paths(adapters):
        assert path.startswith("lm/"), path
        assert "lm_head" not in path, path


def test_plora_gates_lora_to_image_positions():
    fam = FAMILIES["internlm_xc2"]
    cfg = scale_down(fam.make_config())
    assert cfg.plora
    params = init_vlm_params(cfg, jax.random.PRNGKey(0))
    ids, pos, pixels = _batch(cfg, jax.random.PRNGKey(1))
    lcfg = LoraConfig(r=2, alpha=4.0, target_patterns=fam.lora_targets)
    adapters = init_lora(params, lcfg, jax.random.PRNGKey(2))
    adapters = jax.tree.map(lambda x: x + 0.05, adapters)  # non-trivial delta

    base, _ = vlm_forward(
        cfg, params, input_ids=ids, pixel_values=pixels, image_positions=pos,
        pad_mask=jnp.ones_like(ids, bool),
    )
    plora_out, _ = vlm_forward(
        cfg, params, input_ids=ids, pixel_values=pixels, image_positions=pos,
        pad_mask=jnp.ones_like(ids, bool),
        ctx=Ctx(adapters=adapters, lora_scale=lcfg.scale),
    )
    # with PLoRA, adapters change outputs (image tokens feed all later pos)
    assert not np.allclose(np.asarray(base), np.asarray(plora_out))
    # ...but a text-only batch must be UNAFFECTED (mask gates deltas off)
    cfg_txt = cfg
    base_txt, _ = vlm_forward(
        cfg_txt, params, input_ids=ids, pad_mask=jnp.ones_like(ids, bool),
        image_positions=jnp.full_like(pos, -1), pixel_values=pixels,
    )
    plora_txt, _ = vlm_forward(
        cfg_txt, params, input_ids=ids, pad_mask=jnp.ones_like(ids, bool),
        image_positions=jnp.full_like(pos, -1), pixel_values=pixels,
        ctx=Ctx(adapters=adapters, lora_scale=lcfg.scale),
    )
    np.testing.assert_allclose(
        np.asarray(base_txt), np.asarray(plora_txt), atol=1e-5
    )


def test_resolve_family_by_architecture():
    assert resolve_family("LlavaForConditionalGeneration").name == "llava"
    assert resolve_family("QWenLMHeadModel").name == "qwen_vl"
    assert (
        resolve_family("LlavaNextForConditionalGeneration",
                       "mistralai/Mistral-7B-Instruct-v0.2").name
        == "llava_next_mistral"
    )
    assert (
        resolve_family("LlavaNextForConditionalGeneration",
                       "lmsys/vicuna-7b-v1.5").name
        == "llava_next_vicuna"
    )


def test_gqa_families_have_fewer_kv_heads():
    for name in ("llava_next_mistral", "internlm_xc2"):
        cfg = FAMILIES[name].make_config()
        assert cfg.lm.num_kv_heads < cfg.lm.num_heads
        small = scale_down(cfg)
        assert small.lm.num_kv_heads < small.lm.num_heads
