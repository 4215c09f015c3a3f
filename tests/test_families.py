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


def test_plora_base_adapters_gated_to_image_positions():
    """XC2 semantics (build_mlp.py:158-203 + peft wrapping):
    - the CHECKPOINT-BUILT-IN PLoRA (params['plora'] -> Ctx.base_adapters)
      applies only at image positions, in every forward (incl. adapter-off
      reference);
    - the NEW trainable LoRA applies at ALL positions (peft knows nothing of
      im_mask)."""
    fam = FAMILIES["internlm_xc2"]
    cfg = scale_down(fam.make_config())
    assert cfg.plora
    params = init_vlm_params(cfg, jax.random.PRNGKey(0))
    ids, pos, pixels = _batch(cfg, jax.random.PRNGKey(1))
    lcfg = LoraConfig(r=2, alpha=4.0, target_patterns=fam.lora_targets)
    pad = jnp.ones_like(ids, bool)

    # built-in PLoRA tree rides with params (the cli/loading.py attachment)
    plora = init_lora(params, lcfg, jax.random.PRNGKey(3))
    plora = jax.tree.map(lambda x: x + 0.05, plora)
    params_p = dict(params, plora=plora)

    base, _ = vlm_forward(
        cfg, params, input_ids=ids, pixel_values=pixels, image_positions=pos,
        pad_mask=pad,
    )
    with_plora, _ = vlm_forward(
        cfg, params_p, input_ids=ids, pixel_values=pixels,
        image_positions=pos, pad_mask=pad,
    )
    # built-in plora is active WITHOUT any ctx (reference/base forward too)
    assert not np.allclose(np.asarray(base), np.asarray(with_plora))
    # ...but gated off when no position is an image position
    no_img_pos = jnp.full_like(pos, -1)
    base_txt, _ = vlm_forward(
        cfg, params, input_ids=ids, pixel_values=pixels,
        image_positions=no_img_pos, pad_mask=pad,
    )
    plora_txt, _ = vlm_forward(
        cfg, params_p, input_ids=ids, pixel_values=pixels,
        image_positions=no_img_pos, pad_mask=pad,
    )
    np.testing.assert_allclose(
        np.asarray(base_txt), np.asarray(plora_txt), atol=1e-5
    )

    # trainable adapters are NOT masked: they change a no-image-position
    # forward too
    adapters = init_lora(params, lcfg, jax.random.PRNGKey(2))
    adapters = jax.tree.map(lambda x: x + 0.05, adapters)
    lora_txt, _ = vlm_forward(
        cfg, params, input_ids=ids, pixel_values=pixels,
        image_positions=no_img_pos, pad_mask=pad,
        ctx=Ctx(adapters=adapters, lora_scale=lcfg.scale),
    )
    assert not np.allclose(np.asarray(base_txt), np.asarray(lora_txt))


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
