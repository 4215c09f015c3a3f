"""LLaVA-Next anyres: geometry plan + packing parity vs HF transformers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from vlrlhf_tpu.models.anyres import (
    NEWLINE_IDX,
    anyres_plan,
    select_best_resolution,
    tiles_from_image,
    unpadded_feature_dims,
)

torch.manual_seed(0)

PINPOINTS = ((28, 56), (56, 28), (56, 56))


def test_select_best_resolution_matches_hf():
    from transformers.image_processing_utils import select_best_resolution as hf_sbr

    for size in [(40, 30), (30, 40), (100, 20), (28, 28), (333, 222)]:
        want = tuple(hf_sbr(size, [list(p) for p in PINPOINTS]))
        got = select_best_resolution(size, PINPOINTS)
        assert got == want, (size, got, want)


def test_plan_token_count():
    plan = anyres_plan((40, 30), PINPOINTS, tile_size=28, tile_grid=2)
    assert plan["best_resolution"] == (56, 56)
    assert plan["n_tiles"] == 5
    # base 4 + 4 rows * (4 cols + newline): pad=(4-3)//2=0 -> nothing removed
    # (HF unpad slices pad:current-pad symmetrically)
    assert plan["n_tokens"] == 4 + 4 * (4 + 1)
    g = plan["gather"]
    assert (g[:4] == np.arange(4)).all()  # base tile verbatim
    assert (g == NEWLINE_IDX).sum() == 4  # one newline per row


def test_tiles_from_image_shapes():
    img = np.random.default_rng(0).integers(0, 255, (40, 30, 3), np.uint8)
    plan = anyres_plan((40, 30), PINPOINTS, tile_size=28, tile_grid=2)
    tiles = tiles_from_image(img, plan, tile_size=28)
    assert tiles.shape == (5, 28, 28, 3)
    assert tiles[0].any()  # base resized image nonzero


def _tiny_llava_next():
    from transformers import LlavaNextConfig, LlavaNextForConditionalGeneration

    cfg = LlavaNextConfig(
        vision_config=dict(
            hidden_size=32, intermediate_size=64, num_hidden_layers=3,
            num_attention_heads=4, image_size=28, patch_size=14,
        ),
        text_config=dict(
            model_type="llama", vocab_size=128, hidden_size=48,
            intermediate_size=96, num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=4, rms_norm_eps=1e-5,
            max_position_embeddings=256,
        ),
        image_token_index=99,
        vision_feature_layer=-2,
        vision_feature_select_strategy="default",
        image_grid_pinpoints=[list(p) for p in PINPOINTS],
    )
    return LlavaNextForConditionalGeneration(cfg).eval().float()


def test_llava_next_anyres_parity():
    from vlrlhf_tpu.models.lm.llama import LMConfig
    from vlrlhf_tpu.models.vision.vit import ViTConfig
    from vlrlhf_tpu.models.vlm import ProjectorConfig, VLMConfig, vlm_forward
    from vlrlhf_tpu.utils.hf_port import port_llava

    hf = _tiny_llava_next()
    orig_size = (40, 30)  # (h, w)
    plan = anyres_plan(orig_size, PINPOINTS, tile_size=28, tile_grid=2)
    n_tok = plan["n_tokens"]

    b = 1
    pixels = torch.randn(b, plan["n_tiles"], 3, 28, 28)
    s = n_tok + 8
    ids = torch.randint(0, 90, (b, s))
    start = 2
    ids[:, start : start + n_tok] = 99
    with torch.no_grad():
        want = hf(
            input_ids=ids,
            pixel_values=pixels,
            image_sizes=torch.tensor([list(orig_size)]),
        ).logits.numpy()

    cfg = VLMConfig(
        lm=LMConfig(
            vocab_size=128, hidden_size=48, intermediate_size=96, num_layers=2,
            num_heads=4, num_kv_heads=4, rms_eps=1e-5, dtype=jnp.float32,
            remat=False,
        ),
        vision=ViTConfig(
            image_size=28, patch_size=14, hidden_size=32, num_layers=3,
            num_heads=4, mlp_dim=64, act="quick_gelu", feature_layer=-2,
            drop_class_token=True, dtype=jnp.float32, remat=False,
        ),
        projector=ProjectorConfig(kind="mlp2x_gelu", in_dim=32, out_dim=48),
        image_token_id=99,
        num_image_tokens=4,
        family="llava_next_vicuna",
    )
    params = port_llava(
        {k: v.detach().numpy() for k, v in hf.state_dict().items()}, cfg
    )
    assert "image_newline" in params

    img_pos = jnp.asarray(
        np.arange(start, start + n_tok)[None], jnp.int32
    )
    got, _ = vlm_forward(
        cfg,
        params,
        input_ids=jnp.asarray(ids.numpy()),
        pixel_values=jnp.asarray(pixels.numpy().transpose(0, 1, 3, 4, 2)),
        image_positions=img_pos,
        anyres_gather=jnp.asarray(plan["gather"][None]),
        pad_mask=jnp.ones((b, s), bool),
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-4, rtol=5e-3)


def test_anyres_dpo_step_end_to_end(tmp_path):
    """Full llava-next anyres training path: images -> plans -> collator ->
    jitted DPO step."""
    import dataclasses

    from PIL import Image

    from vlrlhf_tpu.data.collators import CollatorConfig, DPOCollator
    from vlrlhf_tpu.lora.lora import LoraConfig, init_lora
    from vlrlhf_tpu.models.registry import FAMILIES, scale_down
    from vlrlhf_tpu.models.vlm import init_vlm_params
    from vlrlhf_tpu.train.dpo import DPOConfig, make_dpo_step
    from vlrlhf_tpu.train.train_state import (
        OptimizerConfig, init_train_state, make_optimizer,
    )

    # scaled-down llava-next: tile 16, patch 4 -> tile_grid 4
    cfg = scale_down(FAMILIES["llava_next_vicuna"].make_config())
    params = init_vlm_params(cfg, jax.random.PRNGKey(0))
    # anyres needs the newline embedding (ported from HF normally)
    params["image_newline"] = {
        "embedding": jax.random.normal(jax.random.PRNGKey(9), (cfg.lm.hidden_size,))
    }

    imgs = []
    for i, (h, w) in enumerate([(24, 18), (20, 30)]):
        p = str(tmp_path / f"i{i}.jpg")
        Image.fromarray(
            np.random.default_rng(i).integers(0, 255, (h, w, 3), np.uint8)
        ).save(p)
        imgs.append(p)

    # tokenizer vocab must fit the scaled-down model's 256-token vocab
    from vlrlhf_tpu.data.chat_templates import TEMPLATES
    from vlrlhf_tpu.data.processor import ProcessorConfig, VLProcessor
    from vlrlhf_tpu.data.tokenizer import ToyTokenizer

    proc = VLProcessor(
        ToyTokenizer(vocab_size=250),
        TEMPLATES["llava"],
        ProcessorConfig(num_image_tokens=16, image_token="<image>",
                        image_token_id=3, max_length=64, max_prompt_length=48),
    )
    ccfg = CollatorConfig(
        pad_token_id=0, bucket_multiple=32, image_size=cfg.vision.image_size,
        anyres=True, tile_grid=cfg.vision.image_size // cfg.vision.patch_size,
        grid_pinpoints=((16, 32), (32, 16), (32, 32)),
    )
    coll = DPOCollator(proc, ccfg)
    rows = [
        proc.tokenize_row_dpo(
            {"prompt": f"q {i}", "chosen": "yes this", "rejected": "no that",
             "img_path": imgs[i]}
        )
        for i in range(2)
    ]
    batch = coll(rows)
    assert "anyres_gather" in batch
    assert batch["pixel_values"].ndim == 5

    lcfg = LoraConfig(r=2, alpha=4.0, target_patterns=(r"lm/.*attn/",))
    adapters = init_lora(params, lcfg, jax.random.PRNGKey(1))
    tx = make_optimizer(
        OptimizerConfig(learning_rate=1e-3, warmup_steps=1, total_steps=10),
        adapters,
    )
    state = init_train_state(adapters, tx)
    step = make_dpo_step(cfg, DPOConfig(lora_scale=lcfg.scale), tx)
    state, m = step(state, params, batch)
    np.testing.assert_allclose(float(m["loss"]), np.log(2.0), atol=1e-4)
    state, m = step(state, params, batch)
    assert np.isfinite(float(m["loss"]))


def test_anyres_generation_end_to_end(tmp_path):
    """LLaVA-Next eval path: anyres GenerationCollator -> engine decode."""
    from PIL import Image

    from vlrlhf_tpu.data.chat_templates import TEMPLATES
    from vlrlhf_tpu.data.collators import CollatorConfig, GenerationCollator
    from vlrlhf_tpu.data.processor import (
        ProcessorConfig, VLProcessor, make_single_turn_conv,
    )
    from vlrlhf_tpu.data.tokenizer import ToyTokenizer
    from vlrlhf_tpu.generate.engine import GenerateConfig, Generator
    from vlrlhf_tpu.models.registry import FAMILIES, scale_down
    from vlrlhf_tpu.models.vlm import init_vlm_params

    cfg = scale_down(FAMILIES["llava_next_vicuna"].make_config())
    params = init_vlm_params(cfg, jax.random.PRNGKey(0))
    params["image_newline"] = {
        "embedding": jax.random.normal(jax.random.PRNGKey(9),
                                       (cfg.lm.hidden_size,))
    }
    imgs = []
    for i, (h, w) in enumerate([(24, 18), (20, 30)]):
        p = str(tmp_path / f"g{i}.jpg")
        Image.fromarray(
            np.random.default_rng(i).integers(0, 255, (h, w, 3), np.uint8)
        ).save(p)
        imgs.append(p)

    proc = VLProcessor(
        ToyTokenizer(vocab_size=250), TEMPLATES["llava"],
        ProcessorConfig(num_image_tokens=16, image_token="<image>",
                        image_token_id=3, max_length=64),
    )
    coll = GenerationCollator(
        proc,
        CollatorConfig(pad_token_id=0, bucket_multiple=32,
                       image_size=cfg.vision.image_size, anyres=True,
                       tile_grid=cfg.vision.image_size // cfg.vision.patch_size,
                       grid_pinpoints=((16, 32), (32, 16), (32, 32))),
    )
    rows = []
    for i, img in enumerate(imgs):
        conv = make_single_turn_conv(
            proc.format_multimodal_prompt(f"describe {i}", 1), ""
        )
        rows.append({"input_ids": proc.process_conv(conv)["input_ids"],
                     "img_path": img})
    batch = coll(rows)
    assert "anyres_gather" in batch
    gen = Generator(cfg, GenerateConfig(max_new_tokens=4, pad_token_id=0))
    tokens = np.asarray(gen(params, batch))
    assert tokens.shape == (2, 4)
    assert np.isfinite(tokens).all()
