"""Weight-porting parity: our forward must match HF transformers' logits on
randomly-initialized tiny models (fp32, CPU). This is the mechanism behind
the 1e-3 per-step DPO-loss parity target (BASELINE.md)."""
import pytest as _pytest

# heavy (torch-oracle / multi-process spawn) — excluded from the
# fast gate via `pytest -m "not slow"`
pytestmark = _pytest.mark.slow


import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from vlrlhf_tpu.models.lm.llama import LMConfig, lm_forward
from vlrlhf_tpu.models.vision.vit import ViTConfig, vit_forward
from vlrlhf_tpu.models.vlm import ProjectorConfig, VLMConfig, vlm_forward
from vlrlhf_tpu.utils.hf_port import (
    port_llama_lm,
    port_llava,
)

torch.manual_seed(0)


def _sd(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


def test_llama_lm_parity():
    from transformers import LlamaConfig, LlamaForCausalLM

    hf_cfg = LlamaConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=64, rms_norm_eps=1e-5, attn_implementation="eager",
    )
    hf = LlamaForCausalLM(hf_cfg).eval().float()
    ids = torch.randint(0, 128, (2, 16))
    with torch.no_grad():
        want = hf(ids).logits.numpy()

    cfg = LMConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64, num_layers=2,
        num_heads=4, num_kv_heads=4, rms_eps=1e-5, dtype=jnp.float32,
        remat=False,
    )
    params = port_llama_lm(_sd(hf), 2, prefix="model")
    if "lm_head" not in params:
        params["lm_head"] = {
            "kernel": jnp.asarray(hf.lm_head.weight.detach().numpy().T)
        }
    got, _ = lm_forward(cfg, params, input_ids=jnp.asarray(ids.numpy()))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=2e-3)


def test_mistral_gqa_parity():
    from transformers import MistralConfig, MistralForCausalLM

    hf_cfg = MistralConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, rms_norm_eps=1e-5, rope_theta=1e6,
        sliding_window=None, attn_implementation="eager",
    )
    hf = MistralForCausalLM(hf_cfg).eval().float()
    ids = torch.randint(0, 128, (2, 12))
    with torch.no_grad():
        want = hf(ids).logits.numpy()
    cfg = LMConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64, num_layers=2,
        num_heads=4, num_kv_heads=2, rope_base=1e6, rms_eps=1e-5,
        dtype=jnp.float32, remat=False,
    )
    sd = _sd(hf)
    params = port_llama_lm(sd, 2, prefix="model")
    if "lm_head" not in params:
        params["lm_head"] = {"kernel": jnp.asarray(sd["lm_head.weight"].T)}
    got, _ = lm_forward(cfg, params, input_ids=jnp.asarray(ids.numpy()))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=2e-3)


def _tiny_llava():
    from transformers import LlavaConfig, LlavaForConditionalGeneration

    vision = dict(
        hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=4, image_size=28, patch_size=14, projection_dim=16,
    )
    text = dict(
        vocab_size=128, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=128, rms_norm_eps=1e-5,
    )
    cfg = LlavaConfig(
        vision_config=vision, text_config=text, image_token_index=99,
        vision_feature_layer=-2, vision_feature_select_strategy="default",
        projector_hidden_act="gelu",
    )
    hf = LlavaForConditionalGeneration(cfg).eval().float()
    return hf


def test_llava_vlm_parity():
    hf = _tiny_llava()
    n_img_tokens = (28 // 14) ** 2  # 4
    b, s = 2, 20
    ids = torch.randint(0, 90, (b, s))
    ids[:, 3 : 3 + n_img_tokens] = 99  # expanded image tokens (HF >= 4.43 style)
    pixels = torch.randn(b, 3, 28, 28)
    with torch.no_grad():
        want = hf(input_ids=ids, pixel_values=pixels).logits.numpy()

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
        num_image_tokens=n_img_tokens,
    )
    params = port_llava(_sd(hf), cfg)
    img_pos = jnp.broadcast_to(
        jnp.arange(3, 3 + n_img_tokens)[None], (b, n_img_tokens)
    ).astype(jnp.int32)
    got, _ = vlm_forward(
        cfg,
        params,
        input_ids=jnp.asarray(ids.numpy()),
        pixel_values=jnp.asarray(pixels.numpy().transpose(0, 2, 3, 1))[:, None],
        image_positions=img_pos,
        pad_mask=jnp.ones((b, s), bool),
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-4, rtol=5e-3)
