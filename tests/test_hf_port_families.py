"""Porting parity for QWen / InternLM2 (vendored reference cores as oracles,
imported read-only) and InstructBLIP (HF transformers)."""
import pytest as _pytest

# heavy (torch-oracle / multi-process spawn) — excluded from the
# fast gate via `pytest -m "not slow"`
pytestmark = _pytest.mark.slow


import importlib
import importlib.machinery
import sys
import types

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from vlrlhf_tpu.models.lm.llama import LMConfig, lm_forward
from vlrlhf_tpu.utils.hf_port import (
    port_instructblip,
    port_internlm2_lm,
    port_qwen_lm,
)

torch.manual_seed(0)


def _stub_torchvision():
    if "torchvision" in sys.modules:
        return
    tv = types.ModuleType("torchvision")
    tvt = types.ModuleType("torchvision.transforms")

    class _IM:
        BICUBIC = 3

    tvt.InterpolationMode = _IM
    for name in ("Compose", "Resize", "ToTensor", "Normalize"):
        setattr(tvt, name, lambda *a, **k: None)
    tv.transforms = tvt
    tv.__spec__ = importlib.machinery.ModuleSpec("torchvision", None)
    tvt.__spec__ = importlib.machinery.ModuleSpec("torchvision.transforms", None)
    tv.__version__ = "0.0.0"
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = tvt


def _ref_pkg(name, path):
    if name not in sys.modules:
        pkg = types.ModuleType(name)
        pkg.__path__ = [path]
        sys.modules[name] = pkg
    return name


def _sd(model):
    return {k: v.detach().float().numpy() for k, v in model.state_dict().items()}


def test_qwen_lm_parity():
    _stub_torchvision()
    _ref_pkg("qwenref", "/root/reference/src/vlrlhf/models/QwenVL")
    mq = importlib.import_module("qwenref.modeling_qwen")
    cq = importlib.import_module("qwenref.configuration_qwen")

    cfg = cq.QWenConfig(
        vocab_size=128, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, kv_channels=8, intermediate_size=64,
        emb_dropout_prob=0.0, attn_dropout_prob=0.0, no_bias=True,
        rotary_emb_base=10000, use_dynamic_ntk=False, use_logn_attn=False,
        use_flash_attn=False, seq_length=64, scale_attn_weights=True,
        layer_norm_epsilon=1e-6, fp32=True,
        # QWenModel unconditionally builds the visual tower; give it a tiny
        # one (also used by test_qwen_visual_parity below).
        visual=dict(image_size=28, patch_size=14, width=16, layers=2,
                    heads=2, mlp_ratio=2.0, n_queries=4, output_dim=128,
                    image_start_id=500),  # no token matches -> text-only
    )
    hf = mq.QWenLMHeadModel(cfg).eval().float()
    ids = torch.randint(0, 128, (2, 12))
    with torch.no_grad():
        want = hf(ids).logits.numpy()

    ours = LMConfig(
        vocab_size=128, hidden_size=32, intermediate_size=32,  # ff//2
        num_layers=2, num_heads=4, num_kv_heads=4, head_dim=8,
        qkv_bias=True, rms_eps=1e-6, dtype=jnp.float32, remat=False,
    )
    params = port_qwen_lm(_sd(hf), 2)
    got, _ = lm_forward(ours, params, input_ids=jnp.asarray(ids.numpy()))
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-4, rtol=5e-3)


def test_qwen_visual_parity():
    """ViT-bigG structure + Resampler + ln_post + proj vs the vendored tower."""
    _stub_torchvision()
    _ref_pkg("qwenref", "/root/reference/src/vlrlhf/models/QwenVL")
    mv = importlib.import_module("qwenref.visual")
    # image 224/patch 14 -> 256 patches == pos table size == n_queries:
    # no pos-embed interpolation, pure structural parity. (Interpolated-grid
    # parity is covered by test_torch_bicubic_interp below.)
    hf = mv.VisionTransformer(
        image_size=224, patch_size=14, width=16, layers=2, heads=2,
        mlp_ratio=2.0, n_queries=256, output_dim=128,
    ).eval().float()
    pixels = torch.randn(2, 3, 224, 224)
    with torch.no_grad():
        want = hf(pixels).numpy()

    from vlrlhf_tpu.models.vision.vit import ViTConfig
    from vlrlhf_tpu.models.vlm import ProjectorConfig, encode_images, VLMConfig
    from vlrlhf_tpu.utils.hf_port import port_qwen_visual

    vis_cfg = ViTConfig(
        image_size=224, patch_size=14, hidden_size=16, num_layers=2,
        num_heads=2, mlp_dim=32, act="gelu", use_class_token=False,
        use_pre_norm=True, use_post_norm=False, ln_eps=1e-6,
        dtype=jnp.float32, remat=False,
    )
    cfg = VLMConfig(
        lm=LMConfig(vocab_size=8, hidden_size=8, intermediate_size=8,
                    num_layers=1, num_heads=1, num_kv_heads=1,
                    dtype=jnp.float32, remat=False),
        vision=vis_cfg,
        projector=ProjectorConfig(kind="resampler", in_dim=16, out_dim=128,
                                  num_queries=256, num_heads=1),
        image_token_id=0, num_image_tokens=256,
    )
    sd = {f"transformer.visual.{k}": v.detach().numpy()
          for k, v in hf.state_dict().items()}
    vision, projector = port_qwen_visual(sd, 2, vis_heads=2)
    params = {"vision": vision, "projector": projector, "lm": {}}
    got = encode_images(
        cfg, params, jnp.asarray(pixels.numpy().transpose(0, 2, 3, 1))
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-3, rtol=1e-2)


def test_internlm2_parity():
    _ref_pkg("xc2ref", "/root/reference/src/vlrlhf/models/InternLMXC2")
    m2 = importlib.import_module("xc2ref.modeling_internlm2")
    c2 = importlib.import_module("xc2ref.configuration_internlm_xcomposer2")

    cfg = c2.InternLMXcomposer2Config(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        hidden_act="silu", max_position_embeddings=64, rms_norm_eps=1e-5,
        bias=False, rope_theta=1e6, rope_scaling=None,
        attn_implementation="eager",
    )
    hf = m2.InternLM2Model(cfg).eval().float()
    ids = torch.randint(0, 128, (2, 10))
    with torch.no_grad():
        # vendored forward requires an explicit im_mask in some paths; use
        # plain call and take last hidden state
        want = hf(input_ids=ids).last_hidden_state.numpy()

    ours = LMConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64, num_layers=2,
        num_heads=4, num_kv_heads=2, head_dim=8, rope_base=1e6, rms_eps=1e-5,
        dtype=jnp.float32, remat=False,
    )
    sd = _sd(hf)
    sd = {f"model.{k}": v for k, v in sd.items()}
    sd["output.weight"] = np.zeros((128, 32), np.float32)  # unused head
    params = port_internlm2_lm(sd, 2, 4, 2, 8)
    hidden, _ = lm_forward(
        ours, params, input_ids=jnp.asarray(ids.numpy()), return_logits=False
    )
    np.testing.assert_allclose(np.asarray(hidden), want, atol=5e-4, rtol=5e-3)


def test_instructblip_parity():
    from transformers import (
        InstructBlipConfig,
        InstructBlipForConditionalGeneration,
    )

    cfg = InstructBlipConfig(
        vision_config=dict(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=4, image_size=28, patch_size=14,
            hidden_act="gelu", layer_norm_eps=1e-6, qkv_bias=True,
        ),
        qformer_config=dict(
            vocab_size=64, hidden_size=24, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=48,
            cross_attention_frequency=2, encoder_hidden_size=32,
            max_position_embeddings=64,
        ),
        text_config=dict(
            architectures=["LlamaForCausalLM"], model_type="llama",
            vocab_size=128, hidden_size=48, intermediate_size=96,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
            rms_norm_eps=1e-5, max_position_embeddings=128,
        ),
        num_query_tokens=8,
        image_token_index=99,
    )
    hf = InstructBlipForConditionalGeneration(cfg).eval().float()
    b = 2
    n_q = 8
    ids = torch.randint(0, 90, (b, 18))
    ids[:, 1 : 1 + n_q] = 99  # expanded image (query) tokens
    qids = torch.randint(0, 64, (b, 5))
    pixels = torch.randn(b, 3, 28, 28)
    with torch.no_grad():
        want = hf(
            input_ids=ids, pixel_values=pixels, qformer_input_ids=qids
        ).logits.numpy()

    from vlrlhf_tpu.models.vision.qformer import QFormerConfig
    from vlrlhf_tpu.models.vision.vit import ViTConfig
    from vlrlhf_tpu.models.vlm import ProjectorConfig, VLMConfig, vlm_forward

    ours = VLMConfig(
        lm=LMConfig(
            vocab_size=128, hidden_size=48, intermediate_size=96, num_layers=2,
            num_heads=4, num_kv_heads=4, rms_eps=1e-5, dtype=jnp.float32,
            remat=False,
        ),
        vision=ViTConfig(
            image_size=28, patch_size=14, hidden_size=32, num_layers=2,
            num_heads=4, mlp_dim=64, act="gelu", use_pre_norm=False,
            use_post_norm=True, patch_bias=True, ln_eps=1e-6,
            dtype=jnp.float32, remat=False,
        ),
        projector=ProjectorConfig(kind="linear", in_dim=24, out_dim=48),
        qformer=QFormerConfig(
            vocab_size=64, hidden_size=24, num_layers=2, num_heads=4,
            intermediate_size=48, encoder_hidden_size=32, num_query_tokens=8,
            cross_attention_frequency=2, dtype=jnp.float32,
        ),
        image_token_id=99,
        num_image_tokens=8,
    )
    params = port_instructblip(_sd(hf), ours)
    img_pos = jnp.broadcast_to(jnp.arange(1, 1 + n_q)[None], (b, n_q)).astype(
        jnp.int32
    )
    got, _ = vlm_forward(
        ours,
        params,
        input_ids=jnp.asarray(ids.numpy()),
        pixel_values=jnp.asarray(pixels.numpy().transpose(0, 2, 3, 1))[:, None],
        image_positions=img_pos,
        pad_mask=jnp.ones(ids.shape, bool),
        qformer_ids=jnp.asarray(qids.numpy()),
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-4, rtol=5e-3)


def test_torch_bicubic_interp_matches_f_interpolate():
    """interpolate_pos_embed must match torch's bicubic exactly — released
    Qwen-VL weights depend on it (get_abs_pos, visual.py:24-45)."""
    import torch.nn.functional as F

    from vlrlhf_tpu.ops.image import interpolate_pos_embed

    for g_old, g_new in [(16, 32), (4, 7), (24, 16)]:
        table = torch.randn(g_old * g_old, 12)
        want = (
            F.interpolate(
                table.reshape(1, g_old, g_old, 12).permute(0, 3, 1, 2),
                size=(g_new, g_new), mode="bicubic", align_corners=False,
            )
            .permute(0, 2, 3, 1)
            .reshape(g_new * g_new, 12)
            .numpy()
        )
        got = interpolate_pos_embed(jnp.asarray(table.numpy()), g_new * g_new)
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5, rtol=1e-5)
