"""Model-family registry.

Replaces the reference's ModelCoreMapper + MODEL_NICKNAME_MAP dispatch
(/root/reference/src/vlrlhf/models/utils.py:18-31,
 utils/auto_load.py:41-61): each family bundles its VLMConfig factory,
chat template, processor settings, LoRA defaults, freeze patterns and image
resize mode. Adding a model = one FAMILY entry (same extension contract as
the reference's docs/CustomizedModel.md).

Family facts are taken from each reference plugin + vendored core:
  llava             models/Llava/__init__.py (CLIP-L/14-336 + mlp2x + vicuna)
  llava_next_*      models/LlavaNext/__init__.py (anyres; mistral GQA variant)
  qwen_vl           models/QwenVL/{__init__,modeling_qwen,visual}.py
                    (ViT-bigG 448 + Resampler-256, ChatML, qkv bias)
  internlm_xc2      models/InternLMXC2/{__init__,modeling_internlm2,build_mlp}.py
                    (InternLM2 GQA + CLIP-L/14 + PLoRA)
  instructblip      models/InstructBlip/__init__.py (EVA-g + Q-Former-32)
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax.numpy as jnp

from vlrlhf_tpu.data.chat_templates import TEMPLATES, ChatTemplate
from vlrlhf_tpu.data.processor import ProcessorConfig, VLProcessor
from vlrlhf_tpu.models.lm.llama import LMConfig
from vlrlhf_tpu.models.vision.qformer import QFormerConfig
from vlrlhf_tpu.models.vision.vit import ViTConfig
from vlrlhf_tpu.models.vlm import ProjectorConfig, VLMConfig

# LoRA target patterns over OUR param paths, per the reference's
# default_lora_target properties (see docstrings at each entry).
LM_ALL_LINEARS = (r"lm/.*attn/(wq|wk|wv|wo)/", r"lm/.*mlp/(gate|up|down)/")
QWEN_TARGETS = (r"lm/.*attn/(wq|wk|wv|wo)/", r"lm/.*mlp/(gate|up)/")


@dataclasses.dataclass(frozen=True)
class ModelFamily:
    name: str
    hf_architectures: tuple[str, ...]
    make_config: Callable[..., VLMConfig]
    template: ChatTemplate
    processor_defaults: dict
    lora_targets: tuple[str, ...]
    freeze_vision_patterns: tuple[str, ...]
    resize_mode: str = "shortest_edge_crop"
    # eos/stop ids resolved from the tokenizer at runtime; names here
    stop_tokens: tuple[str, ...] = ()


def _llava_7b(dtype=jnp.bfloat16) -> VLMConfig:
    """LLaVA-1.5-7B (vicuna LM + CLIP-L/14-336 penultimate layer)."""
    return VLMConfig(
        lm=LMConfig(
            vocab_size=32064, hidden_size=4096, intermediate_size=11008,
            num_layers=32, num_heads=32, num_kv_heads=32,
            max_position_embeddings=4096, rms_eps=1e-5, dtype=dtype,
        ),
        vision=ViTConfig(
            image_size=336, patch_size=14, hidden_size=1024, num_layers=24,
            num_heads=16, mlp_dim=4096, act="quick_gelu", feature_layer=-2,
            drop_class_token=True, patch_bias=False, dtype=dtype,
        ),
        projector=ProjectorConfig(kind="mlp2x_gelu", in_dim=1024, out_dim=4096),
        image_token_id=32000,
        num_image_tokens=576,
        family="llava",
    )


DEFAULT_ANYRES_PINPOINTS = (
    (336, 672), (672, 336), (672, 672), (1008, 336), (336, 1008),
)


def _llava_next_vicuna_7b(dtype=jnp.bfloat16) -> VLMConfig:
    cfg = _llava_7b(dtype)
    return dataclasses.replace(
        cfg, family="llava_next_vicuna",
        grid_pinpoints=DEFAULT_ANYRES_PINPOINTS,
    )


def _llava_next_mistral_7b(dtype=jnp.bfloat16) -> VLMConfig:
    return VLMConfig(
        lm=LMConfig(
            vocab_size=32000, hidden_size=4096, intermediate_size=14336,
            num_layers=32, num_heads=32, num_kv_heads=8,  # Mistral GQA
            rope_base=1e6, max_position_embeddings=32768, rms_eps=1e-5,
            dtype=dtype,
        ),
        vision=ViTConfig(
            image_size=336, patch_size=14, hidden_size=1024, num_layers=24,
            num_heads=16, mlp_dim=4096, act="quick_gelu", feature_layer=-2,
            drop_class_token=True, dtype=dtype,
        ),
        projector=ProjectorConfig(kind="mlp2x_gelu", in_dim=1024, out_dim=4096),
        image_token_id=32000,
        num_image_tokens=576,
        family="llava_next_mistral",
        grid_pinpoints=DEFAULT_ANYRES_PINPOINTS,
    )


def _qwen_vl_chat(dtype=jnp.bfloat16) -> VLMConfig:
    """Qwen-VL-Chat: QWen-7B LM (fused qkv bias, w2=gate/w1=up) + ViT-bigG
    448 + 256-query Resampler (visual.py:334-415)."""
    return VLMConfig(
        lm=LMConfig(
            vocab_size=151936, hidden_size=4096, intermediate_size=11008,
            num_layers=32, num_heads=32, num_kv_heads=32, qkv_bias=True,
            rope_base=10000.0, rope_scaling_type="dynamic",
            max_position_embeddings=8192, rms_eps=1e-6, dtype=dtype,
        ),
        vision=ViTConfig(
            image_size=448, patch_size=14, hidden_size=1664, num_layers=48,
            num_heads=16, mlp_dim=8192, act="gelu", use_class_token=False,
            use_pre_norm=True, use_post_norm=False, ln_eps=1e-6, dtype=dtype,
        ),
        projector=ProjectorConfig(
            kind="resampler", in_dim=1664, out_dim=4096, num_queries=256,
            num_heads=32,
        ),
        image_token_id=151859,  # <imgpad>
        num_image_tokens=256,
        family="qwen_vl",
        image_mean=(0.48145466, 0.4578275, 0.40821073),
        image_std=(0.26862954, 0.26130258, 0.27577711),
    )


def _internlm_xc2_7b(dtype=jnp.bfloat16) -> VLMConfig:
    """InternLM-XComposer2-VL-7B: InternLM2 (GQA 8 kv heads) + CLIP-L/14-336
    + 2-layer MLP projector + PLoRA at image positions."""
    return VLMConfig(
        lm=LMConfig(
            vocab_size=92544, hidden_size=4096, intermediate_size=14336,
            num_layers=32, num_heads=32, num_kv_heads=8, rope_base=1e6,
            max_position_embeddings=32768, rms_eps=1e-5, dtype=dtype,
        ),
        vision=ViTConfig(
            # CLIP-L/14 tower run at 490px: XC2 resizes the 24x24 pos grid to
            # 35x35 at load (build_mlp.py:67-100), so 1225 patch tokens.
            image_size=490, patch_size=14, hidden_size=1024, num_layers=24,
            num_heads=16, mlp_dim=4096, act="quick_gelu",
            feature_layer=-1,  # select_layer=-1, pre-post-layernorm output
            use_post_norm=False,  # freeze_vision identity-fies post_layernorm
            drop_class_token=True, dtype=dtype,
        ),
        projector=ProjectorConfig(kind="mlp2x_gelu", in_dim=1024, out_dim=4096),
        image_token_id=92544 - 1,  # <ImageHere> added token (resolved at port)
        num_image_tokens=35 * 35,
        plora=True,
        family="internlm_xc2",
    )


def _instructblip_vicuna_7b(dtype=jnp.bfloat16) -> VLMConfig:
    """InstructBLIP-Vicuna-7B: EVA ViT-g/14 @224 + Q-Former (32 queries) +
    linear projection; prefix-embedding model, 32 image tokens."""
    return VLMConfig(
        lm=LMConfig(
            vocab_size=32001, hidden_size=4096, intermediate_size=11008,
            num_layers=32, num_heads=32, num_kv_heads=32,
            max_position_embeddings=4096, rms_eps=1e-5, dtype=dtype,
        ),
        vision=ViTConfig(
            image_size=224, patch_size=14, hidden_size=1408, num_layers=39,
            num_heads=16, mlp_dim=6144, act="gelu", use_pre_norm=False,
            use_post_norm=True, patch_bias=True, dtype=dtype,
        ),
        projector=ProjectorConfig(kind="linear", in_dim=768, out_dim=4096),
        qformer=QFormerConfig(
            vocab_size=30523, hidden_size=768, num_layers=12, num_heads=12,
            intermediate_size=3072, encoder_hidden_size=1408,
            num_query_tokens=32, cross_attention_frequency=2, dtype=dtype,
        ),
        image_token_id=32000,  # added <image> token
        num_image_tokens=32,
        family="instructblip",
    )


FAMILIES: dict[str, ModelFamily] = {
    "llava": ModelFamily(
        name="llava",
        hf_architectures=("LlavaForConditionalGeneration", "LlavaForRL"),
        make_config=_llava_7b,
        template=TEMPLATES["llava"],
        processor_defaults=dict(
            num_image_tokens=576, image_token="<image>", image_token_id=32000
        ),
        # Llava default_lora_target = every LM linear except lm_head/vision/
        # projector (models/Llava/__init__.py:273-286)
        lora_targets=LM_ALL_LINEARS,
        freeze_vision_patterns=(r"^vision/", r"^projector/"),
    ),
    "llava_next_vicuna": ModelFamily(
        name="llava_next_vicuna",
        hf_architectures=("LlavaNextForConditionalGeneration",),
        make_config=_llava_next_vicuna_7b,
        template=TEMPLATES["llava_next_vicuna"],
        processor_defaults=dict(
            num_image_tokens=576, image_token="<image>", image_token_id=32000
        ),
        lora_targets=LM_ALL_LINEARS,
        freeze_vision_patterns=(r"^vision/", r"^projector/"),
    ),
    "llava_next_mistral": ModelFamily(
        name="llava_next_mistral",
        hf_architectures=("LlavaNextForConditionalGeneration",),
        make_config=_llava_next_mistral_7b,
        template=TEMPLATES["llava_next_mistral"],
        processor_defaults=dict(
            num_image_tokens=576, image_token="<image>", image_token_id=32000
        ),
        lora_targets=LM_ALL_LINEARS,
        freeze_vision_patterns=(r"^vision/", r"^projector/"),
    ),
    "qwen_vl": ModelFamily(
        name="qwen_vl",
        hf_architectures=("QWenLMHeadModel", "QwenVLForRL"),
        make_config=_qwen_vl_chat,
        template=TEMPLATES["qwen_vl"],
        processor_defaults=dict(
            num_image_tokens=256, image_token="<image>", image_token_id=151859,
            image_start_id=151857, image_end_id=151858, image_pad_id=151859,
            add_bos=False,  # QWen has no BOS
        ),
        # c_attn -> wq/wk/wv, attn.c_proj -> wo, w1 -> up, w2 -> gate
        # (models/QwenVL/__init__.py:26-28); mlp c_proj (down) NOT targeted.
        lora_targets=QWEN_TARGETS,
        # Qwen default keeps the resampler (attn_pool) trainable
        # (models/QwenVL/__init__.py:33-37).
        freeze_vision_patterns=(r"^vision/", r"^projector/(ln_post|proj)/"),
        resize_mode="squash",
        stop_tokens=("<|im_end|>", "<|im_start|>"),
    ),
    "internlm_xc2": ModelFamily(
        name="internlm_xc2",
        hf_architectures=("InternLMXComposer2ForCausalLM",),
        make_config=_internlm_xc2_7b,
        template=TEMPLATES["internlm_xc2"],
        processor_defaults=dict(
            num_image_tokens=35 * 35, image_token="<ImageHere>",
            image_token_id=92543,
        ),
        # wqkv+wo+w1/w2/w3 (models/InternLMXC2/__init__.py:250-251)
        lora_targets=LM_ALL_LINEARS,
        # freeze also covers vision_proj (projector) per __init__.py:256-259
        freeze_vision_patterns=(r"^vision/", r"^projector/"),
        resize_mode="squash",
        stop_tokens=("[UNUSED_TOKEN_145]",),
    ),
    "instructblip": ModelFamily(
        name="instructblip",
        hf_architectures=("InstructBlipForConditionalGeneration", "InstructBlipForRL"),
        make_config=_instructblip_vicuna_7b,
        template=TEMPLATES["instructblip"],
        processor_defaults=dict(
            num_image_tokens=32, image_token="<image>", image_token_id=32000,
            prefix_image_tokens=True,
        ),
        lora_targets=LM_ALL_LINEARS,
        freeze_vision_patterns=(r"^vision/", r"^projector/", r"^qformer/"),
    ),
}

ARCH_TO_FAMILY = {
    "LlavaForConditionalGeneration": "llava",
    "QWenLMHeadModel": "qwen_vl",
    "InstructBlipForConditionalGeneration": "instructblip",
    "InstructBlipForRL": "instructblip",
    "InternLMXComposer2ForCausalLM": "internlm_xc2",
    # LlavaNext resolves to mistral/vicuna variant by text-config name, like
    # the reference's chat_template switch (models/LlavaNext/__init__.py:399).
}


def resolve_family(
    architecture: str, text_model_name: str = ""
) -> ModelFamily:
    if architecture == "LlavaNextForConditionalGeneration":
        key = (
            "llava_next_mistral"
            if "mistral" in text_model_name.lower()
            else "llava_next_vicuna"
        )
        return FAMILIES[key]
    return FAMILIES[ARCH_TO_FAMILY[architecture]]


def make_processor(family: ModelFamily, tokenizer, **overrides) -> VLProcessor:
    cfg = ProcessorConfig(**{**family.processor_defaults, **overrides})
    return VLProcessor(tokenizer, family.template, cfg)


def scale_down(cfg: VLMConfig, dtype=jnp.float32) -> VLMConfig:
    """Shrink any family config to test size, preserving its structure
    (GQA ratio, projector kind, PLoRA, class-token/pre-norm layout)."""
    lm = cfg.lm
    kv_ratio = max(lm.num_heads // lm.num_kv_heads, 1)
    lm_small = dataclasses.replace(
        lm, vocab_size=256, hidden_size=32, intermediate_size=64,
        num_layers=2, num_heads=4, num_kv_heads=max(4 // kv_ratio, 1),
        head_dim=8, dtype=dtype, remat=False,
    )
    v = cfg.vision
    feature_layer = v.feature_layer
    vis_small = dataclasses.replace(
        v, image_size=16, patch_size=4, hidden_size=16, num_layers=2,
        num_heads=2, mlp_dim=32, feature_layer=feature_layer, dtype=dtype,
        remat=False,
    )
    n_grid_tokens = (16 // 4) ** 2
    qf = None
    if cfg.projector.kind == "resampler":
        proj = dataclasses.replace(
            cfg.projector, in_dim=16, out_dim=32, num_queries=4, num_heads=2
        )
        n_img_tokens = 4
    elif cfg.qformer is not None:
        qf = dataclasses.replace(
            cfg.qformer, vocab_size=64, hidden_size=16, num_layers=2,
            num_heads=2, intermediate_size=32, encoder_hidden_size=16,
            num_query_tokens=4, dtype=dtype,
        )
        proj = dataclasses.replace(cfg.projector, in_dim=16, out_dim=32)
        n_img_tokens = 4
    else:
        proj = dataclasses.replace(cfg.projector, in_dim=16, out_dim=32)
        n_img_tokens = (
            n_grid_tokens if v.drop_class_token or not v.use_class_token
            else n_grid_tokens + 1
        )
    return dataclasses.replace(
        cfg,
        lm=lm_small,
        vision=vis_small,
        projector=proj,
        qformer=qf,
        num_image_tokens=n_img_tokens,
        image_token_id=250,
    )
