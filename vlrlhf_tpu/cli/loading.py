"""Model bundle loading: HF checkpoint dir -> (family, config, params, processor).

The TPU analog of the reference's MyAutoModel/MyAutoProcessor dispatch
(/root/reference/src/vlrlhf/utils/auto_load.py:64-139): read config.json,
resolve the family from architectures[0], derive a VLMConfig from the HF
config values, port the weights, build the processor around the HF tokenizer.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Optional

import jax.numpy as jnp

from vlrlhf_tpu.data.tokenizer import HFTokenizer
from vlrlhf_tpu.models.lm.llama import LMConfig
from vlrlhf_tpu.models.registry import (
    FAMILIES,
    ModelFamily,
    make_processor,
    resolve_family,
)
from vlrlhf_tpu.models.vision.qformer import QFormerConfig
from vlrlhf_tpu.models.vision.vit import ViTConfig
from vlrlhf_tpu.models.vlm import ProjectorConfig, VLMConfig


def _llama_lm_from_hf(tc: dict, dtype) -> LMConfig:
    return LMConfig(
        vocab_size=tc["vocab_size"],
        hidden_size=tc["hidden_size"],
        intermediate_size=tc["intermediate_size"],
        num_layers=tc["num_hidden_layers"],
        num_heads=tc["num_attention_heads"],
        num_kv_heads=tc.get("num_key_value_heads", tc["num_attention_heads"]),
        rope_base=tc.get("rope_theta", 10000.0),
        max_position_embeddings=tc.get("max_position_embeddings", 4096),
        rms_eps=tc.get("rms_norm_eps", 1e-5),
        dtype=dtype,
    )


def _clip_vit_from_hf(vc: dict, dtype, feature_layer=-2, drop_cls=True) -> ViTConfig:
    return ViTConfig(
        image_size=vc["image_size"],
        patch_size=vc["patch_size"],
        hidden_size=vc["hidden_size"],
        num_layers=vc["num_hidden_layers"],
        num_heads=vc["num_attention_heads"],
        mlp_dim=vc["intermediate_size"],
        act=vc.get("hidden_act", "quick_gelu"),
        feature_layer=feature_layer,
        drop_class_token=drop_cls,
        ln_eps=vc.get("layer_norm_eps", 1e-5),
        dtype=dtype,
    )


def config_from_hf(hf: dict, dtype=jnp.bfloat16) -> tuple[ModelFamily, VLMConfig]:
    arch = hf["architectures"][0]
    text_name = ""
    if "text_config" in hf:
        text_name = hf["text_config"].get("_name_or_path", "") or hf[
            "text_config"
        ].get("model_type", "")
    family = resolve_family(arch, text_name)

    if family.name in ("llava", "llava_next_vicuna", "llava_next_mistral"):
        tc, vc = hf["text_config"], hf["vision_config"]
        cfg = VLMConfig(
            lm=_llama_lm_from_hf(tc, dtype),
            vision=_clip_vit_from_hf(
                vc, dtype, feature_layer=hf.get("vision_feature_layer", -2)
            ),
            projector=ProjectorConfig(
                kind="mlp2x_gelu",
                in_dim=vc["hidden_size"],
                out_dim=tc["hidden_size"],
            ),
            image_token_id=hf.get("image_token_index", 32000),
            num_image_tokens=(vc["image_size"] // vc["patch_size"]) ** 2,
            family=family.name,
            grid_pinpoints=tuple(
                tuple(p) for p in hf.get("image_grid_pinpoints", [])
            )
            if family.name.startswith("llava_next")
            else (),
        )
    elif family.name == "qwen_vl":
        vis = hf["visual"]
        cfg = VLMConfig(
            lm=LMConfig(
                vocab_size=hf["vocab_size"],
                hidden_size=hf["hidden_size"],
                intermediate_size=hf["intermediate_size"] // 2,
                num_layers=hf["num_hidden_layers"],
                num_heads=hf["num_attention_heads"],
                num_kv_heads=hf["num_attention_heads"],
                head_dim=hf.get("kv_channels", 128),
                qkv_bias=True,
                rope_base=hf.get("rotary_emb_base", 10000.0),
                rope_scaling_type="dynamic" if hf.get("use_dynamic_ntk") else "none",
                max_position_embeddings=hf.get("seq_length", 8192),
                rms_eps=hf.get("layer_norm_epsilon", 1e-6),
                dtype=dtype,
            ),
            vision=ViTConfig(
                image_size=vis["image_size"],
                patch_size=vis["patch_size"],
                hidden_size=vis["width"],
                num_layers=vis["layers"],
                num_heads=vis["heads"],
                mlp_dim=int(vis["width"] * vis["mlp_ratio"]),
                act="gelu",
                use_class_token=False,
                use_pre_norm=True,
                use_post_norm=False,
                ln_eps=1e-6,
                dtype=dtype,
            ),
            projector=ProjectorConfig(
                kind="resampler",
                in_dim=vis["width"],
                out_dim=vis["output_dim"],
                num_queries=vis.get("n_queries", 256),
                num_heads=max(vis["output_dim"] // 128, 1),
            ),
            image_token_id=vis.get("image_start_id", 151857) + 2,  # <imgpad>
            num_image_tokens=vis.get("n_queries", 256),
            family="qwen_vl",
        )
    elif family.name == "internlm_xc2":
        base = FAMILIES["internlm_xc2"].make_config(dtype)
        img_size = hf.get("img_size", base.vision.image_size)
        n_tok = (img_size // base.vision.patch_size) ** 2
        cfg = dataclasses.replace(
            base,
            lm=_llama_lm_from_hf(hf, dtype),
            vision=dataclasses.replace(base.vision, image_size=img_size),
            num_image_tokens=n_tok,
        )
    elif family.name == "instructblip":
        tc, vc, qc = hf["text_config"], hf["vision_config"], hf["qformer_config"]
        cfg = VLMConfig(
            lm=_llama_lm_from_hf(tc, dtype),
            vision=ViTConfig(
                image_size=vc["image_size"],
                patch_size=vc["patch_size"],
                hidden_size=vc["hidden_size"],
                num_layers=vc["num_hidden_layers"],
                num_heads=vc["num_attention_heads"],
                mlp_dim=vc["intermediate_size"],
                act=vc.get("hidden_act", "gelu"),
                use_pre_norm=False,
                use_post_norm=True,
                patch_bias=True,
                ln_eps=vc.get("layer_norm_eps", 1e-6),
                dtype=dtype,
            ),
            projector=ProjectorConfig(
                kind="linear", in_dim=qc["hidden_size"], out_dim=tc["hidden_size"]
            ),
            qformer=QFormerConfig(
                vocab_size=qc["vocab_size"],
                hidden_size=qc["hidden_size"],
                num_layers=qc["num_hidden_layers"],
                num_heads=qc["num_attention_heads"],
                intermediate_size=qc["intermediate_size"],
                encoder_hidden_size=vc["hidden_size"],
                num_query_tokens=hf.get("num_query_tokens", 32),
                cross_attention_frequency=qc.get("cross_attention_frequency", 2),
                dtype=dtype,
            ),
            image_token_id=hf.get("image_token_index", 32000),
            num_image_tokens=hf.get("num_query_tokens", 32),
            family="instructblip",
        )
    else:
        raise ValueError(f"Unknown family {family.name}")
    return family, cfg


def load_model_bundle(
    path: str,
    dtype=jnp.bfloat16,
    max_length: int = 1024,
    max_prompt_length: int = 512,
    quantize_patterns: Optional[tuple] = None,
    quantize_bits: int = 8,
):
    """Full production load: config + weights + tokenizer + processor.

    Streaming port: tensors are read one at a time from the safetensors
    shards (mmap), transformed on host, cast to the target dtype, and put to
    device — host RSS stays ~one tensor, device never holds a full-precision
    twin (utils/hf_port.LazyStateDict + port_dtype).

    quantize_patterns (ops/quant pattern tuple): int8-quantize matching
    linears DURING the port — stacked decoder layers quantize host-side per
    layer before transfer, so the device transient of a 7B load is the int8
    stack (~6.6 GiB), never the bf16 model (~13.2 GiB). The remaining
    (non-stacked) matches are quantized by one cheap jit pass after the
    port. Equivalent output to port-then-quantize_params
    (tests/test_streaming_port.py)."""
    import contextlib

    from vlrlhf_tpu.utils.hf_port import (
        PORTERS,
        cast_tree,
        open_hf_state_dict,
        port_dtype,
        port_quantize,
    )

    with open(os.path.join(path, "config.json")) as f:
        hf = json.load(f)
    family, cfg = config_from_hf(hf, dtype)
    sd = open_hf_state_dict(path)
    qctx = (
        port_quantize(quantize_patterns, bits=quantize_bits)
        if quantize_patterns
        else contextlib.nullcontext()
    )
    with port_dtype(dtype), qctx:
        params = PORTERS[family.name](sd, cfg)
    params = cast_tree(params, dtype)  # no-op pass for already-cast leaves
    if quantize_patterns:
        import jax

        from vlrlhf_tpu.ops.quant import quantize_params

        # lm_head / projector (non-stacked) matches; already-quantized
        # stacks pass through untouched ("kernel_q" dicts are not linears)
        params = jax.jit(
            lambda p: quantize_params(p, quantize_patterns,
                                      bits=quantize_bits),
            donate_argnums=0,
        )(params)
    tokenizer = HFTokenizer.from_pretrained(path, trust_remote_code=True)
    overrides: dict = dict(
        max_length=max_length, max_prompt_length=max_prompt_length
    )
    if family.name == "qwen_vl":
        # The placeholder must encode to ONE tokenizer-special id for
        # expand_image_tokens to find; <imgpad> (id 151859) is special in the
        # real tiktoken vocab. The surrounding "Picture 1: …\n" text is added
        # by format_multimodal_prompt (wrapped mode).
        overrides["image_token"] = "<imgpad>"
    if family.name == "internlm_xc2":
        # XC2 checkpoints SHIP trained PLoRA weights (Plora_A/Plora_B on
        # wqkv/wo/w1/w2/w3, build_mlp.py:158-203) — part of the frozen base,
        # applied at image positions in every forward. Attach them so
        # vlm_forward threads them as Ctx.base_adapters.
        from vlrlhf_tpu.utils.hf_port import port_xc2_plora

        with port_dtype(dtype):
            plora = port_xc2_plora(sd, cfg)
        if plora:
            params["plora"] = cast_tree(plora, dtype)
        # the reference ADDS <ImageHere> as a special token at load
        # (models/InternLMXC2/__init__.py:304); resolve its real id.
        tokenizer.tok.add_tokens("<ImageHere>", special_tokens=True)
        tokenizer.vocab_size = len(tokenizer.tok)
        img_id = tokenizer.convert_token_to_id("<ImageHere>")
        overrides["image_token_id"] = img_id
        cfg = dataclasses.replace(cfg, image_token_id=img_id)
    processor = make_processor(family, tokenizer, **overrides)
    if family.name == "instructblip":
        # second tokenizer for the Q-Former instructions (bert vocab)
        try:
            from transformers import AutoTokenizer

            processor.qformer_tokenizer = HFTokenizer(
                AutoTokenizer.from_pretrained(
                    os.path.join(path, "qformer_tokenizer")
                )
            )
        except Exception:
            pass
    return family, cfg, params, processor
