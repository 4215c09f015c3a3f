"""Generic VLM assembly: vision tower + projector + LM + static-shape merge.

The reference implements this five times over with per-model dynamic-shape
merging (`LlavaForRL._merge_input_ids_with_image_features` and friends —
/root/reference/src/vlrlhf/models/Llava/__init__.py:36-109 etc.). Here there
is ONE assembly: the processor guarantees each image contributes exactly
`num_image_tokens` placeholder tokens, the collator ships an
`image_positions` map, and the device scatters projected features into the
embedding sequence with static shapes (models/common.py).

Model families customize: the vision tower config, the projector, whether
LoRA deltas are image-position-gated (PLoRA), and the prompt format (data/).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp

from vlrlhf_tpu.models.common import (
    Ctx,
    embed,
    image_position_mask,
    init_linear,
    linear,
    merge_multimodal_embeddings,
)
from vlrlhf_tpu.models.lm.llama import LMConfig, init_lm_params, lm_forward
from vlrlhf_tpu.models.vision.qformer import QFormerConfig
from vlrlhf_tpu.models.vision.vit import ViTConfig, init_vit_params, vit_forward

PyTree = Any


@dataclasses.dataclass(frozen=True)
class ProjectorConfig:
    # 'mlp2x_gelu' (LLaVA), 'linear' (InstructBLIP language_projection),
    # 'resampler' (Qwen-VL attn_pool + ln_post + proj).
    kind: str = "mlp2x_gelu"
    in_dim: int = 1024
    out_dim: int = 4096
    num_queries: int = 256  # resampler only
    num_heads: int = 32  # resampler only


@dataclasses.dataclass(frozen=True)
class VLMConfig:
    lm: LMConfig
    vision: ViTConfig
    projector: ProjectorConfig
    image_token_id: int
    num_image_tokens: int  # placeholder tokens per image (static)
    # InstructBLIP: instruction-aware Q-Former between tower and projector.
    qformer: Optional["QFormerConfig"] = None
    # PLoRA: gate LoRA deltas by image-position mask (InternLM-XC2).
    plora: bool = False
    family: str = "llava"
    # LLaVA-Next anyres: grid pinpoints (empty = not an anyres model).
    grid_pinpoints: tuple = ()
    # Device-side normalization constants (collators ship raw uint8 pixels;
    # rescale+normalize fuses into the tower's first conv on device).
    image_mean: tuple = (0.48145466, 0.4578275, 0.40821073)
    image_std: tuple = (0.26862954, 0.26130258, 0.27577711)


def _resampler_cfg(cfg: ProjectorConfig, dtype):
    from vlrlhf_tpu.models.vision.resampler import ResamplerConfig

    return ResamplerConfig(
        embed_dim=cfg.out_dim,
        num_heads=cfg.num_heads,
        kv_dim=cfg.in_dim,
        num_queries=cfg.num_queries,
        dtype=dtype,
    )


def init_projector_params(cfg: ProjectorConfig, key: jax.Array, dtype) -> PyTree:
    k1, k2 = jax.random.split(key)
    if cfg.kind == "linear":
        return {"fc1": init_linear(k1, cfg.in_dim, cfg.out_dim, True, dtype)}
    if cfg.kind == "resampler":
        from vlrlhf_tpu.models.vision.resampler import init_resampler_params

        d = cfg.out_dim
        return {
            "resampler": init_resampler_params(_resampler_cfg(cfg, dtype), k1),
            "ln_post": {
                "weight": jnp.ones((d,), dtype),
                "bias": jnp.zeros((d,), dtype),
            },
            "proj": {"kernel": (jax.random.normal(k2, (d, d)) * d**-0.5).astype(dtype)},
        }
    return {
        "fc1": init_linear(k1, cfg.in_dim, cfg.out_dim, True, dtype),
        "fc2": init_linear(k2, cfg.out_dim, cfg.out_dim, True, dtype),
    }


def projector_forward(cfg: ProjectorConfig, p: PyTree, x: jax.Array) -> jax.Array:
    if cfg.kind == "resampler":
        from vlrlhf_tpu.models.vision.resampler import resampler_forward
        from vlrlhf_tpu.ops.norms import layer_norm

        x = resampler_forward(_resampler_cfg(cfg, x.dtype), p["resampler"], x)
        x = layer_norm(x, p["ln_post"]["weight"], p["ln_post"]["bias"], 1e-6)
        return linear(p["proj"], x)  # linear() handles int8-quantized proj
    x = linear(p["fc1"], x)
    if cfg.kind == "mlp2x_gelu":
        x = linear(p["fc2"], jax.nn.gelu(x))
    return x


def init_vlm_params(cfg: VLMConfig, key: jax.Array) -> PyTree:
    kv, kp, kl, kq = jax.random.split(key, 4)
    params = {
        "vision": init_vit_params(cfg.vision, kv),
        "projector": init_projector_params(cfg.projector, kp, cfg.lm.dtype),
        "lm": init_lm_params(cfg.lm, kl),
    }
    if cfg.qformer is not None:
        from vlrlhf_tpu.models.vision.qformer import init_qformer_params

        params["qformer"] = init_qformer_params(cfg.qformer, kq)
    return params


def encode_images(
    cfg: VLMConfig,
    params: PyTree,
    pixel_values: jax.Array,  # (B*n_img, H, W, 3) normalized or uint8
    ctx: Optional[Ctx] = None,
    qformer_ids: Optional[jax.Array] = None,  # (B*n_img, T) InstructBLIP
    qformer_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Run the tower (+ Q-Former) + projector:
    (B*n_img, num_image_tokens, lm_hidden)."""
    ctx = ctx or Ctx()
    if pixel_values.dtype == jnp.uint8:
        x = pixel_values.astype(jnp.float32) / 255.0
        mean = jnp.asarray(cfg.image_mean, jnp.float32)
        std = jnp.asarray(cfg.image_std, jnp.float32)
        pixel_values = ((x - mean) / std).astype(cfg.lm.dtype)
    feats = vit_forward(cfg.vision, params["vision"], pixel_values, ctx.sub("vision"))
    if cfg.qformer is not None:
        from vlrlhf_tpu.models.vision.qformer import qformer_forward

        feats = qformer_forward(
            cfg.qformer, params["qformer"], feats, qformer_ids, qformer_mask
        )
    return projector_forward(cfg.projector, params["projector"], feats)


def vlm_embeds(
    cfg: VLMConfig,
    params: PyTree,
    *,
    input_ids: jax.Array,  # (B, S) — placeholders already expanded
    pixel_values: Optional[jax.Array] = None,  # (B, n_img, H, W, 3)
    image_positions: Optional[jax.Array] = None,
    ctx: Optional[Ctx] = None,
    image_features: Optional[jax.Array] = None,  # precomputed (skip tower)
    qformer_ids: Optional[jax.Array] = None,
    qformer_mask: Optional[jax.Array] = None,
    anyres_gather: Optional[jax.Array] = None,  # (B, n_tok) llava-next map
) -> jax.Array:
    """Token embeddings with image features merged in — the multimodal half
    of vlm_forward, exposed for callers that feed the LM in pieces."""
    ctx = ctx or Ctx()
    embeds = embed(params["lm"]["embed_tokens"], input_ids, cfg.lm.dtype)

    if image_features is None and pixel_values is not None:
        b, n_img = pixel_values.shape[:2]
        flat = pixel_values.reshape(b * n_img, *pixel_values.shape[2:])
        image_features = encode_images(
            cfg, params, flat, ctx, qformer_ids, qformer_mask
        )
        if anyres_gather is not None:
            # LLaVA-Next anyres: per-row static gather over tile features +
            # learned image_newline rows (models/anyres.py).
            from vlrlhf_tpu.models.anyres import gather_anyres_features

            d = image_features.shape[-1]
            tiled = image_features.reshape(b, -1, d)
            newline = params["image_newline"]["embedding"]
            image_features = jax.vmap(
                lambda f, g: gather_anyres_features(f, g, newline)
            )(tiled, anyres_gather)
        else:
            image_features = image_features.reshape(
                b, n_img * cfg.num_image_tokens, -1
            )

    if image_features is not None:
        assert image_positions is not None
        embeds = merge_multimodal_embeddings(
            embeds, image_features, image_positions
        )
    return embeds


def vlm_forward(
    cfg: VLMConfig,
    params: PyTree,
    *,
    input_ids: jax.Array,  # (B, S) — placeholders already expanded
    pixel_values: Optional[jax.Array] = None,  # (B, n_img, H, W, 3)
    image_positions: Optional[jax.Array] = None,  # (B, n_img*num_image_tokens)
    pad_mask: Optional[jax.Array] = None,
    segment_ids: Optional[jax.Array] = None,
    positions: Optional[jax.Array] = None,
    ctx: Optional[Ctx] = None,
    cache: Optional[dict] = None,
    kv_mask: Optional[jax.Array] = None,
    cache_len: Optional[int] = None,  # empty-prefill mode (lm_forward)
    kv_cache_dtype=None,
    image_features: Optional[jax.Array] = None,  # precomputed (skip tower)
    qformer_ids: Optional[jax.Array] = None,
    qformer_mask: Optional[jax.Array] = None,
    anyres_gather: Optional[jax.Array] = None,  # (B, n_tok) llava-next map
    return_logits: bool = True,
    return_hidden: bool = False,
):
    """Returns (logits, new_cache). Text-only batches: pixel_values=None."""
    ctx = ctx or Ctx()
    embeds = vlm_embeds(
        cfg, params,
        input_ids=input_ids, pixel_values=pixel_values,
        image_positions=image_positions, ctx=ctx,
        image_features=image_features, qformer_ids=qformer_ids,
        qformer_mask=qformer_mask, anyres_gather=anyres_gather,
    )

    if cfg.plora and image_positions is not None:
        ctx = dataclasses.replace(
            ctx,
            lora_mask=image_position_mask(image_positions, input_ids.shape[1]),
            # checkpoint-built-in trained PLoRA rides with params (attached
            # by cli/loading.py for internlm_xc2) — active in every forward,
            # gated to the image positions by lora_mask
            base_adapters=params.get("plora", ctx.base_adapters),
        )

    return lm_forward(
        cfg.lm,
        params["lm"],
        inputs_embeds=embeds,
        positions=positions,
        pad_mask=pad_mask,
        segment_ids=segment_ids,
        ctx=ctx.sub("lm"),
        cache=cache,
        kv_mask=kv_mask,
        cache_len=cache_len,
        kv_cache_dtype=kv_cache_dtype,
        return_logits=return_logits,
        return_hidden=return_hidden,
    )


def lm_head_fn(cfg: VLMConfig, params: PyTree, ctx: Optional[Ctx]):
    """(B, C, H) -> (B, C, V) chunk head for losses.chunked_logps — the same
    projection lm_forward applies (tied-embedding dot_general avoids
    materializing the (H, V) transpose; lm_head LoRA adapters, if targeted,
    apply per chunk via ctx)."""
    from vlrlhf_tpu.models.common import linear

    lm_params = params["lm"]
    lm_ctx = (ctx or Ctx()).sub("lm")
    if cfg.lm.tie_embeddings:
        emb = lm_params["embed_tokens"]["embedding"]  # (V, H)
        return lambda hc: jax.lax.dot_general(
            hc, emb.astype(hc.dtype), (((2,), (1,)), ((), ()))
        )
    return lambda hc: linear(lm_params["lm_head"], hc, lm_ctx.sub("lm_head"))


# ─────────────────── reward / value heads ───────────────────


def init_rm_head(hidden_size: int, dtype, key: Optional[jax.Array] = None) -> PyTree:
    """Zero-init scalar head scoring the last real token — matches the
    reference's VLRewardModel (/root/reference/src/vlrlhf/base/model.py:12-35,
    zero-init per its `_init_weights`)."""
    del key
    return {"kernel": jnp.zeros((hidden_size, 1), dtype)}


def reward_forward(
    cfg: VLMConfig,
    params: PyTree,  # includes "rm_head"
    *,
    pad_mask: jax.Array,
    ctx: Optional[Ctx] = None,
    **kwargs,
) -> jax.Array:
    """Scalar reward per sequence: linear head on the last non-pad hidden."""
    (logits, hidden), _ = vlm_forward(
        cfg,
        params,
        pad_mask=pad_mask,
        ctx=ctx,
        return_logits=True,
        return_hidden=True,
        **kwargs,
    )
    del logits
    scores = hidden @ params["rm_head"]["kernel"].astype(hidden.dtype)  # (B,S,1)
    last = jnp.sum(pad_mask.astype(jnp.int32), axis=1) - 1  # (B,)
    return jnp.take_along_axis(scores[..., 0], last[:, None], axis=1)[:, 0]


def init_value_head(hidden_size: int, dtype, key: jax.Array) -> PyTree:
    """Value head for PPO (TRL's v_head equivalent, base/model.py:141-201)."""
    return init_linear(key, hidden_size, 1, True, dtype, scale=0.0)


def value_forward(hidden: jax.Array, v_head: PyTree) -> jax.Array:
    return linear(v_head, hidden.astype(jnp.float32))[..., 0]  # (B, S)
