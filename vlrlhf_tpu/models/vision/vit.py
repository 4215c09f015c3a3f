"""Generic ViT encoder: one implementation for every reference vision tower.

Covers (by config):
  - CLIP ViT-L/14 @ 336 (LLaVA-1.5/Next, InternLM-XC2's tower,
    /root/reference/src/vlrlhf/models/InternLMXC2/build_mlp.py:9-31):
    class token, pre-LN, quick_gelu, penultimate feature layer.
  - ViT-bigG @ 448 (Qwen-VL, models/QwenVL/visual.py:99-155): no class token,
    pre-LN, gelu, bicubic pos-embed interpolation; its Resampler lives in
    vision/resampler.py.
  - InstructBLIP's EVA-ViT-g: no pre-LN, post-LN off, qkv bias.

Pre-LN transformer blocks, scanned over a stacked layer axis like the LM.
`feature_layer=-2` (LLaVA's vision_feature_layer) truncates the scan — the
last layer's params are simply never touched, the TPU-native equivalent of
taking hidden_states[-2].
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp

from vlrlhf_tpu.models.common import Ctx, init_linear, linear
from vlrlhf_tpu.ops.attention import multi_head_attention
from vlrlhf_tpu.ops.image import interpolate_pos_embed
from vlrlhf_tpu.ops.norms import layer_norm

PyTree = Any


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    image_size: int = 336
    patch_size: int = 14
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    mlp_dim: int = 4096
    use_class_token: bool = True
    use_pre_norm: bool = True  # CLIP's pre_layrnorm / Qwen's ln_pre
    use_post_norm: bool = True
    act: str = "quick_gelu"  # 'gelu' | 'quick_gelu'
    # None = all layers (+post norm). -2 = penultimate layer output, no post
    # norm (LLaVA's vision_feature_layer=-2).
    feature_layer: Optional[int] = None
    drop_class_token: bool = False  # LLaVA's 'default' select strategy
    patch_bias: bool = False
    ln_eps: float = 1e-5
    dtype: Any = jnp.bfloat16
    remat: bool = True

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid * self.grid

    @property
    def seq_len(self) -> int:
        return self.num_patches + (1 if self.use_class_token else 0)


def _act(name: str):
    if name == "quick_gelu":
        return lambda x: x * jax.nn.sigmoid(1.702 * x)
    return jax.nn.gelu


def init_vit_params(cfg: ViTConfig, key: jax.Array) -> PyTree:
    keys = jax.random.split(key, 6)
    h, p = cfg.hidden_size, cfg.patch_size
    dt = cfg.dtype

    def layer(k):
        ks = jax.random.split(k, 6)
        return {
            "ln1": {"weight": jnp.ones((h,), dt), "bias": jnp.zeros((h,), dt)},
            "ln2": {"weight": jnp.ones((h,), dt), "bias": jnp.zeros((h,), dt)},
            "attn": {
                "wq": init_linear(ks[0], h, h, True, dt),
                "wk": init_linear(ks[1], h, h, True, dt),
                "wv": init_linear(ks[2], h, h, True, dt),
                "wo": init_linear(ks[3], h, h, True, dt),
            },
            "mlp": {
                "fc1": init_linear(ks[4], h, cfg.mlp_dim, True, dt),
                "fc2": init_linear(ks[5], cfg.mlp_dim, h, True, dt),
            },
        }

    stacked = [layer(jax.random.fold_in(keys[0], i)) for i in range(cfg.num_layers)]
    params = {
        "patch_embed": {
            "kernel": (jax.random.normal(keys[1], (p, p, 3, h)) * 0.02).astype(dt)
        },
        "pos_embed": {
            "embedding": (
                jax.random.normal(keys[2], (cfg.seq_len, h)) * 0.02
            ).astype(dt)
        },
        "layers_scanned": jax.tree.map(lambda *xs: jnp.stack(xs), *stacked),
    }
    if cfg.patch_bias:
        params["patch_embed"]["bias"] = jnp.zeros((h,), dt)
    if cfg.use_class_token:
        params["cls"] = {"token": jnp.zeros((h,), dt)}
    if cfg.use_pre_norm:
        params["ln_pre"] = {
            "weight": jnp.ones((h,), dt),
            "bias": jnp.zeros((h,), dt),
        }
    if cfg.use_post_norm:
        params["ln_post"] = {
            "weight": jnp.ones((h,), dt),
            "bias": jnp.zeros((h,), dt),
        }
    return params


def vit_forward(
    cfg: ViTConfig,
    params: PyTree,
    pixel_values: jax.Array,  # (B, H, W, 3) normalized float
    ctx: Optional[Ctx] = None,
) -> jax.Array:
    """Returns (B, n_tokens, hidden) image features."""
    ctx = ctx or Ctx()
    dt = cfg.dtype
    x = jax.lax.conv_general_dilated(
        pixel_values.astype(dt),
        params["patch_embed"]["kernel"].astype(dt),
        window_strides=(cfg.patch_size, cfg.patch_size),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    b = x.shape[0]
    x = x.reshape(b, -1, cfg.hidden_size)  # (B, grid*grid, h)
    if "bias" in params["patch_embed"]:
        x = x + params["patch_embed"]["bias"].astype(dt)

    pos = params["pos_embed"]["embedding"].astype(dt)
    n_patches = x.shape[1]
    if cfg.use_class_token:
        cls = jnp.broadcast_to(
            params["cls"]["token"].astype(dt)[None, None], (b, 1, cfg.hidden_size)
        )
        cls_pos, grid_pos = pos[:1], pos[1:]
        if grid_pos.shape[0] != n_patches:
            grid_pos = interpolate_pos_embed(grid_pos, n_patches)
        x = jnp.concatenate([cls + cls_pos[None], x + grid_pos[None]], axis=1)
    else:
        if pos.shape[0] != n_patches:
            pos = interpolate_pos_embed(pos, n_patches)
        x = x + pos[None]

    if cfg.use_pre_norm:
        x = layer_norm(
            x, params["ln_pre"]["weight"], params["ln_pre"]["bias"], cfg.ln_eps
        )

    n_layers = cfg.num_layers
    use_post = cfg.use_post_norm
    if cfg.feature_layer is not None and cfg.feature_layer != -1:
        n_layers = cfg.num_layers + 1 + cfg.feature_layer  # -2 -> L-1 layers
        use_post = False

    act = _act(cfg.act)
    nh = cfg.num_heads
    hd = cfg.hidden_size // nh
    layer_ctx = ctx.sub("layers_scanned")

    def body(carry, lp):
        x = carry
        h = layer_norm(x, lp["ln1"]["weight"], lp["ln1"]["bias"], cfg.ln_eps)
        s = h.shape[1]
        q = linear(lp["attn"]["wq"], h).reshape(b, s, nh, hd)
        k = linear(lp["attn"]["wk"], h).reshape(b, s, nh, hd)
        v = linear(lp["attn"]["wv"], h).reshape(b, s, nh, hd)
        attn = multi_head_attention(
            q, k, v, causal=False, impl=layer_ctx.attn_impl
        ).reshape(b, s, cfg.hidden_size)
        x = x + linear(lp["attn"]["wo"], attn)
        h = layer_norm(x, lp["ln2"]["weight"], lp["ln2"]["bias"], cfg.ln_eps)
        h = linear(lp["mlp"]["fc2"], act(linear(lp["mlp"]["fc1"], h)))
        return x + h, None

    if cfg.remat:
        body = jax.checkpoint(body, prevent_cse=False)

    stacked = jax.tree.map(lambda a: a[:n_layers], params["layers_scanned"])
    x, _ = jax.lax.scan(body, x, stacked)

    if use_post:
        x = layer_norm(
            x, params["ln_post"]["weight"], params["ln_post"]["bias"], cfg.ln_eps
        )
    if cfg.drop_class_token and cfg.use_class_token:
        x = x[:, 1:]
    return x
