"""Fused, jittable image preprocessing.

Replaces the reference's host-side torchvision/PIL pipelines
(/root/reference/src/vlrlhf/models/InternLMXC2/__init__.py:323-337 Resize/
ToTensor/Normalize, models/QwenVL/visual.py:356-362, and the HF image
processors used by the Llava/InstructBlip collators): decode stays on host
(jpeg), but resize + rescale + normalize run as ONE jitted XLA op on device,
so the collator ships raw uint8 and the TPU does the math (north-star:
device-side prefetch into HBM, BASELINE.json).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp

# CLIP / OpenAI defaults, used by all five reference model families.
CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


@dataclasses.dataclass(frozen=True)
class ImagePreprocessConfig:
    size: int = 336  # output H == W
    mean: Sequence[float] = CLIP_MEAN
    std: Sequence[float] = CLIP_STD
    method: str = "bicubic"  # jax.image.resize: 'bilinear'|'bicubic'
    dtype: jnp.dtype = jnp.float32


def preprocess_images(
    images: jax.Array,  # (B, H, W, 3) uint8 or float
    cfg: ImagePreprocessConfig,
) -> jax.Array:
    """uint8 HWC -> normalized float (B, size, size, 3). Jittable, fusable."""
    x = images.astype(jnp.float32) / 255.0
    b = x.shape[0]
    method = "cubic" if cfg.method == "bicubic" else cfg.method
    x = jax.image.resize(x, (b, cfg.size, cfg.size, 3), method=method)
    mean = jnp.asarray(cfg.mean, jnp.float32)
    std = jnp.asarray(cfg.std, jnp.float32)
    x = (x - mean) / std
    return x.astype(cfg.dtype)


def interpolate_pos_embed(
    pos_embed: jax.Array,  # (n_old, d) patch-grid positional table (no cls)
    n_new: int,
) -> jax.Array:
    """Bicubic 2D interpolation of a square patch-grid positional embedding
    (the reference's get_abs_pos, models/QwenVL/visual.py:24-45)."""
    n_old, d = pos_embed.shape
    g_old = int(round(n_old**0.5))
    g_new = int(round(n_new**0.5))
    if g_old * g_old != n_old or g_new * g_new != n_new:
        raise ValueError(f"non-square grids: {n_old} -> {n_new}")
    if g_old == g_new:
        return pos_embed
    grid = pos_embed.reshape(1, g_old, g_old, d).astype(jnp.float32)
    grid = jax.image.resize(grid, (1, g_new, g_new, d), method="cubic")
    return grid.reshape(g_new * g_new, d).astype(pos_embed.dtype)
