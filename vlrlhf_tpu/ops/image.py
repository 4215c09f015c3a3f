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


def _torch_bicubic_matrix(n_in: int, n_out: int) -> jax.Array:
    """(n_out, n_in) interpolation matrix matching torch.nn.functional.
    interpolate(mode='bicubic', align_corners=False, antialias=False):
    cubic convolution kernel with a = -0.75, border clamping.

    Exactness matters: interpolated positional tables feed released Qwen-VL
    weights (models/QwenVL/visual.py:24-45 get_abs_pos); a different cubic
    kernel (jax.image.resize uses a = -0.5) shifts every patch embedding.
    """
    import numpy as np

    a = -0.75

    def cubic(x):
        x = np.abs(x)
        out = np.where(
            x <= 1,
            (a + 2) * x**3 - (a + 3) * x**2 + 1,
            np.where(x < 2, a * x**3 - 5 * a * x**2 + 8 * a * x - 4 * a, 0.0),
        )
        return out

    scale = n_in / n_out
    w = np.zeros((n_out, n_in), np.float64)
    for i in range(n_out):
        # align_corners=False source coordinate
        src = (i + 0.5) * scale - 0.5
        base = int(np.floor(src))
        frac = src - base
        for k in range(-1, 3):
            idx = int(np.clip(base + k, 0, n_in - 1))
            w[i, idx] += cubic(k - frac)
    return jnp.asarray(w, jnp.float32)


def interpolate_pos_embed(
    pos_embed: jax.Array,  # (n_old, d) patch-grid positional table (no cls)
    n_new: int,
) -> jax.Array:
    """Bicubic 2D interpolation of a square patch-grid positional embedding
    (the reference's get_abs_pos, models/QwenVL/visual.py:24-45), numerically
    matching torch F.interpolate(bicubic, align_corners=False)."""
    n_old, d = pos_embed.shape
    g_old = int(round(n_old**0.5))
    g_new = int(round(n_new**0.5))
    if g_old * g_old != n_old or g_new * g_new != n_new:
        raise ValueError(f"non-square grids: {n_old} -> {n_new}")
    if g_old == g_new:
        return pos_embed
    w = _torch_bicubic_matrix(g_old, g_new)  # (g_new, g_old)
    grid = pos_embed.reshape(g_old, g_old, d).astype(jnp.float32)
    grid = jnp.einsum("ij,jkd->ikd", w, grid)  # rows
    grid = jnp.einsum("kj,ijd->ikd", w, grid)  # cols
    return grid.reshape(g_new * g_new, d).astype(pos_embed.dtype)
