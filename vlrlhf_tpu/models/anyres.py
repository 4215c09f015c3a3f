"""LLaVA-Next "anyres" multi-patch image handling, TPU-static.

The reference merges variable-length anyres features inside the model forward
with dynamic shapes (models/LlavaNext/__init__.py:38-171: pack_image_features,
spatial unpad, image_newline). TPU-first redesign:

  HOST (this module, at collate time — the image header gives us the size):
    - select_best_resolution over image_grid_pinpoints
    - tile geometry: 1 base tile (squash-resized) + grid tiles
      (aspect-preserving resize + pad, then split)
    - the UNPAD + newline layout is precomputed as a gather INDEX MAP from
      the flattened per-tile feature grid to the final token stream
      (NEWLINE_IDX marks image_newline positions)

  DEVICE (gather_anyres_features): one static-shape gather over the tower's
  patch features + a broadcast of the learned newline embedding. No dynamic
  shapes anywhere; unused slots carry index PAD_IDX and scatter nowhere.

Token count per image = 576 (base) + unpadded_h * (unpadded_w + 1), exactly
matching HF's pack_image_features so ported checkpoints see identical
sequences (verified in tests/test_anyres.py against transformers).
"""

from __future__ import annotations

import math
from typing import Sequence

import numpy as np

NEWLINE_IDX = -1
PAD_IDX = -2

DEFAULT_GRID_PINPOINTS = (
    (336, 672), (672, 336), (672, 672), (1008, 336), (336, 1008),
)


def anyres_max_dims(
    grid_pinpoints=DEFAULT_GRID_PINPOINTS,
    tile_size: int = 336,
    tile_grid: int = 24,
) -> tuple[int, int]:
    """Static worst-case (n_tiles, n_tokens) over the pinpoint grid — the
    fixed collation shapes for multi-process training and honest anyres
    benching (unpad can only shrink below this bound)."""
    per_tile = tile_grid * tile_grid
    max_tiles, max_tok = 1, per_tile
    for h, w in grid_pinpoints:
        th, tw = h // tile_size, w // tile_size
        max_tiles = max(max_tiles, 1 + th * tw)
        gh, gw = th * tile_grid, tw * tile_grid
        max_tok = max(max_tok, per_tile + gh * (gw + 1))
    return max_tiles, max_tok


def select_best_resolution(
    orig_size: tuple[int, int],  # (height, width)
    grid_pinpoints: Sequence[tuple[int, int]],
) -> tuple[int, int]:
    """HF's select_best_resolution: maximize effective resolution, then
    minimize wasted area."""
    oh, ow = orig_size
    best_fit = None
    max_effective = 0
    min_wasted = float("inf")
    for h, w in grid_pinpoints:
        scale = min(w / ow, h / oh)
        dw, dh = int(ow * scale), int(oh * scale)
        effective = min(dw * dh, ow * oh)
        wasted = w * h - effective
        if effective > max_effective or (
            effective == max_effective and wasted < min_wasted
        ):
            max_effective = effective
            min_wasted = wasted
            best_fit = (h, w)
    return best_fit


def unpadded_feature_dims(
    orig_size: tuple[int, int],
    grid_h: int,  # feature rows = n_tiles_h * per_tile_grid
    grid_w: int,
) -> tuple[int, int, int, int]:
    """(new_h, new_w, pad_top, pad_left) after aspect-ratio unpad (HF's
    unpad_image in feature space)."""
    oh, ow = orig_size
    original_ar = ow / oh
    current_ar = grid_w / grid_h
    # HF's unpad_image slices [pad : current - pad] — symmetric removal, so
    # the kept extent is current - 2*pad (NOT the rescaled size itself).
    if original_ar > current_ar:
        scale = grid_w / ow
        new_h = int(round(oh * scale, 7))
        pad = (grid_h - new_h) // 2
        return grid_h - 2 * pad, grid_w, pad, 0
    scale = grid_h / oh
    new_w = int(round(ow * scale, 7))
    pad = (grid_w - new_w) // 2
    return grid_h, grid_w - 2 * pad, 0, pad


def anyres_plan(
    orig_size: tuple[int, int],  # (height, width) of the original image
    grid_pinpoints=DEFAULT_GRID_PINPOINTS,
    tile_size: int = 336,
    tile_grid: int = 24,  # feature grid per tile (336/14)
) -> dict:
    """Host-side plan for one image.

    Returns:
      best_resolution  (h, w)
      n_tiles          total tiles incl. base (== pixel rows to encode)
      tiles_hw         (tiles_h, tiles_w) of the anyres grid
      n_tokens         final token count (base + unpadded + newlines)
      gather           int32 (n_tokens,): index into the flattened
                       (n_tiles * tile_grid**2) feature space; NEWLINE_IDX
                       marks newline slots. Base tile comes first, its
                       features taken verbatim.
    """
    best = select_best_resolution(orig_size, grid_pinpoints)
    tiles_h, tiles_w = best[0] // tile_size, best[1] // tile_size
    n_grid_tiles = tiles_h * tiles_w
    n_tiles = 1 + n_grid_tiles  # base first (HF puts base features first)

    per_tile = tile_grid * tile_grid
    base = np.arange(per_tile, dtype=np.int32)  # base tile is tile 0

    grid_h = tiles_h * tile_grid
    grid_w = tiles_w * tile_grid
    new_h, new_w, pad_top, pad_left = unpadded_feature_dims(
        orig_size, grid_h, grid_w
    )

    # flat index of feature (r, c) in the anyres grid: tiles are encoded in
    # row-major tile order; within a tile features are row-major too.
    def flat_index(r: int, c: int) -> int:
        tile_r, tile_c = r // tile_grid, c // tile_grid
        in_r, in_c = r % tile_grid, c % tile_grid
        tile_idx = 1 + tile_r * tiles_w + tile_c  # +1: base tile is 0
        return tile_idx * per_tile + in_r * tile_grid + in_c

    rows = []
    for r in range(pad_top, pad_top + new_h):
        for c in range(pad_left, pad_left + new_w):
            rows.append(flat_index(r, c))
        rows.append(NEWLINE_IDX)
    gather = np.concatenate([base, np.asarray(rows, np.int32)])
    return {
        "best_resolution": best,
        "n_tiles": n_tiles,
        "tiles_hw": (tiles_h, tiles_w),
        "n_tokens": int(gather.shape[0]),
        "gather": gather,
    }


def load_anyres_tiles(
    path: str,
    plan: dict,
    tile_size: int = 336,
) -> np.ndarray:
    """Host decode + tiling: (n_tiles, tile, tile, 3) uint8. Tile 0 = base
    (squash resize); tiles 1.. = aspect-preserving resize + pad, split
    row-major (HF LlavaNextImageProcessor geometry)."""
    from PIL import Image

    img = Image.open(path).convert("RGB")
    return tiles_from_image(np.asarray(img, np.uint8), plan, tile_size)


def tiles_from_image(
    img: np.ndarray, plan: dict, tile_size: int = 336
) -> np.ndarray:
    from PIL import Image

    pil = Image.fromarray(img)
    ow, oh = pil.size
    best_h, best_w = plan["best_resolution"]
    out = np.zeros((plan["n_tiles"], tile_size, tile_size, 3), np.uint8)
    out[0] = np.asarray(
        pil.resize((tile_size, tile_size), Image.BICUBIC), np.uint8
    )
    # aspect-preserving resize into (best_h, best_w) canvas, centered
    scale = min(best_w / ow, best_h / oh)
    nw, nh = int(ow * scale), int(oh * scale)
    resized = pil.resize((nw, nh), Image.BICUBIC)
    canvas = np.zeros((best_h, best_w, 3), np.uint8)
    top, left = (best_h - nh) // 2, (best_w - nw) // 2
    canvas[top : top + nh, left : left + nw] = np.asarray(resized, np.uint8)
    tiles_h, tiles_w = plan["tiles_hw"]
    t = 1
    for r in range(tiles_h):
        for c in range(tiles_w):
            out[t] = canvas[
                r * tile_size : (r + 1) * tile_size,
                c * tile_size : (c + 1) * tile_size,
            ]
            t += 1
    return out


def gather_anyres_features(patch_features, gather_idx, newline_embed):
    """Device-side: (n_tiles*per_tile, D) features + (n_tokens,) index map ->
    (n_tokens, D), with NEWLINE_IDX slots carrying the newline embedding and
    PAD_IDX slots zeroed. Static shapes; jit/vmap friendly."""
    import jax.numpy as jnp

    flat = patch_features.reshape(-1, patch_features.shape[-1])
    safe = jnp.where(gather_idx >= 0, gather_idx, 0)
    gathered = jnp.take(flat, safe, axis=0)
    is_newline = (gather_idx == NEWLINE_IDX)[:, None]
    is_pad = (gather_idx == PAD_IDX)[:, None]
    out = jnp.where(is_newline, newline_embed[None].astype(gathered.dtype), gathered)
    return jnp.where(is_pad, 0.0, out)
