"""Collators: tokenized rows -> static-shape numpy device batches.

Replaces the reference's torch pad_sequence collators
(/root/reference/src/vlrlhf/base/collator.py) and the per-model PIL+CLIP
image attachment (models/Llava/__init__.py:435-471). TPU-first differences:

  - BUCKETED padding: batch length rounds up to a multiple of
    `bucket_multiple`, so XLA compiles a handful of shapes instead of one per
    batch (the reference pads to the exact batch max — a new CUDA graph per
    length is fine on GPU, a recompile per length is not on TPU).
  - image placeholders are expanded host-side and the position map shipped,
    making the device merge static-shape (models/common.py).
  - images ship as raw uint8 (host: decode + resize only); rescale/normalize
    fuse into the tower on device.
  - DPO batches are pre-concatenated [chosen; rejected] (the reference does
    this on device every step, base/trainer.py:124-146).
  - DDPO diff masks are precomputed here (data/diffmask.py), not per-step.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Sequence

import numpy as np

from vlrlhf_tpu.data.diffmask import diff_masks
from vlrlhf_tpu.data.processor import LABEL_PAD, VLProcessor


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def default_image_loader(path: str, size: int, mode: str = "shortest_edge_crop"):
    """Host-side decode + resize to (size, size, 3) uint8.

    mode 'shortest_edge_crop' = CLIP-style resize+center-crop (HF processors
    for Llava/LlavaNext/InstructBlip); 'squash' = plain resize (XC2/Qwen).
    """
    from PIL import Image

    img = Image.open(path).convert("RGB")
    if mode == "squash":
        img = img.resize((size, size), Image.BICUBIC)
    else:
        w, h = img.size
        scale = size / min(w, h)
        img = img.resize((round(w * scale), round(h * scale)), Image.BICUBIC)
        w, h = img.size
        left, top = (w - size) // 2, (h - size) // 2
        img = img.crop((left, top, left + size, top + size))
    return np.asarray(img, np.uint8)


@dataclasses.dataclass
class CollatorConfig:
    pad_token_id: int = 0
    bucket_multiple: int = 128
    max_images: int = 1
    image_size: int = 336
    resize_mode: str = "shortest_edge_crop"
    # DDPO: precompute diff masks.
    compute_diff_mask: bool = False
    diff_min_match_size: int = 3
    # LLaVA-Next anyres: variable patch grids + gather-map packing
    # (models/anyres.py). tile_grid = vision feature grid per tile.
    anyres: bool = False
    grid_pinpoints: tuple = ()
    tile_grid: int = 24
    # Static shapes for multi-process training: every process must collate
    # identical array shapes for jax.make_array_from_process_local_data, so
    # bucketing by batch max (process-dependent) is replaced by fixed pads.
    pad_to: int = 0  # 0 = bucket by batch max (single-process)
    qformer_pad_to: int = 0
    anyres_min_tiles: int = 0  # lower bounds on the anyres batch dims;
    anyres_min_tokens: int = 0  # set to the grid max for multi-process


class _CollatorBase:
    def __init__(
        self,
        processor: VLProcessor,
        cfg: CollatorConfig,
        image_loader: Optional[Callable] = None,
    ):
        self.processor = processor
        self.cfg = cfg
        # None = default pipeline (native batch decode when available,
        # PIL otherwise); a custom callable disables the native fast path.
        self.image_loader = image_loader

    def _load_images(self, img_paths: Sequence) -> np.ndarray:
        """(B, max_images, H, W, 3) uint8; missing slots zeroed.

        When every image is a JPEG and no custom loader is set, the whole
        batch decodes through the native thread pool in one call (GIL-free,
        native/imageops.cpp)."""
        b = len(img_paths)
        s = self.cfg.image_size
        flat: list = []
        slots: list[tuple[int, int]] = []
        for i, paths in enumerate(img_paths):
            if paths is None:
                continue
            if isinstance(paths, str):
                paths = [paths]
            for j, p in enumerate(paths[: self.cfg.max_images]):
                flat.append(p)
                slots.append((i, j))

        out = np.zeros((b, self.cfg.max_images, s, s, 3), np.uint8)
        if not flat:
            return out
        if self.image_loader is None and all(
            isinstance(p, str) and p.lower().endswith((".jpg", ".jpeg"))
            for p in flat
        ):
            from vlrlhf_tpu.data.native_image import load_batch

            decoded = load_batch(flat, s, self.cfg.resize_mode)
            if decoded is not None:
                for (i, j), img in zip(slots, decoded):
                    out[i, j] = img
                return out
        loader = self.image_loader or default_image_loader
        for (i, j), p in zip(slots, flat):
            out[i, j] = loader(p, s, self.cfg.resize_mode)
        return out

    def _anyres_meta(self, img_paths: Sequence):
        """Per-row anyres plan + tiles. Rows without an image get count 0."""
        from vlrlhf_tpu.models.anyres import (
            DEFAULT_GRID_PINPOINTS,
            PAD_IDX,
            anyres_plan,
            load_anyres_tiles,
        )

        pinpoints = self.cfg.grid_pinpoints or DEFAULT_GRID_PINPOINTS
        plans, tiles = [], []
        for paths in img_paths:
            path = paths[0] if isinstance(paths, list) else paths
            if path is None:
                plans.append(None)
                tiles.append(None)
                continue
            from PIL import Image

            with Image.open(path) as im:
                w, h = im.size
            plan = anyres_plan(
                (h, w), pinpoints, self.cfg.image_size, self.cfg.tile_grid
            )
            plans.append(plan)
            tiles.append(load_anyres_tiles(path, plan, self.cfg.image_size))
        max_tiles = max(
            max((p["n_tiles"] for p in plans if p), default=1),
            self.cfg.anyres_min_tiles or 1,
        )
        max_tok = max(
            max((p["n_tokens"] for p in plans if p), default=1),
            self.cfg.anyres_min_tokens or 1,
        )
        s = self.cfg.image_size
        pixel = np.zeros((len(img_paths), max_tiles, s, s, 3), np.uint8)
        gather = np.full((len(img_paths), max_tok), PAD_IDX, np.int32)
        counts = []
        for i, (plan, t) in enumerate(zip(plans, tiles)):
            if plan is None:
                counts.append([])
                continue
            pixel[i, : plan["n_tiles"]] = t
            gather[i, : plan["n_tokens"]] = plan["gather"]
            counts.append([plan["n_tokens"]])
        return pixel, gather, counts

    def _qformer_batch(self, rows: list[dict]) -> dict:
        """Padded Q-Former instruction ids (InstructBLIP)."""
        if not rows or "qformer_input_ids" not in rows[0]:
            return {}
        ids = [np.asarray(r["qformer_input_ids"]) for r in rows]
        L = self.cfg.qformer_pad_to or max(len(x) for x in ids)
        out = np.zeros((len(ids), L), np.int32)
        mask = np.zeros((len(ids), L), bool)
        for i, x in enumerate(ids):
            out[i, : len(x)] = x
            mask[i, : len(x)] = True
        return {"qformer_input_ids": out, "qformer_mask": mask}

    def _pad_rows(
        self,
        rows: list[np.ndarray],
        pad_value: int,
        length: int,
        dtype=np.int32,
    ) -> np.ndarray:
        out = np.full((len(rows), length), pad_value, dtype)
        for i, r in enumerate(rows):
            out[i, : len(r)] = r[:length]
        return out


class DPOCollator(_CollatorBase):
    """Rows from tokenize_row_dpo -> concatenated [chosen; rejected] batch."""

    def __call__(self, rows: list[dict]) -> dict[str, Any]:
        cfg = self.cfg
        n_img_tok = self.processor.cfg.num_image_tokens
        exp = self.processor.expand_image_tokens

        anyres_meta = None
        counts = [None] * len(rows)
        if cfg.anyres:
            pixel, gather, counts = self._anyres_meta(
                [r.get("img_path") for r in rows]
            )
            anyres_meta = (pixel, gather)

        chosen, rejected = [], []
        for row, cnt in zip(rows, counts):
            c_ids, c_lab, c_pos = exp(
                row["chosen_input_ids"], row["chosen_labels"], cnt
            )
            r_ids, r_lab, r_pos = exp(
                row["rejected_input_ids"], row["rejected_labels"], cnt
            )
            chosen.append((c_ids, c_lab, c_pos))
            rejected.append((r_ids, r_lab, r_pos))

        max_len = max(len(x[0]) for x in chosen + rejected)
        L = cfg.pad_to or _round_up(max_len, cfg.bucket_multiple)
        all_rows = chosen + rejected  # [chosen...; rejected...]
        ids = self._pad_rows([x[0] for x in all_rows], cfg.pad_token_id, L)
        labels = self._pad_rows(
            [x[1] for x in all_rows], LABEL_PAD, L, np.int64
        )
        pad_mask = self._pad_rows(
            [np.ones(len(x[0]), np.int32) for x in all_rows], 0, L
        ).astype(bool)

        n_pos = (
            anyres_meta[1].shape[1]
            if anyres_meta is not None
            else cfg.max_images * n_img_tok
        )
        img_pos = np.full((len(all_rows), n_pos), -1, np.int32)
        for i, (_, _, pos) in enumerate(all_rows):
            img_pos[i, : len(pos)] = pos

        batch = {
            "input_ids": ids,
            "labels": labels,
            "pad_mask": pad_mask,
            "image_positions": img_pos,
        }
        if anyres_meta is not None:
            batch["pixel_values"] = anyres_meta[0]
            batch["anyres_gather"] = anyres_meta[1]
        else:
            batch["pixel_values"] = self._load_images(
                [r.get("img_path") for r in rows]
            )
        batch.update(self._qformer_batch(rows))
        if "ref_chosen_logp" in rows[0]:
            batch["ref_chosen_logps"] = np.asarray(
                [r["ref_chosen_logp"] for r in rows], np.float32
            )
            batch["ref_rejected_logps"] = np.asarray(
                [r["ref_rejected_logp"] for r in rows], np.float32
            )
        if cfg.compute_diff_mask:
            n = len(rows)
            masks = np.zeros((2 * n, L), bool)
            for i in range(n):
                cm, rm = diff_masks(
                    labels[i], labels[n + i], LABEL_PAD, cfg.diff_min_match_size
                )
                masks[i], masks[n + i] = cm, rm
            batch["loss_mask"] = masks
        return batch


class SFTCollator(_CollatorBase):
    def __call__(self, rows: list[dict]) -> dict[str, Any]:
        cfg = self.cfg
        anyres_meta = None
        counts = [None] * len(rows)
        if cfg.anyres:
            pixel, gather, counts = self._anyres_meta(
                [r.get("img_path") for r in rows]
            )
            anyres_meta = (pixel, gather)
        expanded = [
            self.processor.expand_image_tokens(r["input_ids"], r["labels"], cnt)
            for r, cnt in zip(rows, counts)
        ]
        L = cfg.pad_to or _round_up(
            max(len(x[0]) for x in expanded), cfg.bucket_multiple
        )
        ids = self._pad_rows([x[0] for x in expanded], cfg.pad_token_id, L)
        labels = self._pad_rows([x[1] for x in expanded], LABEL_PAD, L, np.int64)
        pad_mask = self._pad_rows(
            [np.ones(len(x[0]), np.int32) for x in expanded], 0, L
        ).astype(bool)
        n_pos = (
            anyres_meta[1].shape[1]
            if anyres_meta is not None
            else cfg.max_images * self.processor.cfg.num_image_tokens
        )
        img_pos = np.full((len(rows), n_pos), -1, np.int32)
        for i, (_, _, pos) in enumerate(expanded):
            img_pos[i, : len(pos)] = pos
        out = {
            "input_ids": ids,
            "labels": labels,
            "pad_mask": pad_mask,
            "image_positions": img_pos,
        }
        if anyres_meta is not None:
            out["pixel_values"] = anyres_meta[0]
            out["anyres_gather"] = anyres_meta[1]
        else:
            out["pixel_values"] = self._load_images(
                [r.get("img_path") for r in rows]
            )
        out.update(self._qformer_batch(rows))
        return out


class RMCollator(DPOCollator):
    """Reward-model batches share the DPO [chosen; rejected] layout; labels
    are unused by the RM loss but kept for parity checks."""


class GenerationCollator(_CollatorBase):
    """RIGHT-padded prompt batches for generation (PPO rollouts, eval).

    Right padding (not HF's left padding) because the engine's KV-cache slot
    index equals the absolute token position (generate/engine.py) — each row
    decodes from its own prompt_len slot, so left-aligning prompts costs
    nothing and keeps RoPE positions trivially correct."""

    def __call__(self, rows: list[dict]) -> dict[str, Any]:
        cfg = self.cfg
        anyres_meta = None
        counts = [None] * len(rows)
        if cfg.anyres:
            pixel, gather, counts = self._anyres_meta(
                [r.get("img_path") for r in rows]
            )
            anyres_meta = (pixel, gather)
        expanded = [
            self.processor.expand_image_tokens(r["input_ids"], None, cnt)
            for r, cnt in zip(rows, counts)
        ]
        L = cfg.pad_to or _round_up(
            max(len(x[0]) for x in expanded), cfg.bucket_multiple
        )
        b = len(rows)
        ids = np.full((b, L), cfg.pad_token_id, np.int32)
        pad_mask = np.zeros((b, L), bool)
        n_pos = (
            anyres_meta[1].shape[1]
            if anyres_meta is not None
            else cfg.max_images * self.processor.cfg.num_image_tokens
        )
        img_pos = np.full((b, n_pos), -1, np.int32)
        for i, (row_ids, _, pos) in enumerate(expanded):
            n = len(row_ids)
            ids[i, :n] = row_ids
            pad_mask[i, :n] = True
            img_pos[i, : len(pos)] = pos
        out = {
            "input_ids": ids,
            "pad_mask": pad_mask,
            "image_positions": img_pos,
            "prompt_lens": np.asarray([len(x[0]) for x in expanded], np.int32),
        }
        if anyres_meta is not None:
            out["pixel_values"] = anyres_meta[0]
            out["anyres_gather"] = anyres_meta[1]
        else:
            out["pixel_values"] = self._load_images(
                [r.get("img_path") for r in rows]
            )
        out.update(self._qformer_batch(rows))
        return out
