"""Benchmark dataset loaders: TSV-with-base64 images and JSON forms.

Behavioral port of the per-benchmark Dataset classes
(/root/reference/src/vlrlhf/eval/mme/eval.py:27-94 and twins): TSV rows carry
base64-encoded images (with an index->image dedup map for rows that reference
another row's image); images are decoded once to a temp dir and rows carry
file paths, exactly like the reference's dump_image_to_tempfile.
"""

from __future__ import annotations

import base64
import io
import json
import os
import tempfile
from typing import Optional

import pandas as pd


class TSVBenchmark:
    """MME / MMBench / SEEDBench(tsv) / MMMU / MathVista style."""

    def __init__(self, data_file: str, img_dir: Optional[str] = None):
        data = pd.read_csv(data_file, sep="\t")
        data = data[~pd.isna(data["image"])]
        data["index"] = [str(x) for x in data["index"]]
        data["image"] = [str(x) for x in data["image"]]

        # short 'image' cells point at the row whose index holds the real data
        image_map = dict(zip(data["index"], data["image"]))
        for k in list(image_map):
            if len(image_map[k]) <= 64:
                idx = image_map[k]
                assert idx in image_map and len(image_map[idx]) > 64
                image_map[k] = image_map[idx]
        data["image"] = [image_map[k] for k in data["index"]]

        self._tmp = tempfile.TemporaryDirectory() if img_dir is None else None
        self.img_dir = img_dir or self._tmp.name
        self.df = data
        self._img_cache: dict[str, str] = {}

    def _dump_image(self, index: str, b64: str) -> str:
        if index in self._img_cache:
            return self._img_cache[index]
        from PIL import Image

        path = os.path.join(self.img_dir, f"{index}.jpg")
        if not os.path.exists(path):
            img = Image.open(io.BytesIO(base64.b64decode(b64))).convert("RGB")
            img.save(path)
        self._img_cache[index] = path
        return path

    def rows(self) -> list[dict]:
        out = []
        for _, line in self.df.iterrows():
            d = line.to_dict()
            img = d.pop("image")
            # MMMU-style multi-image rows store a python-list string
            # (reference's isliststr/eval handling, eval/mme/eval.py:29-53)
            if isinstance(img, str) and img.startswith("[") and img.endswith("]"):
                import ast

                imgs = ast.literal_eval(img)
                d["img"] = [
                    self._dump_image(f"{d['index']}_{i}", b)
                    for i, b in enumerate(imgs)
                ]
            else:
                d["img"] = self._dump_image(str(d["index"]), img)
            out.append(d)
        return out


def load_json_benchmark(
    data_file: str, image_root: str = "", image_key: str = "image"
) -> list[dict]:
    """POPE / MMVet / SEEDBench(json) / generic VQA."""
    with open(data_file) as f:
        if data_file.endswith(".jsonl"):
            raw = [json.loads(line) for line in f if line.strip()]
        else:
            raw = json.load(f)
            if isinstance(raw, dict):  # mmvet: {id: {...}}
                raw = [dict(v, index=k) for k, v in raw.items()]
    for d in raw:
        if image_key in d:
            d["img"] = os.path.join(image_root, d[image_key])
    return raw
