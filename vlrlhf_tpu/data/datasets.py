"""Dataset builders: vlfeedback_paired / vlquery_json / rlhfv / plain_dpo.

Same DATASET_MAP contract as the reference
(/root/reference/src/vlrlhf/utils/data.py:142-147), with the pairing logic
extracted into pure functions so it is unit-testable and runs without the HF
hub. The multi-annotator pairing semantics match make_vlfeedback_paired_dataset
(utils/data.py:11-82) exactly: pairwise annotator-score comparison, skip on
unparseable ratings, skip ties, then keep either all pairs with
gap >= score_margin, or (score_margin == -1) only the largest-gap pairs.
"""

from __future__ import annotations

import json
import os
from collections import defaultdict
from itertools import combinations
from typing import Any, Optional

import numpy as np

Row = dict[str, Any]


def make_vlfeedback_pairs(
    samples: list[dict], score_margin: float = -1
) -> list[Row]:
    out: list[Row] = []
    for sample in samples:
        prompt = sample["prompt"]
        img_path = sample["img_path"]
        comps = sample["completions"]
        by_gap: dict[float, list[Row]] = defaultdict(list)
        annos = comps["annotations"]
        responses = comps["response"]
        for i1, i2 in combinations(range(len(annos)), 2):
            a1, a2 = annos[i1], annos[i2]
            try:
                s1 = np.mean([float(a1[k]["Rating"]) for k in a1])
                s2 = np.mean([float(a2[k]["Rating"]) for k in a2])
            except ValueError:
                continue
            if s1 > s2:
                chosen, rejected = responses[i1], responses[i2]
            elif s2 > s1:
                chosen, rejected = responses[i2], responses[i1]
            else:
                continue
            gap = abs(s1 - s2)
            by_gap[gap].append(
                {"prompt": prompt, "chosen": chosen, "rejected": rejected,
                 "img_path": img_path}
            )
        if not by_gap:
            continue
        if score_margin == -1:
            out.extend(by_gap[max(by_gap)])
        else:
            for gap, rows in by_gap.items():
                if gap >= score_margin:
                    out.extend(rows)
    return out


def _load_json_or_hf(path: str, split: str = "train") -> list[dict]:
    if os.path.isfile(path) and path.endswith((".json", ".jsonl")):
        with open(path) as f:
            if path.endswith(".jsonl"):
                return [json.loads(line) for line in f if line.strip()]
            return json.load(f)
    # HF datasets directory / hub name (works offline with local cache).
    from datasets import load_dataset

    ds = load_dataset(path, split=split)
    return list(ds)


def make_vlfeedback_paired_dataset(
    data_path: str = "MMInstruction/VLFeedback",
    image_root: Optional[str] = None,
    score_margin: float = -1,
) -> list[Row]:
    samples = _load_json_or_hf(data_path)
    if image_root:
        for s in samples:
            if s.get("img_path") and not os.path.isabs(s["img_path"]):
                s["img_path"] = os.path.join(image_root, s["img_path"])
    return make_vlfeedback_pairs(samples, score_margin)


def build_dataset_from_vlquery_json(
    data_path: str, image_root: str = ""
) -> list[Row]:
    raw = _load_json_or_hf(data_path)
    return [
        dict(d, img_path=os.path.join(image_root, d["image"])) for d in raw
    ]


def make_rlhfv_paired_dataset(
    data_path: str = "HaoyeZhang/RLHF-V-Dataset", image_root: str = ""
) -> list[Row]:
    samples = _load_json_or_hf(data_path)
    out = []
    for s in samples:
        text = json.loads(s["text"]) if isinstance(s["text"], str) else s["text"]
        out.append(
            {
                "prompt": text["question"],
                "chosen": text["chosen"],
                "rejected": text["rejected"],
                "img_path": os.path.join(image_root, s["image_path"]),
            }
        )
    return out


def build_plain_dpo_dataset(data_path: str, image_root: str = "") -> list[Row]:
    raw = _load_json_or_hf(data_path)
    out = []
    for d in raw:
        img_path = (
            os.path.join(image_root, d["image"]) if "image" in d else None
        )
        out.append(
            {
                "prompt": d["prompt"],
                "chosen": d["chosen"],
                "rejected": d["rejected"],
                "img_path": img_path,
            }
        )
    return out


DATASET_MAP = {
    "vlfeedback_paired": make_vlfeedback_paired_dataset,
    "vlquery_json": build_dataset_from_vlquery_json,
    "rlhfv": make_rlhfv_paired_dataset,
    "plain_dpo": build_plain_dpo_dataset,
}


def train_eval_split(
    rows: list[Row], eval_ratio: float = 0.005, seed: int = 42
) -> tuple[list[Row], list[Row]]:
    """The reference's 0.5% eval split, seed 42 (dpo.py:111-114)."""
    rng = np.random.default_rng(seed)
    idx = rng.permutation(len(rows))
    n_eval = max(1, int(len(rows) * eval_ratio)) if rows else 0
    eval_idx = set(idx[:n_eval].tolist())
    train = [r for i, r in enumerate(rows) if i not in eval_idx]
    eval_ = [rows[i] for i in sorted(eval_idx)]
    return train, eval_


def shard_rows_for_process(rows: list[Row]) -> list[Row]:
    """Each host keeps its contiguous shard (multi-host data loading; the
    device mesh then shards each host's batch across its local devices)."""
    import jax

    n = jax.process_count()
    if n == 1:
        return rows
    idx = jax.process_index()
    per = -(-len(rows) // n)
    return rows[idx * per : (idx + 1) * per]
