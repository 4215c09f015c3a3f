"""Eval harness: scorers (crafted cases) + end-to-end benchmark runs on the
tiny VLM with synthetic TSV/JSON fixtures."""

import base64
import io
import json
import os

import jax
import numpy as np
import pytest

from tests.test_data import fake_image_loader, make_processor
from tests.test_dpo_step import tiny_vlm_config
from vlrlhf_tpu.data.collators import CollatorConfig
from vlrlhf_tpu.eval.benchmarks import BENCHMARKS, run_benchmark
from vlrlhf_tpu.eval.db import log_metrics_to_sqlite, read_sqlite
from vlrlhf_tpu.eval.harness import EvalRunner
from vlrlhf_tpu.eval.scorers import (
    extract_choice,
    extract_yes_no,
    mme_scores,
    multiple_choice_accuracy,
    pope_metrics,
    ppl_choice_accuracy,
)
from vlrlhf_tpu.generate.engine import GenerateConfig
from vlrlhf_tpu.models.vlm import init_vlm_params


# ───────────────────────── scorers ─────────────────────────


def test_extract_yes_no_pope_semantics():
    assert extract_yes_no("No, there is no dog.") == "no"
    assert extract_yes_no("Yes, I can see it. But maybe not.") == "yes"  # 1st sentence
    assert extract_yes_no("It is not there") == "no"
    assert extract_yes_no("Sure thing") == "yes"


def test_extract_choice():
    assert extract_choice("B") == "B"
    assert extract_choice("(C) the cat") == "C"
    assert extract_choice("The answer is D.") == "D"
    assert extract_choice("A. because...") == "A"
    opts = {"A": "a red car", "B": "a blue boat"}
    assert extract_choice("I think it's a blue boat", opts) == "B"
    assert extract_choice("no idea", opts) is None


def test_pope_metrics():
    results = [
        {"response": "Yes, it is.", "label": "yes"},
        {"response": "No.", "label": "no"},
        {"response": "Yes.", "label": "no"},
        {"response": "there is not", "label": "yes"},
    ]
    m = pope_metrics(results)
    assert m["acc"] == 50.0
    assert m["yes_rate"] == 50.0


def test_mme_scores():
    results = [
        {"category": "existence", "image_id": "1", "response": "Yes", "answer": "Yes"},
        {"category": "existence", "image_id": "1", "response": "No", "answer": "No"},
        {"category": "existence", "image_id": "2", "response": "Yes", "answer": "No"},
        {"category": "existence", "image_id": "2", "response": "No", "answer": "No"},
    ]
    m = mme_scores(results)
    # acc = 3/4, acc+ = 1/2 -> 100*(0.75+0.5) = 125
    assert m["existence"] == 125.0
    assert m["perception"] == 125.0


def test_ppl_choice_accuracy():
    results = [
        {"index": "q1", "choice_idx": 0, "answer_idx": 1, "ppl": 2.0},
        {"index": "q1", "choice_idx": 1, "answer_idx": 1, "ppl": 1.0},
        {"index": "q2", "choice_idx": 0, "answer_idx": 0, "ppl": 3.0},
        {"index": "q2", "choice_idx": 1, "answer_idx": 0, "ppl": 2.5},
    ]
    assert ppl_choice_accuracy(results)["acc"] == 50.0


def test_multiple_choice_accuracy_with_nan_options():
    results = [
        {"response": "A", "answer": "A", "A": "x", "B": "y", "C": float("nan")},
        {"response": "The answer is B", "answer": "B", "A": "x", "B": "y"},
    ]
    m = multiple_choice_accuracy(results)
    assert m["acc"] == 100.0


# ───────────────────── end-to-end fixtures ─────────────────────


def _b64_image():
    from PIL import Image

    img = Image.fromarray(
        (np.random.default_rng(0).random((16, 16, 3)) * 255).astype(np.uint8)
    )
    buf = io.BytesIO()
    img.save(buf, format="JPEG")
    return base64.b64encode(buf.getvalue()).decode()


@pytest.fixture(scope="module")
def runner():
    cfg = tiny_vlm_config()
    params = init_vlm_params(cfg, jax.random.PRNGKey(0))
    processor = make_processor(num_image_tokens=16)  # match tiny VLM
    return EvalRunner(
        model_cfg=cfg,
        params=params,
        processor=processor,
        gen_cfg=GenerateConfig(max_new_tokens=4, pad_token_id=0),
        collator_cfg=CollatorConfig(
            pad_token_id=0, bucket_multiple=32, image_size=16
        ),
        image_loader=fake_image_loader,
    )


def test_run_benchmark_mme(tmp_path, runner):
    import pandas as pd

    b64 = _b64_image()
    df = pd.DataFrame(
        {
            "index": ["0-0", "0-1", "1-0", "1-1"],
            "image": [b64, "0-0", b64, "1-0"],
            "question": [f"is it blue {i}?" for i in range(4)],
            "answer": ["Yes", "No", "Yes", "No"],
            "category": ["existence"] * 4,
        }
    )
    tsv = tmp_path / "mme.tsv"
    df.to_csv(tsv, sep="\t", index=False)
    metrics = run_benchmark(
        "mme", runner, str(tsv),
        output_json=str(tmp_path / "mme.json"),
        sqlite_db=str(tmp_path / "db.sqlite"), tag="test",
    )
    assert "perception" in metrics
    assert os.path.exists(tmp_path / "mme.json")
    rows = read_sqlite(str(tmp_path / "db.sqlite"), "MME")
    assert rows[0]["tag"] == "test"


def test_run_benchmark_mmbench(tmp_path, runner):
    import pandas as pd

    b64 = _b64_image()
    df = pd.DataFrame(
        {
            "index": ["0", "1"],
            "image": [b64, b64],
            "question": ["what color?", "what shape?"],
            "answer": ["A", "B"],
            "A": ["red", "round"],
            "B": ["blue", "square"],
            "category": ["color", "shape"],
            "l2-category": ["c", "s"],
            "hint": [None, "look closely"],
        }
    )
    tsv = tmp_path / "mmbench.tsv"
    df.to_csv(tsv, sep="\t", index=False)
    metrics = run_benchmark("mmbench", runner, str(tsv))
    assert "acc" in metrics and "extraction_rate" in metrics


def test_run_benchmark_pope(tmp_path, runner):
    rows = [
        {"text": "is there a dog?", "label": "yes", "image": "a.jpg"},
        {"text": "is there a cat?", "label": "no", "image": "b.jpg"},
    ]
    path = tmp_path / "pope.jsonl"
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    metrics = run_benchmark("pope", runner, str(path))
    assert set(metrics) == {"acc", "precision", "recall", "f1", "yes_rate"}


def test_run_benchmark_seedbench_ppl(tmp_path, runner):
    data = {
        "questions": [
            {
                "question_id": "q1",
                "question": "what is shown?",
                "choice_a": "a dog", "choice_b": "a cat",
                "choice_c": "a bird", "choice_d": "a fish",
                "answer": "B",
                "data_id": "img.jpg",
                "question_type_id": 1,
            },
            {
                "question_id": "v1", "question": "video?", "answer": "A",
                "choice_a": "x", "choice_b": "y", "choice_c": "z",
                "choice_d": "w", "data_id": "v.mp4", "question_type_id": 10,
            },
        ]
    }
    path = tmp_path / "SEED-Bench.json"
    with open(path, "w") as f:
        json.dump(data, f)
    metrics = run_benchmark("seedbench", runner, str(path))
    assert "acc" in metrics  # video question filtered, pipeline completes


def test_sqlite_schema_evolution(tmp_path):
    db = str(tmp_path / "db.sqlite")
    log_metrics_to_sqlite(db, "T", {"acc": 1.0}, tag="a")
    log_metrics_to_sqlite(db, "T", {"acc": 2.0, "f1": 3.0}, tag="b")
    rows = read_sqlite(db, "T")
    assert len(rows) == 2 and rows[1]["f1"] == 3.0


def test_run_benchmark_seedbench_gen(tmp_path, runner):
    data = {
        "questions": [
            {
                "question_id": "q1", "question": "what is shown?",
                "choice_a": "a dog", "choice_b": "a cat",
                "choice_c": "a bird", "choice_d": "a fish",
                "answer": "B", "data_id": "img.jpg", "question_type_id": 1,
            }
        ]
    }
    path = tmp_path / "SEED-Bench.json"
    with open(path, "w") as f:
        json.dump(data, f)
    metrics = run_benchmark("seedbench_gen", runner, str(path))
    assert "acc" in metrics and "extraction_rate" in metrics


def test_mmbench_circular_scoring():
    from vlrlhf_tpu.eval.benchmarks import BENCHMARKS

    bench = BENCHMARKS["mmbench"]
    # q1: both rotations correct; q2: one rotation wrong -> 50% circular acc
    results = [
        {"index": "1", "response": "A", "answer": "A",
         "options_dict": {"A": "x", "B": "y"}},
        {"index": "1000001", "response": "B", "answer": "B",
         "options_dict": {"A": "y", "B": "x"}},
        {"index": "2", "response": "A", "answer": "A",
         "options_dict": {"A": "u", "B": "v"}},
        {"index": "1000002", "response": "A", "answer": "B",
         "options_dict": {"A": "v", "B": "u"}},
    ]
    m = bench.score(results)
    assert m["mode"] == "circular" and m["acc"] == 50.0
    # plain fallback without rotations
    m2 = bench.score(results[:1])
    assert "extraction_rate" in m2


def test_tsv_multi_image_rows(tmp_path):
    import pandas as pd

    from vlrlhf_tpu.eval.datasets import TSVBenchmark

    b64 = _b64_image()
    df = pd.DataFrame(
        {
            "index": ["0", "1"],
            "image": [str([b64, b64]), b64],
            "question": ["compare <image 1> and <image 2>", "what?"],
        }
    )
    tsv = tmp_path / "multi.tsv"
    df.to_csv(tsv, sep="\t", index=False)
    rows = TSVBenchmark(str(tsv)).rows()
    assert isinstance(rows[0]["img"], list) and len(rows[0]["img"]) == 2
    assert isinstance(rows[1]["img"], str)
