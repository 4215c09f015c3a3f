"""CLI smoke tests in --synthetic mode: dpo/sft/rm/ppo/eval end-to-end."""

import json
import os

import pytest

from vlrlhf_tpu.cli.main import main


def _common(tmp_path, n=6):
    return [
        "--synthetic", str(n),
        "--output_dir", str(tmp_path),
        "--per_device_train_batch_size", "2",
        "--max_steps", "2",
        "--logging_steps", "1",
        "--save_steps", "100",
        "--lora_r", "4",
        "--max_length", "64",
        "--max_prompt_length", "48",
        "--mesh_fsdp", "1",
        "--bf16", "false",
    ]


@pytest.mark.parametrize("family", ["llava", "qwen_vl", "instructblip"])
def test_cli_dpo_synthetic(tmp_path, family):
    main(["dpo", *_common(tmp_path), "--loss_type", "sigmoid",
          "--model_family", family])
    assert os.path.exists(tmp_path / "dpo_metrics.jsonl")
    with open(tmp_path / "dpo_metrics.jsonl") as f:
        records = [json.loads(line) for line in f]
    assert any("loss" in r for r in records)
    assert os.path.exists(tmp_path / "adapters")


def test_cli_dpo_pipeline_parallel(tmp_path):
    """--mesh_pipe 2: the DPO step runs with the decoder split into two
    GPipe stages on the virtual mesh; step-1 loss must still be log(2)."""
    args = _common(tmp_path)
    args[args.index("--mesh_fsdp") + 1] = "2"
    main(["dpo", *args, "--mesh_pipe", "2", "--loss_type", "sigmoid"])
    records = [
        json.loads(line) for line in open(tmp_path / "dpo_metrics.jsonl")
    ]
    assert abs(records[0]["loss"] - 0.6931) < 1e-3, records[0]


def test_cli_sft_synthetic(tmp_path):
    main(["sft", *_common(tmp_path), "--merge_adapter_after_training"])
    assert os.path.exists(tmp_path / "adapters")
    assert os.path.exists(tmp_path / "merged")


def test_cli_rm_synthetic(tmp_path):
    main(["rm", *_common(tmp_path)])
    assert os.path.exists(tmp_path / "adapters")


def test_cli_ppo_synthetic(tmp_path):
    main(["ppo", *_common(tmp_path), "--max_new_tokens", "4"])
    assert os.path.exists(tmp_path / "ppo_metrics.jsonl")


def test_cli_ppo_continuous_rollouts(tmp_path):
    """Slot-refill rollouts end-to-end: same metrics surface as the static
    path, finite values, rollout throughput recorded."""
    main(["ppo", *_common(tmp_path), "--max_new_tokens", "4",
          "--rollout_chunk_size", "2",
          "--rollout_continuous_batching", "true"])
    records = [
        json.loads(line)
        for line in open(tmp_path / "ppo_metrics.jsonl")
    ]
    assert any("ppo/rollout_tok_s" in r for r in records)
    for r in records:
        for k, v in r.items():
            if isinstance(v, float):
                assert v == v, (k, r)  # no NaN


def test_cli_ppo_checkpoint_resume(tmp_path):
    """PPO now checkpoints periodically and resumes: step 1..2 saved, a
    resumed run starts at step 3 (the reference's custom PPO loop has no
    mid-run saves at all, base/trainer.py:428-499)."""
    main(["ppo", *_common(tmp_path), "--max_new_tokens", "4",
          "--max_steps", "2", "--save_steps", "1"])
    assert os.path.isdir(tmp_path / "checkpoints")
    main(["ppo", *_common(tmp_path), "--max_new_tokens", "4",
          "--max_steps", "3", "--save_steps", "1",
          "--resume_from_checkpoint", "auto"])
    records = [
        json.loads(line) for line in open(tmp_path / "ppo_metrics.jsonl")
    ]
    # first run logged steps 1,2; the resumed run logged only step 3
    assert [r["step"] for r in records] == [1, 2, 3], records


def test_cli_eval_synthetic(tmp_path):
    rows = [
        {"text": "is there a dog?", "label": "yes", "image": "a.jpg"},
        {"text": "is there a cat?", "label": "no", "image": "b.jpg"},
    ]
    data = tmp_path / "pope.jsonl"
    with open(data, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    main([
        "eval", *_common(tmp_path),
        "--benchmark", "pope",
        "--data_file", str(data),
        "--max_new_tokens", "4",
    ])
    assert os.path.exists(tmp_path / "pope.json")


def test_cli_dpo_resume(tmp_path):
    args = _common(tmp_path)
    # train 2 steps with frequent saves
    main(["dpo", *args, "--save_steps", "2", "--max_steps", "2"])
    ckpts = os.listdir(tmp_path / "checkpoints")
    assert any(c.isdigit() and int(c) == 2 for c in ckpts), ckpts
    # resume and continue to step 4
    main(["dpo", *args, "--save_steps", "2", "--max_steps", "4",
          "--resume_from_checkpoint", "auto"])
    ckpts = os.listdir(tmp_path / "checkpoints")
    assert any(c.isdigit() and int(c) == 4 for c in ckpts), ckpts


def test_cli_dpo_eval_during_training(tmp_path):
    main(["dpo", *_common(tmp_path, n=24), "--eval_steps", "2",
          "--eval_ratio", "0.2", "--max_steps", "4"])
    with open(tmp_path / "dpo_metrics.jsonl") as f:
        records = [json.loads(line) for line in f]
    assert any("eval/loss" in r for r in records), records
