"""int8 weights-only quantization (ops/quant.py): math, model paths, QLoRA.

The TPU-native equivalent of the reference's QLoRA surface
(/root/reference/src/vlrlhf/utils/auto_load.py:509-578) and a W8A16 serving
mode. Covers: quantize/dequantize round trip, linear() dispatch, forward
fidelity on a tiny LM, the DPO step over a quantized frozen base, LoRA
targeting on kernel_q leaves, engine decode with quantized params, and
sharding-rule coverage of the new leaf names.
"""

import jax
import jax.numpy as jnp
import numpy as np

from tests.test_dpo_step import tiny_batch, tiny_vlm_config
from vlrlhf_tpu.lora.lora import LoraConfig, init_lora
from vlrlhf_tpu.models.common import Ctx, linear
from vlrlhf_tpu.models.vlm import init_vlm_params, vlm_forward
from vlrlhf_tpu.ops.quant import (
    DEFAULT_QUANT_PATTERNS,
    TRAIN_QUANT_PATTERNS,
    dequantize_params,
    quantize_linear,
    quantize_params,
    quantized_fraction,
)


def test_quantize_linear_roundtrip_error_bounded():
    k = jax.random.normal(jax.random.PRNGKey(0), (64, 32)) * 0.05
    p = {"kernel": k, "bias": jnp.ones((32,))}
    q = quantize_linear(p)
    assert q["kernel_q"].dtype == jnp.int8
    assert q["kernel_scale"].shape == (1, 32)
    assert "bias" in q
    back = (
        q["kernel_q"].astype(jnp.float32)
        * q["kernel_scale"].astype(jnp.float32)
    )
    # |err| <= scale/2 (rounding) + |q|*d(scale) (bf16 scale storage) ~ scale
    scale = np.asarray(q["kernel_scale"], np.float32)
    err = np.abs(np.asarray(back) - np.asarray(k))
    assert np.all(err <= scale + 1e-6)


def test_quantize_linear_stacked_per_layer_scales():
    k = jnp.stack(
        [
            jax.random.normal(jax.random.PRNGKey(i), (16, 8)) * (0.01 * (i + 1))
            for i in range(3)
        ]
    )
    q = quantize_linear({"kernel": k})
    assert q["kernel_q"].shape == (3, 16, 8)
    assert q["kernel_scale"].shape == (3, 1, 8)
    # layer 2 has 3x the magnitude of layer 0 -> bigger scales
    s = np.asarray(q["kernel_scale"], np.float32)
    assert s[2].mean() > 2.0 * s[0].mean()


def test_linear_dispatch_matches_explicit_dequant():
    k = jax.random.normal(jax.random.PRNGKey(0), (32, 16)) * 0.1
    p = {"kernel": k, "bias": jnp.arange(16.0) * 0.01}
    q = quantize_linear(p)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 32))
    got = linear(q, x)
    want = (
        x @ q["kernel_q"].astype(x.dtype)
    ) * q["kernel_scale"].astype(x.dtype) + p["bias"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)


def test_quantized_forward_close_to_bf16():
    cfg = tiny_vlm_config()
    params = init_vlm_params(cfg, jax.random.PRNGKey(0))
    qparams = quantize_params(params, DEFAULT_QUANT_PATTERNS)
    assert quantized_fraction(qparams) > 0.2
    batch = tiny_batch(jax.random.PRNGKey(2), n_pairs=1)
    logits, _ = vlm_forward(
        cfg, params,
        input_ids=batch["input_ids"], pixel_values=batch["pixel_values"],
        image_positions=batch["image_positions"], pad_mask=batch["pad_mask"],
    )
    qlogits, _ = vlm_forward(
        cfg, qparams,
        input_ids=batch["input_ids"], pixel_values=batch["pixel_values"],
        image_positions=batch["image_positions"], pad_mask=batch["pad_mask"],
    )
    a = np.asarray(logits, np.float32).ravel()
    b = np.asarray(qlogits, np.float32).ravel()
    cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
    assert cos > 0.999, cos
    # dequantize restores a bf16-kernel tree (no int8 leaves remain)
    d = dequantize_params(qparams)
    assert all(l.dtype != jnp.int8 for l in jax.tree.leaves(d))


def test_train_patterns_keep_lm_head_bf16():
    cfg = tiny_vlm_config()
    params = init_vlm_params(cfg, jax.random.PRNGKey(0))
    qparams = quantize_params(params, TRAIN_QUANT_PATTERNS)
    assert "kernel" in qparams["lm"]["lm_head"]  # untouched
    assert "kernel_q" in qparams["lm"]["layers_scanned"]["attn"]["wq"]
    assert "kernel_q" in qparams["lm"]["layers_scanned"]["mlp"]["gate"]
    # vision tower untouched
    assert quantized_fraction(qparams["vision"]) == 0.0


def test_lora_targets_match_quantized_kernels():
    cfg = tiny_vlm_config()
    params = init_vlm_params(cfg, jax.random.PRNGKey(0))
    lcfg = LoraConfig(
        r=4, alpha=8.0, target_patterns=(r"lm/.*attn/", r"lm/.*mlp/")
    )
    want = jax.tree_util.tree_structure(
        init_lora(params, lcfg, jax.random.PRNGKey(1))
    )
    qparams = quantize_params(params, TRAIN_QUANT_PATTERNS)
    got_tree = init_lora(qparams, lcfg, jax.random.PRNGKey(1))
    assert jax.tree_util.tree_structure(got_tree) == want


def test_dpo_step_on_quantized_base():
    """QLoRA mode: frozen int8 base + LoRA adapters trains; step-0 DPO loss
    is still log(2) (policy == ref on the SAME quantized base)."""
    from vlrlhf_tpu.train.dpo import DPOConfig, make_dpo_step
    from vlrlhf_tpu.train.train_state import (
        OptimizerConfig,
        init_train_state,
        make_optimizer,
    )

    cfg = tiny_vlm_config()
    params = init_vlm_params(cfg, jax.random.PRNGKey(0))
    qparams = quantize_params(params, TRAIN_QUANT_PATTERNS)
    lcfg = LoraConfig(
        r=4, alpha=8.0, target_patterns=(r"lm/.*attn/", r"lm/.*mlp/")
    )
    adapters = init_lora(qparams, lcfg, jax.random.PRNGKey(1))
    tx = make_optimizer(
        OptimizerConfig(learning_rate=5e-3, warmup_steps=1, total_steps=50),
        adapters,
    )
    state = init_train_state(adapters, tx)
    step = make_dpo_step(cfg, DPOConfig(lora_scale=lcfg.scale), tx)
    batch = tiny_batch(jax.random.PRNGKey(2))
    state, m = step(state, qparams, batch)
    np.testing.assert_allclose(float(m["loss"]), np.log(2.0), atol=1e-5)
    losses = [float(m["loss"])]
    for _ in range(8):
        state, m = step(state, qparams, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] - 1e-3, losses


def test_engine_generate_with_quantized_params():
    from vlrlhf_tpu.generate.engine import GenerateConfig, Generator

    cfg = tiny_vlm_config()
    params = init_vlm_params(cfg, jax.random.PRNGKey(0))
    qparams = quantize_params(params, DEFAULT_QUANT_PATTERNS)
    b, l = 2, 32
    ids = jax.random.randint(jax.random.PRNGKey(3), (b, l), 1, 100)
    batch = {
        "input_ids": ids,
        "pad_mask": jnp.ones((b, l), bool),
        "prompt_lens": jnp.full((b,), l, jnp.int32),
    }
    gen = Generator(cfg, GenerateConfig(max_new_tokens=8, pad_token_id=0))
    out = np.asarray(gen(qparams, batch))
    assert out.shape == (b, 8)
    assert (out >= 0).all() and (out < cfg.lm.vocab_size).all()


def test_sharding_rules_cover_quantized_leaves():
    from jax.sharding import PartitionSpec as P

    from vlrlhf_tpu.core.partitioning import default_lm_rules

    rules = default_lm_rules()
    assert rules.spec_for("lm/layers_scanned/attn/wq/kernel_q") == P(
        None, "fsdp", "model"
    )
    assert rules.spec_for("lm/layers_scanned/mlp/down/kernel_q") == P(
        None, "model", "fsdp"
    )
    assert rules.spec_for("lm/layers_scanned/attn/wq/kernel_scale") == P(
        None, None, "model"
    )
    assert rules.spec_for("lm/layers_scanned/mlp/down/kernel_scale") == P(
        None, None, "fsdp"
    )
    assert rules.spec_for("lm/lm_head/kernel_q") == P("fsdp", "model")


def test_merge_after_dequant_roundtrip():
    """QLoRA merge flow: dequantize then merge_lora; result == bf16 merge
    within quantization error."""
    from vlrlhf_tpu.lora.lora import merge_lora

    cfg = tiny_vlm_config()
    params = init_vlm_params(cfg, jax.random.PRNGKey(0))
    lcfg = LoraConfig(
        r=4, alpha=8.0, target_patterns=(r"lm/.*attn/", r"lm/.*mlp/")
    )
    adapters = init_lora(params, lcfg, jax.random.PRNGKey(1))
    # give b nonzero values so the merge actually changes kernels
    adapters = jax.tree.map(
        lambda x: x + 0.01 if x.ndim >= 2 else x, adapters
    )
    qparams = quantize_params(params, TRAIN_QUANT_PATTERNS)
    merged_q = merge_lora(dequantize_params(qparams), adapters, lcfg.scale)
    merged = merge_lora(params, adapters, lcfg.scale)
    wq = np.asarray(
        merged["lm"]["layers_scanned"]["attn"]["wq"]["kernel"], np.float32
    )
    wq_q = np.asarray(
        merged_q["lm"]["layers_scanned"]["attn"]["wq"]["kernel"], np.float32
    )
    assert np.max(np.abs(wq - wq_q)) < np.max(np.abs(wq)) / 64


def test_sharded_quantized_step_matches_unsharded():
    """QLoRA step on a dp2 x fsdp2 x model2 mesh == single-device step (the
    kernel_q / kernel_scale sharding rules must not change the math)."""
    from jax.sharding import NamedSharding

    from vlrlhf_tpu.core.mesh import MeshConfig, make_mesh
    from vlrlhf_tpu.core.partitioning import (
        batch_spec,
        default_lm_rules,
        make_sharding,
        shard_pytree,
    )
    from vlrlhf_tpu.train.dpo import DPOConfig, make_dpo_step
    from vlrlhf_tpu.train.train_state import (
        OptimizerConfig,
        init_train_state,
        make_optimizer,
    )

    cfg = tiny_vlm_config()
    params = init_vlm_params(cfg, jax.random.PRNGKey(0))
    qparams = quantize_params(params, TRAIN_QUANT_PATTERNS)
    lcfg = LoraConfig(
        r=4, alpha=8.0, target_patterns=(r"lm/.*attn/", r"lm/.*mlp/")
    )

    def fresh_state():
        adapters = init_lora(qparams, lcfg, jax.random.PRNGKey(1))
        tx = make_optimizer(
            OptimizerConfig(learning_rate=5e-3, warmup_steps=1,
                            total_steps=50),
            adapters,
        )
        return tx, init_train_state(adapters, tx)

    tx, state = fresh_state()
    step = make_dpo_step(cfg, DPOConfig(lora_scale=lcfg.scale), tx)
    batch = tiny_batch(jax.random.PRNGKey(2), n_pairs=4)
    _, m_unsharded = step(state, qparams, batch)  # donates state

    mesh = make_mesh(MeshConfig(data=2, fsdp=2, model=2))
    rules = default_lm_rules()
    qparams_s = shard_pytree(rules, qparams, mesh)
    _, state = fresh_state()
    state_s = jax.tree.map(
        jax.device_put, state, make_sharding(rules, state, mesh)
    )
    batch_s = jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, batch_spec())), batch
    )
    _, m_sharded = step(state_s, qparams_s, batch_s)
    np.testing.assert_allclose(
        float(m_sharded["loss"]), float(m_unsharded["loss"]),
        rtol=2e-5, atol=2e-5,
    )


def test_wide_patterns_quantize_vision_and_projector():
    """TRAIN_QUANT_PATTERNS_WIDE (--q_lora_vision): vision tower + projector
    linears go int8 alongside the LM stack; lm_head/embed stay bf16; the
    multimodal forward stays close to bf16 (the Qwen-VL-7B-fits-on-one-v5e
    mode)."""
    from vlrlhf_tpu.ops.quant import TRAIN_QUANT_PATTERNS_WIDE

    cfg = tiny_vlm_config()
    params = init_vlm_params(cfg, jax.random.PRNGKey(0))
    qparams = quantize_params(params, TRAIN_QUANT_PATTERNS_WIDE)
    assert "kernel_q" in qparams["vision"]["layers_scanned"]["attn"]["wq"]
    assert "kernel_q" in qparams["projector"]["fc1"]
    assert "kernel" in qparams["lm"]["lm_head"]  # head stays bf16
    assert quantized_fraction(qparams) > quantized_fraction(
        quantize_params(params, TRAIN_QUANT_PATTERNS)
    )
    batch = tiny_batch(jax.random.PRNGKey(2), n_pairs=1)
    kwargs = dict(
        input_ids=batch["input_ids"], pixel_values=batch["pixel_values"],
        image_positions=batch["image_positions"], pad_mask=batch["pad_mask"],
    )
    logits, _ = vlm_forward(cfg, params, **kwargs)
    qlogits, _ = vlm_forward(cfg, qparams, **kwargs)
    a = np.asarray(logits, np.float32).ravel()
    b = np.asarray(qlogits, np.float32).ravel()
    cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
    assert cos > 0.995, cos


def test_wide_patterns_resampler_projector():
    """Qwen-style resampler projector ('proj') routes through linear() so
    the wide int8 set flows through it (vlm.py projector_forward)."""
    import dataclasses

    from vlrlhf_tpu.models.registry import FAMILIES
    from vlrlhf_tpu.models.vlm import projector_forward
    from vlrlhf_tpu.ops.quant import TRAIN_QUANT_PATTERNS_WIDE

    qcfg = FAMILIES["qwen_vl"].make_config()
    pcfg = dataclasses.replace(
        qcfg.projector, in_dim=32, out_dim=64, num_queries=4, num_heads=2
    )
    from vlrlhf_tpu.models.vlm import init_projector_params

    p = init_projector_params(pcfg, jax.random.PRNGKey(0), jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 32))
    y = projector_forward(pcfg, p, x)
    qp = quantize_params({"projector": p}, TRAIN_QUANT_PATTERNS_WIDE)[
        "projector"
    ]
    assert "kernel_q" in qp["proj"]
    yq = projector_forward(pcfg, qp, x)
    a, b = np.asarray(y).ravel(), np.asarray(yq).ravel()
    cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9))
    assert cos > 0.99, cos
