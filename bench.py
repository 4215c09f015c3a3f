"""Benchmark: DPO preference-pairs/sec/chip at the 7B north-star shape.

Measures the full jitted DPO step at three configs on the attached chip:
  - HEADLINE: LLaVA-1.5-7B geometry (hidden 4096 / 32L / ff 11008 + CLIP-L
    tower; 7.06B params = 13.2 GiB bf16), LoRA r64, seq 1024, precomputed
    ref logps (--precompute_ref_logps mode: the in-step ref forward is
    skipped), 'attn' remat + chunked lm_head (logits_chunk=256 — the margin
    that lets 'attn' fit in bf16). Largest fitting batch on a 16GB v5e is
    1 pair/step (BASELINE.md north star is pairs/sec/chip AT 7B).
  - qlora_int8_7b: same geometry with the int8 frozen base (--q_lora,
    ops/quant.py) + remat_policy 'acts' — the fastest 7B training mode
    (halved param HBM pays for saving all per-layer activations).
  - continuity: the round-1 1.5B flagship at 4 pairs/step with an online
    (in-step, adapter-off) ref forward, remat 'acts'.

MFU accounting (train/flops.py): LoRA-adapter training is 4N fwd+bwd (the
frozen base has no dL/dW matmuls) + 2N per online ref forward — round 1 used
6N+2N, inflating its MFU. `vs_baseline` is 0.0: the reference publishes NO
throughput numbers (BASELINE.json.published == {}); the explicit
`mfu_vs_40pct_target` field carries the only quantitative target we have.

Prints ONE JSON line.
"""

import json
import time

import jax
import jax.numpy as jnp

PEAK_BF16_FLOPS = {
    "v5e": 197e12,
    "v5p": 459e12,
    "v4": 275e12,
    "v6e": 918e12,
}


def _compile_cache():
    # TPU only: cached XLA:CPU AOT artifacts are machine-feature-specific
    # and SIGILL when loaded on a mismatched host (see cli/main.py).
    try:
        import os

        if jax.default_backend() != "tpu":
            return
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("JAX_COMPILATION_CACHE_DIR",
                           os.path.expanduser("~/.cache/jax")),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass


def _measure_dpo(cfg, n_pairs, seq, n_steps, n_warmup, precompute_ref,
                 quantize=False, dpo_kwargs=None, quant_patterns=None,
                 with_plora=False):
    """Returns (pairs_per_sec, step_ms, mfu, params_b). NOTE:
    block_until_ready does not synchronize over the axon tunnel; fetching a
    value does."""
    import numpy as np

    import __graft_entry__ as graft
    from vlrlhf_tpu.lora.lora import LoraConfig, init_lora
    from vlrlhf_tpu.models.vlm import init_vlm_params
    from vlrlhf_tpu.train import flops as F
    from vlrlhf_tpu.train.dpo import DPOConfig, make_dpo_step
    from vlrlhf_tpu.train.train_state import (
        OptimizerConfig,
        init_train_state,
        make_optimizer,
    )

    n_params = sum(
        int(np.prod(s.shape))
        for s in jax.tree_util.tree_leaves(
            jax.eval_shape(lambda k: init_vlm_params(cfg, k), jax.random.PRNGKey(0))
        )
    )
    # One compiled init program: eager per-op init is pathological over the
    # axon RPC tunnel (~15 ms/dispatch). QLoRA mode quantizes inside the same
    # program so XLA never holds bf16 stack + int8 stack at once.
    if quantize:
        from vlrlhf_tpu.ops.quant import TRAIN_QUANT_PATTERNS, quantize_params

        pats = quant_patterns or TRAIN_QUANT_PATTERNS
        params = jax.jit(
            lambda k: quantize_params(init_vlm_params(cfg, k), pats)
        )(jax.random.PRNGKey(0))
    else:
        params = jax.jit(lambda k: init_vlm_params(cfg, k))(jax.random.PRNGKey(0))
    if with_plora:
        # XC2 ships ~590M params of TRAINED built-in PLoRA (r=256) that ride
        # in every forward at image positions; include an equivalently-shaped
        # tree so the capacity/throughput numbers reflect the real model.
        plora_cfg = LoraConfig(
            r=256, alpha=256.0,
            target_patterns=(r"lm/.*attn/", r"lm/.*mlp/"),
        )
        params["plora"] = jax.jit(
            lambda k: init_lora(params, plora_cfg, k, dtype=cfg.lm.dtype)
        )(jax.random.PRNGKey(7))
    lcfg = LoraConfig(
        r=64, alpha=16.0, target_patterns=(r"lm/.*attn/", r"lm/.*mlp/")
    )
    adapters = jax.jit(
        lambda k: init_lora(params, lcfg, k, dtype=cfg.lm.dtype)
    )(jax.random.PRNGKey(1))
    tx = make_optimizer(
        OptimizerConfig(learning_rate=1e-5, warmup_steps=1, total_steps=100),
        adapters,
    )
    state = init_train_state(adapters, tx)
    step = make_dpo_step(
        cfg, DPOConfig(lora_scale=lcfg.scale, **(dpo_kwargs or {})), tx
    )
    batch = graft._example_batch(cfg, n_pairs=n_pairs, seq=seq)
    if precompute_ref:
        batch["ref_chosen_logps"] = jnp.zeros((n_pairs,), jnp.float32)
        batch["ref_rejected_logps"] = jnp.zeros((n_pairs,), jnp.float32)

    state, metrics = step(state, params, batch)  # compile
    float(metrics["loss"])
    for _ in range(n_warmup):
        state, metrics = step(state, params, batch)
    float(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, metrics = step(state, params, batch)
    float(metrics["loss"])
    dt = (time.perf_counter() - t0) / n_steps

    tokens = 2 * n_pairs * seq
    total_flops = (
        F.dpo_flops_per_token(
            cfg, seq, ref_forward=not precompute_ref, train_mode="adapter"
        )
        * tokens
        + F.vision_flops_per_image(cfg.vision) * n_pairs
    )
    import os

    gen = os.environ.get("PALLAS_AXON_TPU_GEN", "v5e")
    peak = PEAK_BF16_FLOPS.get(gen, 197e12)
    mfu = total_flops / dt / peak
    return n_pairs / dt, dt * 1e3, mfu, n_params / 1e9


def main():
    _compile_cache()
    on_tpu = jax.default_backend() == "tpu"
    import __graft_entry__ as graft
    from vlrlhf_tpu.models.registry import FAMILIES

    if not on_tpu:
        cfg = graft._flagship_config(tiny=True)
        pps, ms, mfu, pb = _measure_dpo(cfg, 2, 64, 3, 1, False)
        print(json.dumps({
            "metric": "dpo_pairs_per_sec_per_chip", "value": round(pps, 3),
            "unit": "pairs/s", "vs_baseline": 0.0, "backend": "cpu",
            "model": "tiny-cpu",
        }))
        return

    import dataclasses

    # HEADLINE: the 7B north star, bf16 base (the reference's own recipe
    # dtype; largest fitting batch = 1 pair). 'attn' remat fits ONLY with
    # the chunked lm_head (the (B,S,V) logits + f32 softmax VJP it removes
    # are exactly the margin) and beats full remat 1.567 vs 1.539 pairs/s.
    cfg7 = FAMILIES["llava"].make_config()
    cfg7 = dataclasses.replace(
        cfg7, lm=dataclasses.replace(cfg7.lm, remat_policy="attn")
    )
    pps7, ms7, mfu7, pb7 = _measure_dpo(
        cfg7, n_pairs=1, seq=1024, n_steps=10, n_warmup=3,
        precompute_ref=True, dpo_kwargs={"logits_chunk": 256},
    )
    # PERFORMANCE MODE: QLoRA (int8 frozen base, ops/quant.py — the
    # reference supports q_lora too, auto_load.py:509-578). Halved param
    # HBM affords the 'acts' remat policy (save all per-layer activations).
    cfg7q = dataclasses.replace(
        cfg7, lm=dataclasses.replace(cfg7.lm, remat_policy="acts")
    )
    pps7q, ms7q, mfu7q, _ = _measure_dpo(
        cfg7q, n_pairs=1, seq=1024, n_steps=10, n_warmup=3,
        precompute_ref=True, quantize=True,
    )
    # QWEN-VL 7B (9.66B params: 151k vocab + ViT-bigG + resampler) — only
    # fits on one v5e with the WIDE int8 set (frozen vision tower +
    # projector quantized too, ops/quant.py TRAIN_QUANT_PATTERNS_WIDE)
    from vlrlhf_tpu.ops.quant import TRAIN_QUANT_PATTERNS_WIDE

    cfgqw = FAMILIES["qwen_vl"].make_config()
    cfgqw = dataclasses.replace(
        cfgqw, lm=dataclasses.replace(cfgqw.lm, remat_policy="mlp1")
    )
    pps_qw, ms_qw, mfu_qw, pb_qw = _measure_dpo(
        cfgqw, n_pairs=1, seq=1024, n_steps=10, n_warmup=3,
        precompute_ref=True, quantize=True,
        quant_patterns=TRAIN_QUANT_PATTERNS_WIDE,
    )
    # XC2 7B (8.06B: InternLM2 GQA + PLoRA + 490px tower, 1225 image tokens
    # => seq 2048 to hold a real row) — wide int8, 'attn' remat
    cfgxc = FAMILIES["internlm_xc2"].make_config()
    cfgxc = dataclasses.replace(
        cfgxc, lm=dataclasses.replace(cfgxc.lm, remat_policy="attn")
    )
    pps_xc, ms_xc, mfu_xc, pb_xc = _measure_dpo(
        cfgxc, n_pairs=1, seq=2048, n_steps=10, n_warmup=3,
        precompute_ref=True, quantize=True,
        quant_patterns=TRAIN_QUANT_PATTERNS_WIDE, with_plora=True,
    )
    # continuity: round-1 1.5B shape, online ref ('acts' fits in bf16 here)
    cfg15 = graft._flagship_config(tiny=False)
    cfg15 = dataclasses.replace(
        cfg15, lm=dataclasses.replace(cfg15.lm, remat_policy="acts")
    )
    pps15, ms15, mfu15, pb15 = _measure_dpo(
        cfg15, n_pairs=4, seq=1024, n_steps=10, n_warmup=3, precompute_ref=False
    )

    print(json.dumps({
        "metric": "dpo_pairs_per_sec_per_chip",
        "value": round(pps7, 3),
        "unit": "pairs/s",
        # the reference publishes no throughput numbers
        # (BASELINE.json.published == {}), so there is no real baseline ratio
        "vs_baseline": 0.0,
        "model": "llava-1.5-7b geometry (7.06B params, bf16)",
        "pairs_per_step": 1,
        "seq": 1024,
        "step_ms": round(ms7, 1),
        "mfu": round(mfu7, 4),
        "mfu_vs_40pct_target": round(mfu7 / 0.40, 3),
        "ref_logps": "precomputed",
        "remat_policy": "attn",
        "logits_chunk": 256,
        "flops_accounting": "LoRA 4N fwd+bwd (frozen base: no dW matmuls)",
        "qlora_int8_7b": {
            # same 7B geometry, int8 frozen base + bf16 LoRA/head, remat
            # 'acts' — the fastest supported 7B training mode on one v5e
            "pairs_per_sec": round(pps7q, 3), "pairs_per_step": 1,
            "step_ms": round(ms7q, 1), "mfu": round(mfu7q, 4),
            "ref_logps": "precomputed", "remat_policy": "acts",
        },
        "qlora_int8_qwenvl_7b": {
            # Qwen-VL-Chat geometry (9.66B total params) — UNRUNNABLE on one
            # v5e without the wide int8 set; mlp1 remat is the fastest fit
            "pairs_per_sec": round(pps_qw, 3), "pairs_per_step": 1,
            "step_ms": round(ms_qw, 1), "mfu": round(mfu_qw, 4),
            "params_b": round(pb_qw, 2), "ref_logps": "precomputed",
            "remat_policy": "mlp1", "quant": "int8 lm+vision+projector",
        },
        "qlora_int8_xc2_7b": {
            # InternLM-XComposer2-VL geometry at seq 2048 (PLoRA active at
            # the 1225 image positions)
            "pairs_per_sec": round(pps_xc, 3), "pairs_per_step": 1,
            "seq": 2048, "step_ms": round(ms_xc, 1),
            "mfu": round(mfu_xc, 4), "params_b": round(pb_xc, 2),
            "ref_logps": "precomputed", "remat_policy": "attn",
            "quant": "int8 lm+vision+projector",
        },
        "continuity_1p5b": {
            "pairs_per_sec": round(pps15, 3), "pairs_per_step": 4,
            "step_ms": round(ms15, 1), "mfu": round(mfu15, 4),
            "ref_logps": "online", "remat_policy": "acts",
        },
        "backend": jax.default_backend(),
    }))


def main_eval():
    """Secondary north-star metric: eval images/sec through the generation
    engine (MME-style batched greedy decode). Run: python bench.py --eval"""
    _compile_cache()
    import __graft_entry__ as graft
    from vlrlhf_tpu.generate.engine import GenerateConfig, Generator
    from vlrlhf_tpu.models.vlm import init_vlm_params

    on_tpu = jax.default_backend() == "tpu"
    cfg = graft._flagship_config(tiny=not on_tpu)
    params = jax.jit(lambda k: init_vlm_params(cfg, k))(jax.random.PRNGKey(0))
    bsz, prompt_len, n_new = (32, 128, 16) if on_tpu else (2, 32, 4)

    batch = graft._example_batch(cfg, n_pairs=bsz // 2, seq=prompt_len)
    gen_batch = {
        "input_ids": batch["input_ids"][:bsz],
        "pad_mask": batch["pad_mask"][:bsz],
        "prompt_lens": jnp.full((bsz,), prompt_len, jnp.int32),
        "pixel_values": jnp.concatenate(
            [batch["pixel_values"], batch["pixel_values"]], 0
        )[:bsz],
        "image_positions": batch["image_positions"][:bsz],
    }
    gen = Generator(cfg, GenerateConfig(max_new_tokens=n_new, pad_token_id=0))
    t = gen(params, gen_batch)
    _ = int(jnp.sum(t))  # compile + sync
    n_iters = 5
    t0 = time.perf_counter()
    for _ in range(n_iters):
        t = gen(params, gen_batch, rng=jax.random.PRNGKey(1))
    _ = int(jnp.sum(t))
    dt = (time.perf_counter() - t0) / n_iters
    print(
        json.dumps(
            {
                "metric": "eval_imgs_per_sec",
                "value": round(bsz / dt, 3),
                "unit": "imgs/s",
                "vs_baseline": 0.0,
                "batch": bsz,
                "prompt_len": prompt_len,
                "new_tokens": n_new,
                "backend": jax.default_backend(),
            }
        )
    )


if __name__ == "__main__":
    import sys

    if "--eval" in sys.argv:
        main_eval()
    else:
        main()
