"""Benchmark: DPO preference-pairs/sec/chip on the flagship VLM.

Measures the full jitted DPO step (policy fwd+bwd + adapter-off ref fwd +
frozen vision tower + optimizer) on synthetic data at the reference recipe's
shape (seq 1024, /root/reference/README.md:102-104). Prints ONE JSON line.
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
    try:
        import os

        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("JAX_COMPILATION_CACHE_DIR",
                           os.path.expanduser("~/.cache/jax")),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass


def main():
    _compile_cache()
    on_tpu = jax.default_backend() == "tpu"
    import __graft_entry__ as graft
    from vlrlhf_tpu.lora.lora import LoraConfig, init_lora
    from vlrlhf_tpu.models.vlm import init_vlm_params
    from vlrlhf_tpu.train.dpo import DPOConfig, make_dpo_step
    from vlrlhf_tpu.train.train_state import (
        OptimizerConfig,
        init_train_state,
        make_optimizer,
    )

    if on_tpu:
        cfg = graft._flagship_config(tiny=False)
        n_pairs, seq = 4, 1024
        n_steps, n_warmup = 10, 3
    else:
        cfg = graft._flagship_config(tiny=True)
        n_pairs, seq = 2, 64
        n_steps, n_warmup = 3, 1

    # One compiled init program: eager per-op init is pathological over the
    # axon RPC tunnel (~15 ms/dispatch).
    params = jax.jit(lambda k: init_vlm_params(cfg, k))(jax.random.PRNGKey(0))
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
    step = make_dpo_step(cfg, DPOConfig(lora_scale=lcfg.scale), tx)
    batch = graft._example_batch(cfg, n_pairs=n_pairs, seq=seq)

    # NOTE: block_until_ready does not synchronize over the axon tunnel;
    # fetching the value does.
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

    pairs_per_sec = n_pairs / dt

    # FLOPs model: policy fwd+bwd (6NT) + ref fwd (2NT) over 2B*S tokens,
    # causal attention at 0.5 occupancy, frozen vision tower fwd once.
    def lm_matmul_params(c):
        h, ff, L, v = c.hidden_size, c.intermediate_size, c.num_layers, c.vocab_size
        attn = 2 * h * c.num_heads * c.head_dim_ + 2 * h * c.num_kv_heads * c.head_dim_
        return L * (attn + 3 * h * ff) + h * v

    tokens = 2 * n_pairs * seq
    n_lm = lm_matmul_params(cfg.lm)
    lm_flops = (6 + 2) * n_lm * tokens
    attn_flops = (
        (3 + 1) * 0.5 * cfg.lm.num_layers * 4 * seq * seq
        * cfg.lm.hidden_size * 2 * n_pairs * 2
    ) / 2
    vis_tokens = n_pairs * cfg.vision.seq_len
    n_vis = cfg.vision.num_layers * (
        4 * cfg.vision.hidden_size**2 + 2 * cfg.vision.hidden_size * cfg.vision.mlp_dim
    )
    vis_flops = 2 * n_vis * vis_tokens
    total_flops = lm_flops + attn_flops + vis_flops

    gen = None
    import os

    gen = os.environ.get("PALLAS_AXON_TPU_GEN", "v5e") if on_tpu else None
    peak = PEAK_BF16_FLOPS.get(gen or "", 197e12)
    mfu = total_flops / dt / peak if on_tpu else 0.0

    print(
        json.dumps(
            {
                "metric": "dpo_pairs_per_sec_per_chip",
                "value": round(pairs_per_sec, 3),
                "unit": "pairs/s",
                "vs_baseline": round(mfu / 0.40, 3) if on_tpu else 0.0,
                "mfu": round(mfu, 4),
                "step_ms": round(dt * 1e3, 1),
                "model": "llava-style 1.5B-LM + CLIP-L tower" if on_tpu else "tiny-cpu",
                "seq": seq,
                "pairs_per_step": n_pairs,
                "backend": jax.default_backend(),
            }
        )
    )


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
