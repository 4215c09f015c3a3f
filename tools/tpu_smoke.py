"""On-TPU hardware validation: run after any kernel/engine change.

The pytest suite runs on a virtual CPU mesh (Pallas in interpret mode); this
script exercises the real compiled paths on the attached TPU chip:
  1. flash attention fwd vs XLA reference (bf16 tolerance) + bwd finiteness
  2. jitted DPO step loss invariant (log 2 at zero-init LoRA) at the 1.5B
     flagship shape
  3. generation engine greedy determinism

Usage: python tools/tpu_smoke.py
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def check_flash_attention():
    from vlrlhf_tpu.ops.attention import make_attention_mask, reference_attention
    from vlrlhf_tpu.ops.flash_attention import flash_attention

    B, S, H, D = 2, 1024, 8, 128
    q, k, v = (
        jax.random.normal(kk, (B, S, H, D), jnp.bfloat16)
        for kk in jax.random.split(jax.random.PRNGKey(0), 3)
    )
    out = jax.jit(lambda q, k, v: flash_attention(q, k, v, causal=True))(q, k, v)
    ones = jnp.ones((B, S), bool)
    ref = reference_attention(
        q, k, v, mask=make_attention_mask(ones, ones, True)
    )
    diff = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32))))
    assert diff < 0.05, f"flash fwd diff {diff}"

    g = jax.jit(
        jax.grad(
            lambda q, k, v: jnp.sum(
                flash_attention(q, k, v, causal=True).astype(jnp.float32) ** 2
            ),
            argnums=(0, 1, 2),
        )
    )(q, k, v)
    for x in g:
        assert bool(jnp.isfinite(x.astype(jnp.float32)).all())
    print(f"[1/3] flash attention ok (fwd max diff {diff:.4f})")


def check_dpo_step():
    import __graft_entry__ as graft
    from vlrlhf_tpu.lora.lora import LoraConfig, init_lora
    from vlrlhf_tpu.models.vlm import init_vlm_params
    from vlrlhf_tpu.train.dpo import DPOConfig, make_dpo_step
    from vlrlhf_tpu.train.train_state import (
        OptimizerConfig,
        init_train_state,
        make_optimizer,
    )

    cfg = graft._flagship_config(tiny=False)
    params = jax.jit(lambda k: init_vlm_params(cfg, k))(jax.random.PRNGKey(0))
    lcfg = LoraConfig(r=64, alpha=16.0, target_patterns=(r"lm/.*attn/",))
    adapters = jax.jit(lambda k: init_lora(params, lcfg, k, dtype=cfg.lm.dtype))(
        jax.random.PRNGKey(1)
    )
    tx = make_optimizer(
        OptimizerConfig(learning_rate=1e-5, warmup_steps=1, total_steps=10),
        adapters,
    )
    state = init_train_state(adapters, tx)
    step = make_dpo_step(cfg, DPOConfig(lora_scale=lcfg.scale), tx)
    batch = graft._example_batch(cfg, n_pairs=2, seq=512)
    t0 = time.perf_counter()
    state, m = step(state, params, batch)
    loss = float(m["loss"])
    assert abs(loss - np.log(2.0)) < 1e-2, f"step-0 loss {loss} != log 2"
    print(f"[2/3] DPO step ok (loss {loss:.5f}, compile+run "
          f"{time.perf_counter() - t0:.0f}s)")


def check_generation():
    import __graft_entry__ as graft
    from vlrlhf_tpu.generate.engine import GenerateConfig, Generator
    from vlrlhf_tpu.models.vlm import init_vlm_params

    cfg = graft._flagship_config(tiny=False)
    params = jax.jit(lambda k: init_vlm_params(cfg, k))(jax.random.PRNGKey(0))
    batch = graft._example_batch(cfg, n_pairs=2, seq=128)
    gen_batch = {
        "input_ids": batch["input_ids"],
        "pad_mask": batch["pad_mask"],
        "prompt_lens": jnp.full((4,), 128, jnp.int32),
        "pixel_values": jnp.concatenate([batch["pixel_values"]] * 2, 0),
        "image_positions": batch["image_positions"],
    }
    gen = Generator(cfg, GenerateConfig(max_new_tokens=8, pad_token_id=0))
    t1 = np.asarray(gen(params, gen_batch))
    t2 = np.asarray(gen(params, gen_batch))
    np.testing.assert_array_equal(t1, t2)
    assert t1.shape == (4, 8)
    print(f"[3/3] generation ok (greedy deterministic, tokens {t1[0][:4]})")


if __name__ == "__main__":
    assert jax.default_backend() == "tpu", jax.default_backend()
    check_flash_attention()
    check_dpo_step()
    check_generation()
    print("TPU smoke: ALL OK")
