"""Speculative-decoding cost model on the real chip.

End-to-end speculation speedup depends on the ACCEPTANCE RATE, which is a
property of real checkpoints on real data (random-weight models emit
degenerate repetition that the repeat-last draft matches — measuring e2e
tok/s here would be dishonest). What IS honestly measurable on synthetic
weights is the COST side:

  t_dec    — one plain decode step (1 token/dispatch)
  t_ver(K) — one K+1-token verify chunk (lm_prefill_chunk all-logits)

With mean accepted drafts a, speculation emits a+1 tokens per t_ver, so it
wins when (a+1) > t_ver/t_dec. This tool prints t_dec, t_ver for K in
{3, 7, 15}, and each K's BREAKEVEN acceptance (tokens that must be
accepted per verify for parity) — apply any real workload's acceptance
rate to read off the speedup.

Usage: python tools/spec_bench.py [--7b] [--int8] [--batch N]
"""
import sys
import time

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
import numpy as np

import __graft_entry__ as graft
from vlrlhf_tpu.generate.engine import GenerateConfig, Generator
from vlrlhf_tpu.generate.speculative import SpeculativeGenerator
from vlrlhf_tpu.models.vlm import init_vlm_params


def main():
    assert jax.default_backend() == "tpu"
    seven_b = "--7b" in sys.argv
    int8 = "--int8" in sys.argv
    b = (int(sys.argv[sys.argv.index("--batch") + 1])
         if "--batch" in sys.argv else 8)
    if seven_b:
        from vlrlhf_tpu.models.registry import FAMILIES

        cfg = FAMILIES["llava"].make_config()
    else:
        cfg = graft._flagship_config(tiny=False)
    if int8:
        from vlrlhf_tpu.ops.quant import quantize_params

        params = jax.jit(
            lambda k: quantize_params(init_vlm_params(cfg, k))
        )(jax.random.PRNGKey(0))
    else:
        params = jax.jit(lambda k: init_vlm_params(cfg, k))(
            jax.random.PRNGKey(0)
        )

    prompt = 128
    ids = np.asarray(
        jax.random.randint(jax.random.PRNGKey(1), (b, prompt), 5, 1000)
    )
    batch = {
        "input_ids": ids,
        "pad_mask": np.ones((b, prompt), bool),
        "prompt_lens": np.full((b,), prompt, np.int32),
        "pixel_values": None,
        "image_positions": None,
    }

    # t_dec: plain host-mode decode, 32 steps timed
    n_new = 32
    gen = Generator(cfg, GenerateConfig(
        max_new_tokens=n_new, pad_token_id=0, decode_mode="host"))
    t = gen(params, batch)
    _ = int(jnp.sum(t))
    t0 = time.perf_counter()
    t = gen(params, batch)
    _ = int(jnp.sum(t))
    t_total = time.perf_counter() - t0
    t_dec = t_total / n_new * 1e3
    print(f"t_dec  B={b}: {t_dec:.2f} ms/step")

    # t_ver(K): the speculative verify dispatch, timed via the generator's
    # own compiled fn (prefill once, then loop verify on a fixed state)
    for k in (3, 7, 15):
        spec = SpeculativeGenerator(
            cfg, GenerateConfig(max_new_tokens=16, pad_token_id=0),
            k_draft=k,
        )
        out = spec(params, batch)  # compiles prefill + verify
        verify = spec._verify_fn()
        cache_len = -(-(prompt + 16 + k + 1) // 128) * 128
        cache, lengths, first, done0, out0 = spec._prefill._fn(cache_len)(
            params, jnp.asarray(ids), jnp.ones((b, prompt), bool),
            jnp.full((b,), prompt, jnp.int32), None, None, None, None,
            None, jax.random.PRNGKey(0), None, 1.0,
        )
        chunk = jnp.asarray(
            np.tile(np.arange(k + 1, dtype=np.int32)[None] + 5, (b, 1))
        )
        clens = jnp.full((b,), k + 1, jnp.int32)
        g, cache = verify(params, cache, chunk, clens,
                          jnp.full((b,), prompt, jnp.int32), None, 1.0)
        _ = int(jnp.sum(g))
        iters = 20
        t0 = time.perf_counter()
        for _i in range(iters):
            g, cache = verify(params, cache, chunk, clens,
                              jnp.full((b,), prompt, jnp.int32), None, 1.0)
        _ = int(jnp.sum(g))
        t_ver = (time.perf_counter() - t0) / iters * 1e3
        breakeven = t_ver / t_dec
        print(f"t_ver K={k:2d} B={b}: {t_ver:.2f} ms/verify  "
              f"breakeven {breakeven:.2f} tokens/verify "
              f"(max {k + 1}) -> win if acceptance > "
              f"{max(0.0, (breakeven - 1) / k):.2f}")


if __name__ == "__main__":
    main()
