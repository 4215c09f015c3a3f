"""Decode throughput microbench on the real chip (before/after kernel work).

Measures ms/token of the host-driven donated decode step and the device
while_loop decode at B in {8, 32}, flagship shape, cache_len 1024.
Usage: python tools/decode_bench.py
"""
import sys, time
sys.path.insert(0, ".")
import jax, jax.numpy as jnp, numpy as np
import __graft_entry__ as graft
from vlrlhf_tpu.generate.engine import GenerateConfig, Generator

def bench(B, n_new=32, prompt=128, cache_len=1024, mode="host"):
    cfg = graft._flagship_config(tiny=False)
    params = jax.jit(lambda k: __import__("vlrlhf_tpu.models.vlm", fromlist=["x"]).init_vlm_params(cfg, k))(jax.random.PRNGKey(0))
    ids = jax.random.randint(jax.random.PRNGKey(1), (B, prompt), 5, 1000)
    gen_batch = {
        "input_ids": np.asarray(ids),
        "pad_mask": np.ones((B, prompt), bool),
        "prompt_lens": np.full((B,), prompt, np.int32),
        "pixel_values": None, "image_positions": None,
    }
    gen = Generator(cfg, GenerateConfig(max_new_tokens=n_new, pad_token_id=0,
                                        decode_mode=mode))
    t = gen(params, gen_batch)
    _ = int(jnp.sum(t))  # compile+sync
    t0 = time.perf_counter()
    for _ in range(3):
        t = gen(params, gen_batch)
    _ = int(jnp.sum(t))
    dt = (time.perf_counter() - t0) / 3
    ms_tok = dt / n_new * 1e3
    print(f"B={B} mode={mode}: {dt*1e3:.1f} ms total, {ms_tok:.2f} ms/token, "
          f"{B/ms_tok*1e3:.0f} tok/s")
    return ms_tok

if __name__ == "__main__":
    assert jax.default_backend() == "tpu"
    for B in (8, 32):
        for mode in ("device", "host"):
            bench(B, mode=mode)
