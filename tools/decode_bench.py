"""Decode throughput microbench on the real chip (before/after kernel work).

Measures ms/token of the host-driven donated decode step and the device
while_loop decode at B in {8, 32}, flagship shape, cache_len 1024.
Usage: python tools/decode_bench.py [--int8] [--kv8] [--7b] [--long]
    [--batch N] [--fuse]
  --int8  quantize LM weights to int8 (ops/quant.py W8A16 serving mode)
  --int4  group-wise int4 weights (ops/int4.py Pallas dequant-matmul)
  --batch N  bench only batch size N (default: 8 and 32)
  --kv8   int8 KV cache (GenerateConfig kv_cache_dtype='int8')
  --7b    LLaVA-1.5-7B geometry instead of the 1.5B flagship
  --long  prompt 896 + 128 new (cache 1024) instead of 128 + 32
  --fuse  fused wqkv/gateup serving weights (models/lm/fuse)
"""
import sys, time
sys.path.insert(0, ".")
import jax, jax.numpy as jnp, numpy as np
import __graft_entry__ as graft
from vlrlhf_tpu.generate.engine import GenerateConfig, Generator

def bench(B, n_new=32, prompt=128, mode="host", int8=False, seven_b=False,
          kv8=False, fuse=False, int4=False):
    if seven_b:
        from vlrlhf_tpu.models.registry import FAMILIES
        cfg = FAMILIES["llava"].make_config()
    else:
        cfg = graft._flagship_config(tiny=False)
    from vlrlhf_tpu.models.vlm import init_vlm_params
    if int8 or int4:
        from vlrlhf_tpu.ops.quant import quantize_params
        params = jax.jit(
            lambda k: quantize_params(init_vlm_params(cfg, k),
                                      bits=4 if int4 else 8)
        )(jax.random.PRNGKey(0))
    else:
        params = jax.jit(lambda k: init_vlm_params(cfg, k))(jax.random.PRNGKey(0))
    if fuse:
        from vlrlhf_tpu.models.lm.fuse import fuse_vlm_params
        params = jax.jit(fuse_vlm_params, donate_argnums=0)(params)
    ids = jax.random.randint(jax.random.PRNGKey(1), (B, prompt), 5, 1000)
    gen_batch = {
        "input_ids": np.asarray(ids),
        "pad_mask": np.ones((B, prompt), bool),
        "prompt_lens": np.full((B,), prompt, np.int32),
        "pixel_values": None, "image_positions": None,
    }
    gen = Generator(cfg, GenerateConfig(
        max_new_tokens=n_new, pad_token_id=0, decode_mode=mode,
        kv_cache_dtype="int8" if kv8 else "bf16"))
    t = gen(params, gen_batch)
    _ = int(jnp.sum(t))  # compile+sync
    t0 = time.perf_counter()
    for _ in range(3):
        t = gen(params, gen_batch)
    _ = int(jnp.sum(t))
    dt = (time.perf_counter() - t0) / 3
    ms_tok = dt / n_new * 1e3
    print(f"B={B} mode={mode} int8={int8} int4={int4} kv8={kv8} fuse={fuse}: "
          f"{dt*1e3:.1f} ms total, "
          f"{ms_tok:.2f} ms/token, {B/ms_tok*1e3:.0f} tok/s")
    return ms_tok

if __name__ == "__main__":
    assert jax.default_backend() == "tpu"
    int8 = "--int8" in sys.argv
    int4 = "--int4" in sys.argv
    seven_b = "--7b" in sys.argv
    kv8 = "--kv8" in sys.argv
    fuse = "--fuse" in sys.argv
    n_new, prompt = (128, 896) if "--long" in sys.argv else (32, 128)
    bs = ([int(sys.argv[sys.argv.index("--batch") + 1])]
          if "--batch" in sys.argv else [8, 32])
    for B in bs:
        for mode in ("device", "host"):
            bench(B, n_new=n_new, prompt=prompt, mode=mode, int8=int8,
                  seven_b=seven_b, kv8=kv8, fuse=fuse, int4=int4)
