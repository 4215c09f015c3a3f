"""Decode small-batch roofline analysis (VERDICT r2 weak item 5 / next item 7).

Round 2 measured a weights-only decode step of 5.0 ms vs a 3.4 ms
weight-stream ideal at B=32 cache-160 (1.5B bf16). This tool decomposes the
full decode step into measured components so the remaining gap is explained
by numbers, not guesses:

  ideal_weights   = param bytes / HBM BW        (819 GB/s on v5e)
  ideal_kv        = cache bytes touched / HBM BW
  matmuls_only    = per-layer projections + lm_head on (B, h), no attention
  attn_only       = the Pallas decode-attention kernel alone
  full_step       = lm_decode end to end

All loops run INSIDE one jit (lax.fori_loop) — per-call tunnel launch
overhead (~0.55 ms) would otherwise dominate kernel-scale timings
(tools/flash_bench.py methodology).

Usage: python tools/decode_floor.py [--7b] [--int8] [--batch N] [--cache N]
"""
import functools
import sys
import time

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
import numpy as np

import __graft_entry__ as graft

HBM_GBPS = {"v5e": 819, "v5p": 2765, "v4": 1228, "v6e": 1640}


def _gen():
    import os

    return os.environ.get("PALLAS_AXON_TPU_GEN", "v5e")


def timed_loop(fn, carry, iters=32):
    """Run `carry = fn(i, carry)` iters times inside ONE jit; time a second
    call (first compiles)."""

    @jax.jit
    def run(carry):
        return jax.lax.fori_loop(0, iters, fn, carry)

    out = run(carry)
    jax.tree.map(
        lambda x: x.block_until_ready() if hasattr(x, "block_until_ready")
        else x, out,
    )
    _ = float(jax.tree.leaves(out)[0].reshape(-1)[0])
    t0 = time.perf_counter()
    out = run(carry)
    _ = float(jax.tree.leaves(out)[0].reshape(-1)[0])
    return (time.perf_counter() - t0) / iters, out


def main():
    assert jax.default_backend() == "tpu"
    seven_b = "--7b" in sys.argv
    int8 = "--int8" in sys.argv
    B = int(sys.argv[sys.argv.index("--batch") + 1]) if "--batch" in sys.argv else 32
    SC = int(sys.argv[sys.argv.index("--cache") + 1]) if "--cache" in sys.argv else 256

    if seven_b:
        from vlrlhf_tpu.models.registry import FAMILIES

        cfg = FAMILIES["llava"].make_config()
    else:
        cfg = graft._flagship_config(tiny=False)
    lm = cfg.lm
    from vlrlhf_tpu.models.vlm import init_vlm_params

    if int8:
        from vlrlhf_tpu.ops.quant import quantize_params

        params = jax.jit(
            lambda k: quantize_params(init_vlm_params(cfg, k))
        )(jax.random.PRNGKey(0))
    else:
        params = jax.jit(lambda k: init_vlm_params(cfg, k))(
            jax.random.PRNGKey(0)
        )

    def leaf_bytes(tree):
        return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(tree))

    lm_bytes = leaf_bytes(params["lm"])
    kv_bytes = (
        2 * lm.num_layers * B * SC * lm.num_kv_heads * lm.head_dim_ * 2
    )
    bw = HBM_GBPS[_gen()] * 1e9
    print(f"model: {'7B' if seven_b else '1.5B'} "
          f"{'int8' if int8 else 'bf16'}  B={B} cache={SC}")
    print(f"ideal_weights {lm_bytes / bw * 1e3:6.2f} ms "
          f"({lm_bytes / 2**30:.2f} GiB LM params)")
    print(f"ideal_kv      {kv_bytes / bw * 1e3:6.2f} ms "
          f"({kv_bytes / 2**30:.2f} GiB cache)")

    # ---- full decode step (lm_decode, deferred writes, Pallas kernel) ----
    from vlrlhf_tpu.generate.engine import _empty_pending
    from vlrlhf_tpu.models.common import Ctx
    from vlrlhf_tpu.models.lm.llama import lm_decode

    shape = (lm.num_layers, B, lm.num_kv_heads, SC, lm.head_dim_)
    cache = {"k": jnp.zeros(shape, lm.dtype), "v": jnp.zeros(shape, lm.dtype)}
    pending = _empty_pending(lm, B, SC)
    lengths = jnp.full((B,), SC - 64, jnp.int32)
    tok = jnp.full((B,), 7, jnp.int32)

    def full_body(i, carry):
        tok, cache, pending = carry
        logits, cache, pending = lm_decode(
            lm, params["lm"], last_token=tok, lengths=lengths, cache=cache,
            ctx=Ctx(), pending=pending,
        )
        return (jnp.argmax(logits[:, 0], -1).astype(jnp.int32), cache, pending)

    dt_full, _ = timed_loop(full_body, (tok, cache, pending))
    print(f"full_step     {dt_full * 1e3:6.2f} ms")

    # ---- matmuls only: all per-layer projections + lm_head on (B, h) ----
    from vlrlhf_tpu.models.common import embed, linear, rms_norm

    def matmul_body(i, x):
        h = x
        for li in range(lm.num_layers):
            lp = jax.tree.map(
                lambda a: a[li], params["lm"]["layers_scanned"]
            )
            hh = rms_norm(h, lp["input_layernorm"]["weight"], lm.rms_eps)
            q = linear(lp["attn"]["wq"], hh)
            k = linear(lp["attn"]["wk"], hh)
            v = linear(lp["attn"]["wv"], hh)
            o = linear(lp["attn"]["wo"], q + 0 * (k.sum() + v.sum()))
            h = h + o
            hh = rms_norm(
                h, lp["post_attention_layernorm"]["weight"], lm.rms_eps
            )
            from vlrlhf_tpu.models.lm.llama import _mlp_block

            h = h + _mlp_block(lp["mlp"], Ctx(), hh)
        logits = linear(params["lm"]["lm_head"], h)
        return h + 1e-6 * logits[..., : h.shape[-1]]

    x0 = jnp.ones((B, lm.hidden_size), lm.dtype)
    dt_mm, _ = timed_loop(matmul_body, x0)
    print(f"matmuls_only  {dt_mm * 1e3:6.2f} ms "
          f"(= {dt_mm * bw / lm_bytes * 100:.0f}% of weight-stream ideal)")

    # ---- attention kernel only (all layers) ----
    from vlrlhf_tpu.ops.decode_attention import decode_attention

    q0 = jnp.ones((B, lm.num_heads, lm.head_dim_), lm.dtype)
    kc = jnp.ones((B, lm.num_kv_heads, lm.head_dim_), lm.dtype)

    def attn_body(i, acc):
        out = acc
        for li in range(lm.num_layers):
            out = out + decode_attention(
                q0 + out * 1e-6, cache["k"], cache["v"], kc, kc, lengths,
                layer=li,
            )
        return out

    dt_attn, _ = timed_loop(attn_body, jnp.zeros_like(q0))
    print(f"attn_only     {dt_attn * 1e3:6.2f} ms "
          f"(= {dt_attn * bw / kv_bytes * 100:.0f}% of kv-stream ideal)")
    resid = dt_full - dt_mm - dt_attn
    print(f"residual      {resid * 1e3:6.2f} ms "
          "(norms/rope/sampling/scatter + fusion overlap)")


if __name__ == "__main__":
    main()
