"""Flash-attention kernel throughput on the real chip.

Reports achieved TF/s for fwd and fwd+bwd at training shapes (useful FLOPs:
2*S^2*D per head per matmul, x2 matmuls fwd, x7 fwd+bwd, halved for causal).

Methodology: the iteration loop runs INSIDE one jit (lax.fori_loop) — eager
per-call dispatch over the axon tunnel costs ~0.55 ms/launch, which would
dominate these 2-5 ms kernels (measured: a 2048^3 matmul "takes" 0.72 ms
per-call but only ~0.1 ms in-loop).

Context (measured, v5e, B4 H32 S1024 D128, 1024x1024 blocks):
  - this kernel fwd       2.26 ms   (jax official flash: 4.40, splash: 4.50)
  - mm-only ablation      1.67 ms   <- QK^T+PV with no softmax/mask at all
  - raw XLA QK^T alone    ~1.7 ms
  So softmax+mask cost ~0.6 ms and the floor is the D=128-contraction matmul
  pair itself; bf16 MXU accumulation is rejected by Mosaic (acc must be f32).

Usage: python tools/flash_bench.py
"""
import sys
import time

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

from vlrlhf_tpu.ops.flash_attention import flash_attention


def bench(b, h, s, d, iters=20):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (b, s, h, d), jnp.bfloat16)
    k = jax.random.normal(ks[1], (b, s, h, d), jnp.bfloat16) * 0.1
    v = jax.random.normal(ks[2], (b, s, h, d), jnp.bfloat16)
    pad = jnp.ones((b, s), bool)

    def one_fwd(q, k, v):
        return flash_attention(q, k, v, causal=True, pad_mask_q=pad,
                               pad_mask_kv=pad)

    @jax.jit
    def fwd_loop(q, k, v):
        def body(i, c):
            # c*1e-30 defeats CSE across iterations without perturbing values
            return jnp.sum(one_fwd(q + c * 1e-30, k, v).astype(jnp.float32))
        return jax.lax.fori_loop(0, iters, body, 0.0)

    @jax.jit
    def fwdbwd_loop(q, k, v):
        def body(i, c):
            f = lambda q, k, v: jnp.sum(
                one_fwd(q + c * 1e-30, k, v).astype(jnp.float32))
            g = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
            return jnp.sum(g[0].astype(jnp.float32))
        return jax.lax.fori_loop(0, iters, body, 0.0)

    for name, fn, n_mm in (("fwd", fwd_loop, 2), ("fwd+bwd", fwdbwd_loop, 7)):
        float(fn(q, k, v))  # compile + warm
        t0 = time.perf_counter()
        float(fn(q, k, v))
        dt = (time.perf_counter() - t0) / iters
        flops = n_mm * 2 * b * h * s * s * d / 2  # causal: ~half the tiles
        print(f"B{b} H{h} S{s} D{d} {name}: {dt*1e3:.2f} ms, "
              f"{flops/dt/1e12:.1f} TF/s")


if __name__ == "__main__":
    assert jax.default_backend() == "tpu"
    bench(4, 32, 1024, 128)
    bench(2, 32, 2048, 128)
    bench(1, 32, 4096, 128)
