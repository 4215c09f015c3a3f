"""Decode roofline decomposition on the real chip (VERDICT r2 weak #5).

The decode step at small batch is HBM-bound; this tool separates the step
into its bandwidth components and measures each one's achievable rate, so
the gap between the measured step and its roofline is attributable:

  1. raw HBM stream rate for int8 / bf16 arrays (copy kernel, loop in jit)
  2. dequant-matmul effective weight-read rate at decode shapes
     (x (B,H) @ w_i8 (H,H') * scale — the serving matmul, loop in jit)
  3. fused-width variant: one (H, 3H) matmul vs three (H, H) — does wider
     streaming raise GB/s (the qkv/gate-up fusion question)?
  4. decode-attention kernel ms at bench shape (cache DMA component)
  5. full decode step ms (tools/decode_bench.py device mode) for reference

All loops run INSIDE one jit (lax.fori_loop) — per-call tunnel overhead is
~0.55 ms, kernel-scale timings are meaningless otherwise (CLAUDE.md).

Usage: python tools/decode_floor.py [--7b] [--batch N] [--cache N]
"""
import sys
import time

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

N_ITERS = 50


def _timed(fn, *args):
    """Compile, then time N_ITERS executions driven inside one jit."""
    out = fn(*args)
    _ = float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    t0 = time.perf_counter()
    out = fn(*args)
    _ = float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    return (time.perf_counter() - t0) / N_ITERS


def stream_rate(nbytes_target=2 << 30, dtype=jnp.int8):
    """Raw HBM read+write rate: y = x + 1 over a big array, N_ITERS times."""
    n = nbytes_target // jnp.dtype(dtype).itemsize
    x = jnp.ones((n,), dtype)

    @jax.jit
    def run(x):
        # a reduce reads the array once per iter with no write traffic
        return jax.lax.fori_loop(
            0, N_ITERS,
            lambda i, a: a + jnp.sum(x.astype(jnp.int32) if dtype == jnp.int8
                                     else x.astype(jnp.float32)).astype(
                                         a.dtype),
            jnp.zeros((), jnp.int32 if dtype == jnp.int8 else jnp.float32),
        )

    dt = _timed(run, x)
    gbs = x.nbytes / dt / 1e9
    print(f"  stream {jnp.dtype(dtype).name:8s} read: {gbs:7.1f} GB/s "
          f"({x.nbytes / 2**20:.0f} MiB, {dt * 1e3:.3f} ms/pass)")
    return gbs


def matmul_rate(b, h, out, dtype=jnp.int8, label=""):
    """Effective weight-read GB/s of the serving dequant-matmul."""
    w = jnp.ones((h, out), dtype)
    scale = jnp.full((1, out), 0.01, jnp.bfloat16)
    x = jnp.ones((b, h), jnp.bfloat16)

    @jax.jit
    def run(x, w, scale):
        def body(i, acc):
            y = (x @ w.astype(jnp.bfloat16)) * scale
            return acc + jnp.sum(y)

        return jax.lax.fori_loop(0, N_ITERS, body,
                                 jnp.zeros((), jnp.float32))

    dt = _timed(run, x, w, scale)
    gbs = w.nbytes / dt / 1e9
    print(f"  matmul {label or f'({h}x{out})':16s} B={b:<3d}: {gbs:7.1f} GB/s "
          f"weight-read ({dt * 1e6:.1f} us/matmul)")
    return gbs, dt


def attention_ms(b, nh, nkv, hd, cache_len, layers, kv8=False):
    """Per-step cost of the decode-attention kernel over all layers."""
    from vlrlhf_tpu.ops.decode_attention import decode_attention

    kdt = jnp.int8 if kv8 else jnp.bfloat16
    ck = jnp.ones((layers, b, nkv, cache_len, hd), kdt)
    cv = jnp.ones((layers, b, nkv, cache_len, hd), kdt)
    ks = vs = None
    if kv8:
        ks = jnp.full((layers, b, nkv, cache_len), 0.01, jnp.bfloat16)
        vs = jnp.full((layers, b, nkv, cache_len), 0.01, jnp.bfloat16)
    q = jnp.ones((b, nh, hd), jnp.bfloat16)
    kc = jnp.ones((b, nkv, hd), jnp.bfloat16)
    lengths = jnp.full((b,), cache_len - 1, jnp.int32)

    @jax.jit
    def run(q, ck, cv, kc, lengths, ks, vs):
        def body(i, acc):
            o = 0.0
            for layer in range(layers):
                o = o + jnp.sum(decode_attention(
                    q, ck, cv, kc, kc, lengths, layer=layer,
                    k_scale=ks, v_scale=vs,
                ))
            return acc + o

        return jax.lax.fori_loop(0, N_ITERS, body, jnp.zeros((), jnp.float32))

    dt = _timed(run, q, ck, cv, kc, lengths, ks, vs)
    nbytes = ck.nbytes + cv.nbytes + (ks.nbytes + vs.nbytes if kv8 else 0)
    print(f"  attention x{layers} layers cache={cache_len} "
          f"{'int8' if kv8 else 'bf16'}: {dt * 1e3:.3f} ms/step "
          f"({nbytes / dt / 1e9:.1f} GB/s cache-read)")
    return dt


def main():
    assert jax.default_backend() == "tpu", "floor analysis needs the chip"
    seven_b = "--7b" in sys.argv
    b = (int(sys.argv[sys.argv.index("--batch") + 1])
         if "--batch" in sys.argv else 32)
    cache_len = (int(sys.argv[sys.argv.index("--cache") + 1])
                 if "--cache" in sys.argv else 160)

    if seven_b:
        h, ff, nh, nkv, hd, layers, vocab = 4096, 11008, 32, 32, 128, 32, 32000
    else:  # flagship 1.5B (tools/decode_bench.py geometry)
        h, ff, nh, nkv, hd, layers, vocab = 2048, 5504, 16, 16, 128, 24, 32000

    print(f"shape: H={h} FF={ff} L={layers} B={b} cache={cache_len}")
    print("[1] raw HBM stream")
    stream_rate(dtype=jnp.int8)
    stream_rate(dtype=jnp.bfloat16)

    print("[2] dequant-matmul weight-read rate at decode widths")
    r_qkv, _ = matmul_rate(b, h, nh * hd, label="wq (HxH)")
    matmul_rate(b, h, ff, label="gate (HxFF)")
    matmul_rate(b, ff, h, label="down (FFxH)")
    matmul_rate(b, h, vocab, label="lm_head")

    print("[3] fused-width ablation (is wider better?)")
    _, t3 = matmul_rate(b, h, 3 * h, label="qkv fused (Hx3H)")
    _, t1 = matmul_rate(b, h, h, label="q alone (HxH)")
    print(f"    3x(HxH) = {3 * t1 * 1e6:.1f} us vs 1x(Hx3H) = {t3 * 1e6:.1f} us "
          f"-> fusion saves {(3 * t1 - t3) * 1e6:.1f} us/layer-group")
    _, tg = matmul_rate(b, h, 2 * ff, label="gateup fused")
    _, tu = matmul_rate(b, h, ff, label="up alone")
    print(f"    2x(HxFF) = {2 * tu * 1e6:.1f} us vs 1x(Hx2FF) = {tg * 1e6:.1f} us "
          f"-> fusion saves {(2 * tu - tg) * 1e6:.1f} us/layer-group")

    print("[4] decode-attention kernel")
    attention_ms(b, nh, nkv, hd, cache_len, layers, kv8=False)
    attention_ms(b, nh, nkv, hd, cache_len, layers, kv8=True)

    # roofline synthesis
    wbytes = layers * (h * nh * hd + 2 * h * nkv * hd + nh * hd * h
                       + 3 * h * ff) + h * vocab
    print(f"[5] int8 weight bytes/step: {wbytes / 2**30:.2f} GiB "
          f"-> at measured wq rate {r_qkv:.0f} GB/s = "
          f"{wbytes / (r_qkv * 1e9) * 1e3:.2f} ms weight floor")
    print("compare: python tools/decode_bench.py --int8 "
          f"--batch {b} (full step ms/token)")


if __name__ == "__main__":
    main()
