"""Decode roofline decomposition on the real chip (VERDICT r2 weak #5).

The decode step at small batch is HBM-bound; this tool separates the step
into its bandwidth components and measures each one's achievable rate, so
the gap between the measured step and its roofline is attributable:

  1. raw HBM stream rate for int8 / bf16 arrays (reduce kernel, loop in jit)
  2. dequant-matmul effective weight-read rate at decode shapes
     (x (B,H) @ w_i8 (H,H') * scale — the serving matmul, loop in jit)
  3. fused-width variant: one (H, 3H) matmul vs three (H, H) — does wider
     streaming raise GB/s (the qkv/gate-up fusion question)?
  4. decode-attention kernel ms at bench shape (cache DMA component)
  5. full decode step ms (tools/decode_bench.py device mode) for reference

Two measurement hazards this tool defends against (both bit the first
version, which reported a physically impossible 2.9 TB/s "stream rate" on
an ~819 GB/s chip):
  - constant inputs: jnp.ones is a broadcast the compiler can fold through
    reductions and matmuls without touching HBM — all arrays are random.
  - loop-invariant hoisting: a fori_loop body that doesn't depend on the
    carry gets its expensive op hoisted out of the loop by HLO LICM — every
    body here threads the carry into the operand (x * (1 + acc * 1e-30))
    or indexes by the induction variable, so each iteration really runs.

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


def _rand(key, shape, dtype):
    if jnp.dtype(dtype) == jnp.int8:
        return jax.random.randint(key, shape, -127, 127, jnp.int32).astype(
            jnp.int8)
    return jax.random.normal(key, shape, dtype)


def stream_rate(nbytes_target=1 << 30, dtype=jnp.int8):
    """Raw HBM read rate: reduce one of two random halves per iteration.

    Indexing x[i % 2] (dynamic slice by the induction variable) defeats
    both constant folding and loop-invariant hoisting: each iteration has
    to stream half the buffer from HBM.
    """
    n = nbytes_target // jnp.dtype(dtype).itemsize
    x = _rand(jax.random.PRNGKey(0), (2, n // 2), dtype)

    @jax.jit
    def run(x):
        def body(i, a):
            xi = jax.lax.dynamic_index_in_dim(x, i % 2, keepdims=False)
            s = jnp.sum(xi.astype(jnp.int32) if x.dtype == jnp.int8
                        else xi.astype(jnp.float32))
            return a + s.astype(a.dtype)

        return jax.lax.fori_loop(
            0, N_ITERS, body,
            jnp.zeros((), jnp.int32 if x.dtype == jnp.int8 else jnp.float32))

    dt = _timed(run, x)
    per_iter_bytes = x.nbytes // 2
    gbs = per_iter_bytes / dt / 1e9
    print(f"  stream {jnp.dtype(dtype).name:8s} read: {gbs:7.1f} GB/s "
          f"({per_iter_bytes / 2**20:.0f} MiB/iter, {dt * 1e3:.3f} ms/iter)")
    return gbs


def matmul_rate(b, h, out, dtype=jnp.int8, label=""):
    """Effective weight-read GB/s of the serving dequant-matmul.

    The activation is perturbed by the loop carry (x * (1 + acc*1e-30)) so
    the matmul cannot be hoisted; the perturbation itself is (B,H) VPU work,
    negligible next to streaming the (H,out) weight.
    """
    k = jax.random.PRNGKey(1)
    w = _rand(k, (h, out), dtype)
    scale = jnp.full((1, out), 0.01, jnp.bfloat16)
    x = _rand(jax.random.fold_in(k, 1), (b, h), jnp.bfloat16)

    @jax.jit
    def run(x, w, scale):
        def body(i, acc):
            xi = x * (1 + acc * 1e-30).astype(x.dtype)
            y = (xi @ w.astype(jnp.bfloat16)) * scale
            return acc + jnp.sum(y.astype(jnp.float32))

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
    key = jax.random.PRNGKey(2)
    ck = _rand(key, (layers, b, nkv, cache_len, hd), kdt)
    cv = _rand(jax.random.fold_in(key, 1), (layers, b, nkv, cache_len, hd),
               kdt)
    ks = vs = None
    if kv8:
        ks = jnp.full((layers, b, nkv, cache_len), 0.01, jnp.bfloat16)
        vs = jnp.full((layers, b, nkv, cache_len), 0.01, jnp.bfloat16)
    q = _rand(jax.random.fold_in(key, 2), (b, nh, hd), jnp.bfloat16)
    kc = _rand(jax.random.fold_in(key, 3), (b, nkv, hd), jnp.bfloat16)
    lengths = jnp.full((b,), cache_len - 1, jnp.int32)

    @jax.jit
    def run(q, ck, cv, kc, lengths, ks, vs):
        def body(i, acc):
            qi = q * (1 + acc * 1e-30).astype(q.dtype)
            o = 0.0
            for layer in range(layers):
                o = o + jnp.sum(decode_attention(
                    qi, ck, cv, kc, kc, lengths, layer=layer,
                    k_scale=ks, v_scale=vs,
                ).astype(jnp.float32))
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
    r_head, _ = matmul_rate(b, h, vocab, label="lm_head")

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
    t_attn = attention_ms(b, nh, nkv, hd, cache_len, layers, kv8=False)
    attention_ms(b, nh, nkv, hd, cache_len, layers, kv8=True)

    # roofline synthesis: weight stream at the measured big-matmul rate +
    # the measured attention kernel = the attributable floor for one step
    wbytes = layers * (h * nh * hd + 2 * h * nkv * hd + nh * hd * h
                       + 3 * h * ff) + h * vocab
    t_w = wbytes / (r_head * 1e9)
    print(f"[5] int8 weight bytes/step: {wbytes / 2**30:.2f} GiB "
          f"-> at measured lm_head rate {r_head:.0f} GB/s = "
          f"{t_w * 1e3:.2f} ms weight floor; + attention "
          f"{t_attn * 1e3:.2f} ms = {(t_w + t_attn) * 1e3:.2f} ms "
          f"attributable step floor")
    print("compare: python tools/decode_bench.py --int8 "
          f"--batch {b} (full step ms/token)")


if __name__ == "__main__":
    main()
