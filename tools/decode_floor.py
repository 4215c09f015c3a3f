"""Decode roofline decomposition on the real chip (VERDICT r2 weak #5).

The decode step at small batch is HBM-bound; this tool separates the step
into its bandwidth components and measures each one's achievable rate, so
the gap between the measured step and its roofline is attributable:

  1. raw HBM stream rate for int8 / bf16 arrays (lane-parallel reduce,
     loop in jit) — measured 442/418 GB/s on the v5e (a scalar tree-reduce
     variant read 85/157: the cross-lane reduce was the bottleneck).
  2. dequant-matmul per-iteration cost at decode widths. MEASURED CAVEAT:
     one-matmul-per-iteration bodies show a FLAT ~500-580 us/iteration for
     4 MB (wq) through 64 MB (lm_head) weights — a fixed fori_loop
     iteration overhead dominates single small matmuls, so the per-matmul
     "GB/s" here is a LOWER bound only meaningful at lm_head width. The
     honest floor is section [6], which amortizes that overhead over the
     169 matmuls of a real step.
  3. fused-width variant — same caveat as [2]: the "fusion saves" deltas
     compare k iterations against 1 and are dominated by the fixed
     iteration cost; the authoritative fusion verdict is the on-chip
     full-step A/B in ROADMAP (neutral-to-slightly-negative).
  4. decode-attention kernel ms at bench shape (cache DMA component)
  6. weights-only decode step: the real program's 169 matmuls (7/layer
     unrolled x 24 + head) chained like the model, no attention/cache —
     THE weights floor to compare tools/decode_bench.py full steps against.

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
                                    [--sections 1,2,3,4]
(--sections: run only the listed sections; [4] attention compiles a
layers-unrolled Pallas program inside the timing loop — minutes of compile
over the axon tunnel — so [1][2][3] can be run and published without it.
[5] synthesizes from whatever ran: weights-only floor always, + attention
if [4] ran.)
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

    # lane-parallel reduce: sum down the MAJOR axis to a (1024,) vector —
    # every lane accumulates a column (pure streaming) — instead of a
    # scalar tree-reduce, whose cross-lane passes bottleneck well below
    # HBM rate. The carry is one element of the vector.
    acc_dt = jnp.int32 if jnp.dtype(dtype) == jnp.int8 else jnp.float32
    xm = x.reshape(2, -1, 1024)

    @jax.jit
    def run(xm):
        def body(i, a):
            xi = jax.lax.dynamic_index_in_dim(xm, i % 2, keepdims=False)
            v = jnp.sum(xi.astype(acc_dt), axis=0)
            return a + v[0]

        return jax.lax.fori_loop(0, N_ITERS, body, jnp.zeros((), acc_dt))

    dt = _timed(run, xm)
    per_iter_bytes = x.nbytes // 2
    gbs = per_iter_bytes / dt / 1e9
    print(f"  stream {jnp.dtype(dtype).name:8s} read: {gbs:7.1f} GB/s "
          f"({per_iter_bytes / 2**20:.0f} MiB/iter, {dt * 1e3:.3f} ms/iter)")
    return gbs


def matmul_rate(b, h, out, dtype=jnp.int8, label=""):
    """Effective weight-read GB/s of the serving dequant-matmul.

    The activation is perturbed by the loop carry (x * (1 + acc*1e-30)) so
    the matmul cannot be hoisted; the perturbation itself is (B,H) VPU work,
    negligible next to streaming the (H,out) weight. The carry update reads
    ONE output element — an earlier version reduced the full (B,out) output
    to a scalar each iteration, and that cross-lane tree reduce imposed a
    flat ~500 us/iteration floor that swamped every sub-lm_head-width
    matmul (wq read 528 us vs lm_head's 575 at 16x the bytes).
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
            return acc + y[0, 0].astype(jnp.float32)

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


def weights_only_step(b, h, ff, nh, nkv, hd, layers, vocab,
                      dtype=jnp.int8):
    """The REAL weights-only decode step: every per-layer matmul of the
    serving decode program (q,k,v,o,gate,up,down — activation chained
    through them exactly as the model does) plus the lm_head, with
    attention/cache/sampling removed. Layers are unrolled like the engine's
    decode program; weights are stacked (L, ...) and indexed per layer, so
    HBM streams the full weight set every iteration. This is the floor the
    full decode step (tools/decode_bench.py) should be compared against:
    full-step ms minus this = attention kernel + cache update + sampling.
    """
    k = jax.random.PRNGKey(3)
    qd, kvd, fd = nh * hd, nkv * hd, ff
    ws = {
        "wq": _rand(k, (layers, h, qd), dtype),
        "wk": _rand(jax.random.fold_in(k, 1), (layers, h, kvd), dtype),
        "wv": _rand(jax.random.fold_in(k, 2), (layers, h, kvd), dtype),
        "wo": _rand(jax.random.fold_in(k, 3), (layers, qd, h), dtype),
        "wg": _rand(jax.random.fold_in(k, 4), (layers, h, fd), dtype),
        "wu": _rand(jax.random.fold_in(k, 5), (layers, h, fd), dtype),
        "wd": _rand(jax.random.fold_in(k, 6), (layers, fd, h), dtype),
        "head": _rand(jax.random.fold_in(k, 7), (h, vocab), dtype),
    }
    scales = {n: jnp.full((1, w.shape[-1]), 0.01, jnp.bfloat16)
              for n, w in ws.items()}
    x0 = _rand(jax.random.fold_in(k, 8), (b, h), jnp.bfloat16)

    def mm(x, w, s):
        return (x @ w.astype(jnp.bfloat16)) * s

    @jax.jit
    def run(x0, ws, scales):
        def body(i, carry):
            x = x0 * (1 + carry * 1e-30).astype(x0.dtype)
            for li in range(layers):
                wl = {n: (w[li] if w.ndim == 3 else w)
                      for n, w in ws.items()}
                q = mm(x, wl["wq"], scales["wq"])
                _k = mm(x, wl["wk"], scales["wk"])
                v = mm(x, wl["wv"], scales["wv"])
                # no attention: q (+ a k/v touch so they aren't dead code)
                att = q.at[:, 0].add(_k[0, 0] + v[0, 0])
                x = x + mm(att, wl["wo"], scales["wo"])
                g = mm(x, wl["wg"], scales["wg"])
                u = mm(x, wl["wu"], scales["wu"])
                x = x + mm(jax.nn.silu(g) * u, wl["wd"], scales["wd"])
            logit = mm(x, ws["head"], scales["head"])
            return carry + logit[0, 0].astype(jnp.float32)

        return jax.lax.fori_loop(0, N_ITERS, body, jnp.zeros((),
                                                             jnp.float32))

    dt = _timed(run, x0, ws, scales)
    wbytes = sum(w.nbytes for w in ws.values())
    print(f"  weights-only decode step (L={layers} unrolled + head, "
          f"{jnp.dtype(dtype).name}): {dt * 1e3:.3f} ms/step "
          f"({wbytes / 2**30:.2f} GiB -> {wbytes / dt / 1e9:.1f} GB/s "
          f"effective weight stream)")
    return dt


def main():
    assert jax.default_backend() == "tpu", "floor analysis needs the chip"
    seven_b = "--7b" in sys.argv
    b = (int(sys.argv[sys.argv.index("--batch") + 1])
         if "--batch" in sys.argv else 32)
    cache_len = (int(sys.argv[sys.argv.index("--cache") + 1])
                 if "--cache" in sys.argv else 160)
    sections = (set(sys.argv[sys.argv.index("--sections") + 1].split(","))
                if "--sections" in sys.argv else {"1", "2", "3", "4", "6"})

    if seven_b:
        h, ff, nh, nkv, hd, layers, vocab = 4096, 11008, 32, 32, 128, 32, 32000
    else:  # flagship 1.5B (tools/decode_bench.py geometry)
        h, ff, nh, nkv, hd, layers, vocab = 2048, 5504, 16, 16, 128, 24, 32000

    print(f"shape: H={h} FF={ff} L={layers} B={b} cache={cache_len}",
          flush=True)
    if "1" in sections:
        print("[1] raw HBM stream", flush=True)
        stream_rate(dtype=jnp.int8)
        stream_rate(dtype=jnp.bfloat16)

    r_head = None
    if "2" in sections:
        print("[2] dequant-matmul weight-read rate at decode widths",
              flush=True)
        r_qkv, _ = matmul_rate(b, h, nh * hd, label="wq (HxH)")
        matmul_rate(b, h, ff, label="gate (HxFF)")
        matmul_rate(b, ff, h, label="down (FFxH)")
        r_head, _ = matmul_rate(b, h, vocab, label="lm_head")

    if "3" in sections:
        print("[3] fused-width ablation (is wider better?)", flush=True)
        _, t3 = matmul_rate(b, h, 3 * h, label="qkv fused (Hx3H)")
        _, t1 = matmul_rate(b, h, h, label="q alone (HxH)")
        print(f"    3x(HxH) = {3 * t1 * 1e6:.1f} us vs 1x(Hx3H) = "
              f"{t3 * 1e6:.1f} us "
              f"-> fusion saves {(3 * t1 - t3) * 1e6:.1f} us/layer-group",
              flush=True)
        _, tg = matmul_rate(b, h, 2 * ff, label="gateup fused")
        _, tu = matmul_rate(b, h, ff, label="up alone")
        print(f"    2x(HxFF) = {2 * tu * 1e6:.1f} us vs 1x(Hx2FF) = "
              f"{tg * 1e6:.1f} us "
              f"-> fusion saves {(2 * tu - tg) * 1e6:.1f} us/layer-group",
              flush=True)

    t_wstep = None
    if "6" in sections:
        print("[6] weights-only decode step (real program structure, no "
              "attention)", flush=True)
        t_wstep = weights_only_step(b, h, ff, nh, nkv, hd, layers, vocab)

    t_attn = None
    if "4" in sections:
        print("[4] decode-attention kernel", flush=True)
        t_attn = attention_ms(b, nh, nkv, hd, cache_len, layers, kv8=False)
        attention_ms(b, nh, nkv, hd, cache_len, layers, kv8=True)

    # roofline synthesis: weight stream at the measured big-matmul rate +
    # the measured attention kernel = the attributable floor for one step
    if r_head is not None:
        wbytes = layers * (h * nh * hd + 2 * h * nkv * hd + nh * hd * h
                           + 3 * h * ff) + h * vocab
        t_w = wbytes / (r_head * 1e9)
        attn_part = (f"; + attention {t_attn * 1e3:.2f} ms = "
                     f"{(t_w + t_attn) * 1e3:.2f} ms attributable step floor"
                     if t_attn is not None else
                     " (run --sections 4 for the attention component)")
        print(f"[5] int8 weight bytes/step: {wbytes / 2**30:.2f} GiB "
              f"-> at measured lm_head rate {r_head:.0f} GB/s = "
              f"{t_w * 1e3:.2f} ms weight floor{attn_part}", flush=True)
        if t_wstep is not None:
            print(f"    measured weights-only step [6] = "
                  f"{t_wstep * 1e3:.2f} ms vs {t_w * 1e3:.2f} ms naive-BW "
                  f"floor -> {t_wstep / t_w:.2f}x (per-kernel overhead + "
                  f"sub-peak small-matmul streaming, both present in the "
                  f"real program too)", flush=True)
    print("compare: python tools/decode_bench.py --int8 "
          f"--batch {b} (full step ms/token)")


if __name__ == "__main__":
    main()
