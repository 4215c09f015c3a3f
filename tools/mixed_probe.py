"""On-chip ablation of the mixed admit+decode step's cost at the BENCH
serving shape (7B int8 W+KV, B=16 slots, Sc=1024, bp=4, C=64).

Times a 10-iteration lax.fori_loop (one jit dispatch — CLAUDE.md timing
rule) of progressively larger slices of lm_mixed_step:

  gemm      packed-token GEMMs only (qkv/o/mlp/head on T=B+bp*C tokens)
  scatter   gemm + the per-layer packed kv scatter into the big cache
  attn      scatter + full-width chunk_attention (the complete step)
  step      the real lm_mixed_step (sanity: should match `attn`)
  decode    plain lm_decode step loop for reference (the 18.5 ms baseline)

Run: python tools/mixed_probe.py
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from vlrlhf_tpu.models.lm.llama import lm_decode, lm_mixed_step
from vlrlhf_tpu.models.registry import FAMILIES
from vlrlhf_tpu.models.vlm import init_vlm_params
from vlrlhf_tpu.ops.quant import quantize_params

B, BP, C, SC, ITERS = 16, 4, 64, 1024, 10


def main():
    cfg = FAMILIES["llava"].make_config()
    lm = cfg.lm
    params = jax.jit(
        lambda k: quantize_params(init_vlm_params(cfg, k))
    )(jax.random.PRNGKey(0))["lm"]
    nkv, hd, h = lm.num_kv_heads, lm.head_dim_, lm.hidden_size
    kv_shape = (lm.num_layers, B, nkv, SC, hd)
    cache = {
        "k": jnp.zeros(kv_shape, jnp.int8),
        "v": jnp.zeros(kv_shape, jnp.int8),
        "k_scale": jnp.zeros(kv_shape[:4], jnp.bfloat16),
        "v_scale": jnp.zeros(kv_shape[:4], jnp.bfloat16),
    }
    rng = np.random.default_rng(0)
    tok = jnp.asarray(rng.integers(5, 30000, (B,)), jnp.int32)
    lengths = jnp.asarray(rng.integers(300, 700, (B,)), jnp.int32)
    slots = jnp.asarray([1, 5, 9, 13], jnp.int32)
    clens = jnp.full((BP,), C, jnp.int32)
    embeds = jnp.asarray(
        rng.standard_normal((BP, C, h)), jnp.bfloat16
    )
    active = jnp.ones((B,), bool).at[slots].set(False)

    def timeit(name, fn, *args):
        f = jax.jit(fn)
        out = f(*args)
        _ = float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
        t0 = time.perf_counter()
        out = f(*args)
        _ = float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
        dt = (time.perf_counter() - t0) / ITERS * 1e3
        print(f"{name:10s} {dt:8.2f} ms/iter")
        return dt

    # ---- full step in a loop (cache carried, donated semantics) ----
    def step_loop(cache, tok, lengths, embeds):
        def body(t, carry):
            cache, tok, lengths = carry
            d, a, cache = lm_mixed_step(
                lm, params,
                decode_tokens=tok, decode_active=active, lengths=lengths,
                admit_embeds=embeds, admit_slots=slots, admit_clens=clens,
                cache=cache,
            )
            tok = jnp.argmax(d, axis=-1).astype(jnp.int32)
            lengths = jnp.where(active, lengths + 1, lengths)
            lengths = lengths.at[slots].add(C)
            return (cache, tok, lengths)

        return jax.lax.fori_loop(
            0, ITERS, body, (cache, tok, lengths % 128, embeds)[:3]
        )

    # ---- decode-only reference loop ----
    def dec_loop(cache, tok, lengths):
        def body(t, carry):
            cache, tok, lengths, pending = carry
            logits, cache, pending = lm_decode(
                lm, params, last_token=tok, lengths=lengths, cache=cache,
                pending=pending,
            )
            tok = jnp.argmax(logits[:, 0], axis=-1).astype(jnp.int32)
            return (cache, tok, lengths + 1, pending)

        pending = {
            "k": jnp.zeros((lm.num_layers, B, nkv, hd), lm.dtype),
            "v": jnp.zeros((lm.num_layers, B, nkv, hd), lm.dtype),
            "pos": jnp.full((B,), SC, jnp.int32),
        }
        return jax.lax.fori_loop(0, ITERS, body, (cache, tok, lengths, pending))

    # ---- ablations: GEMM-only / +scatter / +attention ----
    from vlrlhf_tpu.models.common import linear
    from vlrlhf_tpu.ops.chunk_attention import chunk_attention
    from vlrlhf_tpu.ops.norms import rms_norm
    from vlrlhf_tpu.ops.quant import quantize_kv

    T = B + BP * C
    rows_vec = jnp.concatenate(
        [jnp.arange(B, dtype=jnp.int32), jnp.repeat(slots, C)]
    )

    def make_abl(do_scatter, do_attn):
        def loop(cache, tok, lengths, embeds):
            def body(t, carry):
                cache, tok, lengths = carry
                ck, cv = cache["k"], cache["v"]
                ks, vs = cache["k_scale"], cache["v_scale"]
                xd = jnp.take(
                    params["embed_tokens"]["embedding"], tok, axis=0
                ).astype(lm.dtype)[:, None]
                x = jnp.concatenate(
                    [xd, embeds.reshape(BP * C, 1, h)]
                )
                adm_pos = lengths[slots][:, None] + jnp.arange(C)[None, :]
                positions = jnp.concatenate(
                    [lengths, adm_pos.reshape(-1)]
                )
                pi = jnp.where(
                    jnp.arange(T) >= 0, positions, positions
                )[:, None]
                ri = rows_vec[:, None]
                hi = jnp.arange(nkv)[None, :]
                for i in range(lm.num_layers):
                    lp = jax.tree.map(
                        lambda a: a[i], params["layers_scanned"]
                    )
                    hh = rms_norm(
                        x, lp["input_layernorm"]["weight"], lm.rms_eps
                    )
                    q = linear(lp["attn"]["wq"], hh)
                    k = linear(lp["attn"]["wk"], hh)
                    v = linear(lp["attn"]["wv"], hh)
                    q = q.reshape(T, 1, lm.num_heads, hd)
                    k = k.reshape(T, nkv, hd)
                    v = v.reshape(T, nkv, hd)
                    if do_scatter:
                        kq, ksc = quantize_kv(k)
                        vq, vsc = quantize_kv(v)
                        ck = ck.at[i, ri, hi, pi].set(kq, mode="drop")
                        cv = cv.at[i, ri, hi, pi].set(vq, mode="drop")
                        ks = ks.at[i, ri, hi, pi].set(ksc, mode="drop")
                        vs = vs.at[i, ri, hi, pi].set(vsc, mode="drop")
                    if do_attn:
                        q_full = jnp.zeros(
                            (B, C, lm.num_heads, hd), q.dtype
                        )
                        q_full = q_full.at[:, 0].set(q[:B, 0])
                        q_full = q_full.at[slots].set(
                            q[B:, 0].reshape(BP, C, lm.num_heads, hd)
                        )
                        o = chunk_attention(
                            q_full, ck, cv, lengths, layer=i,
                            k_scale=ks, v_scale=vs,
                        )
                        o = jnp.concatenate(
                            [o[:, 0][:, None],
                             o[slots].reshape(BP * C, lm.num_heads, hd)[
                                 :, None]]
                        ).reshape(T, 1, lm.num_heads * hd)
                    else:
                        o = (q.reshape(T, 1, lm.num_heads * hd)
                             * jnp.float32(0.01).astype(q.dtype))
                    x = x + linear(lp["attn"]["wo"], o)
                    hh = rms_norm(
                        x, lp["post_attention_layernorm"]["weight"],
                        lm.rms_eps,
                    )
                    gate = linear(lp["mlp"]["gate"], hh)
                    up = linear(lp["mlp"]["up"], hh)
                    x = x + linear(
                        lp["mlp"]["down"], jax.nn.silu(gate) * up
                    )
                hidden = rms_norm(x, params["norm"]["weight"], lm.rms_eps)
                logits = linear(params["lm_head"], hidden[:B])
                tok = jnp.argmax(logits[:, 0], axis=-1).astype(jnp.int32)
                cache = {"k": ck, "v": cv, "k_scale": ks, "v_scale": vs}
                lengths = jnp.where(active, lengths + 1, lengths)
                lengths = lengths.at[slots].add(C)
                return (cache, tok, lengths)

            return jax.lax.fori_loop(0, ITERS, body, (cache, tok, lengths))

        return loop

    l0 = lengths % 128
    timeit("decode", dec_loop, cache, tok, l0)
    timeit("gemm", make_abl(False, False), cache, tok, l0, embeds)
    timeit("scatter", make_abl(True, False), cache, tok, l0, embeds)
    timeit("attn", make_abl(True, True), cache, tok, l0, embeds)
    timeit("step", step_loop, cache, tok, l0, embeds)


if __name__ == "__main__":
    main()
