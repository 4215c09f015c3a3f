"""Fused serving weights (models/lm/fuse): parity vs the unfused forward.

Fusion concatenates wq/wk/wv -> wqkv and gate/up -> gateup along the OUT
axis — exact math for bf16, int8 per-out-channel quantized kernels, and
biases — so every path (empty-prefill, decode, chunk prefill, adapters)
must reproduce the unfused results to numerical tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vlrlhf_tpu.models.common import Ctx
from vlrlhf_tpu.models.lm.fuse import fuse_lm_params, fuse_vlm_params
from vlrlhf_tpu.models.lm.llama import (
    LMConfig,
    init_lm_params,
    lm_decode,
    lm_forward,
    lm_prefill_chunk,
)


def _cfg(**kw):
    kw.setdefault("vocab_size", 97)
    kw.setdefault("hidden_size", 32)
    kw.setdefault("intermediate_size", 48)
    kw.setdefault("num_layers", 2)
    kw.setdefault("num_heads", 4)
    kw.setdefault("num_kv_heads", 2)
    kw.setdefault("dtype", jnp.float32)
    kw.setdefault("remat", False)
    return LMConfig(**kw)


def _prefill_and_decode(cfg, params, ids, lens, ctx=None, n_steps=3):
    """Empty-prefill a right-padded batch, then decode n_steps greedily.
    Returns (prefill_logits, [decode_logits...])."""
    b, s = ids.shape
    pad = jnp.arange(s)[None, :] < lens[:, None]
    cache_len = s + n_steps + 1
    logits, cache = lm_forward(
        cfg, params, input_ids=ids, pad_mask=pad, ctx=ctx,
        cache_len=cache_len,
    )
    last = jnp.take_along_axis(logits, (lens - 1)[:, None, None], axis=1)
    tok = jnp.argmax(last[:, 0], -1).astype(jnp.int32)
    out = [last[:, 0]]
    pending = None
    cur_lens = lens
    for _ in range(n_steps):
        step_logits, cache, pending = lm_decode(
            cfg, params, last_token=tok, lengths=cur_lens, cache=cache,
            ctx=ctx, pending=pending,
        )
        out.append(step_logits[:, 0])
        tok = jnp.argmax(step_logits[:, 0], -1).astype(jnp.int32)
        cur_lens = cur_lens + 1
    return out


def _assert_traces_close(a, b, atol):
    for i, (x, y) in enumerate(zip(a, b)):
        np.testing.assert_allclose(
            np.asarray(x, np.float32), np.asarray(y, np.float32),
            atol=atol, rtol=0, err_msg=f"step {i}",
        )


def test_fused_decode_matches_unfused_bf16():
    cfg = _cfg()
    params = init_lm_params(cfg, jax.random.PRNGKey(0))
    fused = fuse_lm_params(params)
    assert "wqkv" in fused["layers_scanned"]["attn"]
    assert "gateup" in fused["layers_scanned"]["mlp"]
    # idempotent
    assert fuse_lm_params(fused) is fused

    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 12), 1, 90)
    lens = jnp.asarray([9, 12], jnp.int32)
    base = _prefill_and_decode(cfg, params, ids, lens)
    got = _prefill_and_decode(cfg, fused, ids, lens)
    _assert_traces_close(base, got, atol=1e-5)


def test_fused_decode_matches_unfused_int8_with_bias():
    cfg = _cfg(qkv_bias=True)
    params = init_lm_params(cfg, jax.random.PRNGKey(2))
    # give biases real values (init is zeros)
    for w in ("wq", "wk", "wv"):
        p = params["layers_scanned"]["attn"][w]
        p["bias"] = jax.random.normal(
            jax.random.PRNGKey(hash(w) % 1000), p["bias"].shape
        ).astype(p["bias"].dtype) * 0.1
    from vlrlhf_tpu.ops.quant import quantize_params

    qparams = quantize_params(params, (r"layers_scanned/(attn|mlp)/",))
    assert "kernel_q" in qparams["layers_scanned"]["attn"]["wq"]
    fused = fuse_lm_params(qparams)
    assert "kernel_q" in fused["layers_scanned"]["attn"]["wqkv"]
    assert "bias" in fused["layers_scanned"]["attn"]["wqkv"]

    ids = jax.random.randint(jax.random.PRNGKey(3), (2, 10), 1, 90)
    lens = jnp.asarray([7, 10], jnp.int32)
    base = _prefill_and_decode(cfg, qparams, ids, lens)
    got = _prefill_and_decode(cfg, fused, ids, lens)
    _assert_traces_close(base, got, atol=1e-5)


def test_fused_decode_with_lora_adapters():
    """Rollout policies carry live (unfused) adapters over fused base
    weights — deltas apply per-submatrix on top of the fused matmul."""
    from vlrlhf_tpu.lora.lora import LoraConfig, init_lora

    cfg = _cfg()
    params = init_lm_params(cfg, jax.random.PRNGKey(4))
    adapters = init_lora(
        params,
        LoraConfig(r=4, target_patterns=(
            r"layers_scanned/attn/(wq|wk|wv|wo)/",
            r"layers_scanned/mlp/(gate|up|down)/",
        )),
        jax.random.PRNGKey(5),
    )
    # b init is zeros (identity start) — randomize for a real delta
    adapters = jax.tree.map(
        lambda a: a + jax.random.normal(jax.random.PRNGKey(6), a.shape) * 0.05,
        adapters,
    )
    ctx = Ctx(adapters={"layers_scanned": adapters["layers_scanned"]})
    fused = fuse_lm_params(params)

    ids = jax.random.randint(jax.random.PRNGKey(7), (2, 11), 1, 90)
    lens = jnp.asarray([8, 11], jnp.int32)
    base = _prefill_and_decode(cfg, params, ids, lens, ctx=ctx)
    got = _prefill_and_decode(cfg, fused, ids, lens, ctx=ctx)
    _assert_traces_close(base, got, atol=1e-5)


def test_fused_prefill_chunk_parity():
    """Multi-turn extend path (lm_prefill_chunk) over fused weights."""
    cfg = _cfg()
    params = init_lm_params(cfg, jax.random.PRNGKey(8))
    fused = fuse_lm_params(params)

    ids = jax.random.randint(jax.random.PRNGKey(9), (2, 8), 1, 90)
    lens = jnp.asarray([6, 8], jnp.int32)
    pad = jnp.arange(8)[None, :] < lens[:, None]
    outs = {}
    for name, p in (("base", params), ("fused", fused)):
        _, cache = lm_forward(
            cfg, p, input_ids=ids, pad_mask=pad, cache_len=24,
        )
        chunk = jax.random.randint(jax.random.PRNGKey(10), (2, 5), 1, 90)
        clens = jnp.asarray([4, 5], jnp.int32)
        logits, _, new_lens = lm_prefill_chunk(
            cfg, p, input_ids=chunk, chunk_lens=clens, lengths=lens,
            cache=cache,
        )
        outs[name] = logits
        np.testing.assert_array_equal(np.asarray(new_lens), [10, 13])
    np.testing.assert_allclose(
        np.asarray(outs["base"], np.float32),
        np.asarray(outs["fused"], np.float32), atol=1e-5, rtol=0,
    )


def test_fused_engine_end_to_end_tokens():
    """Generator over fused VLM params emits identical greedy tokens."""
    from tests.test_dpo_step import tiny_vlm_config
    from vlrlhf_tpu.generate.engine import GenerateConfig, Generator
    from vlrlhf_tpu.models.vlm import init_vlm_params

    cfg = tiny_vlm_config()
    params = init_vlm_params(cfg, jax.random.PRNGKey(0))
    fused = fuse_vlm_params(params)

    L, lens = 16, [12, 16]
    ids = jax.random.randint(jax.random.PRNGKey(11), (2, L), 5, 90)
    batch = {
        "input_ids": ids,
        "pad_mask": jnp.arange(L)[None, :] < jnp.asarray(lens)[:, None],
        "prompt_lens": jnp.asarray(lens, jnp.int32),
        "pixel_values": None,
        "image_positions": None,
    }
    gen = Generator(cfg, GenerateConfig(max_new_tokens=5, pad_token_id=0))
    base_tokens = np.asarray(gen(params, batch))
    gen2 = Generator(cfg, GenerateConfig(max_new_tokens=5, pad_token_id=0))
    fused_tokens = np.asarray(gen2(fused, batch))
    np.testing.assert_array_equal(base_tokens, fused_tokens)


def test_fuse_rejects_mixed_quantization():
    cfg = _cfg()
    params = init_lm_params(cfg, jax.random.PRNGKey(12))
    from vlrlhf_tpu.ops.quant import quantize_params

    # quantize ONLY wq -> mixed group must be rejected, not silently wrong
    broken = quantize_params(params, (r"layers_scanned/attn/wq$",))
    with pytest.raises(AssertionError):
        fuse_lm_params(broken)
