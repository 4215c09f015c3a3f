"""GPTQ checkpoint ingestion (utils/gptq.py) into the native int4 layout.

Reference surface: `q_lora` over AutoGPTQ bases,
/root/reference/src/vlrlhf/utils/auto_load.py:527-531. No real GPTQ
checkpoints exist offline, so pack_gptq_reference builds synthetic
AutoGPTQ-layout tensors and dequantize_gptq_reference is the textbook
oracle the converter must reproduce."""

import zlib

import numpy as np
import pytest

from vlrlhf_tpu.ops.int4 import (
    GROUP,
    dequantize_kernel_int4,
    int4_apply,
)
from vlrlhf_tpu.utils.gptq import (
    convert_gptq_linear,
    dequantize_gptq_reference,
    pack_gptq_reference,
)

pytestmark = pytest.mark.core

DIN, DOUT, GSZ = 256, 384, 128


def _synth(seed, sym=False, pow2_scales=False, gsz=GSZ, din=DIN, dout=DOUT):
    rng = np.random.default_rng(seed)
    q = rng.integers(0, 16, (din, dout)).astype(np.int32)
    ng = din // gsz
    if sym:
        z = np.full((ng, dout), 8, np.int32)
    else:
        z = rng.integers(1, 17, (ng, dout)).astype(np.int32)
    if pow2_scales:
        s = 2.0 ** rng.integers(-8, -2, (ng, dout)).astype(np.float32)
    else:
        s = (rng.random((ng, dout), np.float32) * 0.02 + 0.001)
    return q, z, s


def _dense_from_converted(p):
    """Reconstruct W from our representation incl. the gbias term."""
    w = np.asarray(
        dequantize_kernel_int4(p["kernel_q4"], p["kernel_scale"]),
        np.float32,
    )
    if "kernel_gbias" in p:
        w = w + np.repeat(np.asarray(p["kernel_gbias"], np.float32),
                          GROUP, axis=0)
    return w


def test_roundtrip_packing_oracle():
    """pack_gptq_reference / dequantize_gptq_reference are inverses of the
    plain formula (the synthetic generator itself must be trustworthy)."""
    q, z, s = _synth(0)
    qw, qz, sc, gi = pack_gptq_reference(q, z, s, GSZ)
    w = dequantize_gptq_reference(qw, qz, sc)
    gi_rows = np.arange(DIN) // GSZ
    want = s[gi_rows] * (q - z[gi_rows])
    np.testing.assert_allclose(w, want, rtol=1e-3, atol=1e-6)


def test_convert_asymmetric_matches_oracle():
    """Codes preserved exactly; the only error is f16->bf16 scale rounding
    (<=2^-8 relative on s, carried into W and the gbias term) — so the
    bound is ABSOLUTE in units of the per-group scale, not relative (W
    entries near zero have unbounded rel err from a fixed scale wiggle)."""
    q, z, s = _synth(1)
    qw, qz, sc, gi = pack_gptq_reference(q, z, s, GSZ)
    p = convert_gptq_linear(qw, qz, sc, gi)
    assert "kernel_gbias" in p
    got = _dense_from_converted(p)
    want = dequantize_gptq_reference(qw, qz, sc)
    gi_rows = np.arange(DIN) // GSZ
    bound = s[gi_rows] * (2.0 ** -7) * 24  # |q-z|<=15 + gbias rounding
    assert np.all(np.abs(got - want) <= bound + 1e-7)


def test_convert_pow2_scales_bitexact():
    """Power-of-two scales are exact in f16 AND bf16: the converted dense
    kernel must equal the GPTQ oracle BIT-EXACTLY (sym and asym)."""
    for sym in (True, False):
        q, z, s = _synth(2 + sym, sym=sym, pow2_scales=True)
        qw, qz, sc, gi = pack_gptq_reference(q, z, s, GSZ)
        p = convert_gptq_linear(qw, qz, sc, gi)
        got = _dense_from_converted(p)
        want = dequantize_gptq_reference(qw, qz, sc)
        np.testing.assert_array_equal(got, want)
        assert ("kernel_gbias" in p) == (not sym)


def test_int4_apply_gbias_kernel_vs_dense():
    """The Pallas path + gbias matmul == dense reconstructed W (both
    engine modes of int4_apply agree with the converted checkpoint)."""
    import jax

    q, z, s = _synth(4, pow2_scales=True)
    qw, qz, sc, gi = pack_gptq_reference(q, z, s, GSZ)
    p = {k: jax.numpy.asarray(v) for k, v in
         convert_gptq_linear(qw, qz, sc, gi).items()}
    x = jax.numpy.asarray(
        np.random.default_rng(5).standard_normal((8, DIN)), jax.numpy.bfloat16
    )
    y_kernel = np.asarray(int4_apply(p, x), np.float32)
    w = _dense_from_converted(p)
    y_ref = np.asarray(x, np.float32) @ w
    # bf16-operand matmuls (f32 acc) vs the f32 reference: error grows
    # with the contraction depth — bound absolutely at ~sqrt(din)*eps_bf16
    # * typical |x|*|w| rather than pretending a tight rtol holds at W~0
    np.testing.assert_allclose(y_kernel, y_ref, rtol=3e-2, atol=8e-2)
    y_dense = np.asarray(int4_apply(p, x, force_xla=True), np.float32)
    np.testing.assert_allclose(y_dense, y_ref, rtol=3e-2, atol=8e-2)
    # apples-to-apples: the two engine paths agree tightly with each other
    np.testing.assert_allclose(y_kernel, y_dense, rtol=2e-2, atol=2e-2)


def test_int4_apply_gbias_grad_flows():
    """QLoRA over an ingested GPTQ base: d/dx through int4_apply + gbias
    is finite and matches the dense path."""
    import jax
    import jax.numpy as jnp

    q, z, s = _synth(6, pow2_scales=True)
    qw, qz, sc, gi = pack_gptq_reference(q, z, s, GSZ)
    p = {k: jnp.asarray(v) for k, v in
         convert_gptq_linear(qw, qz, sc, gi).items()}
    x = jnp.asarray(
        np.random.default_rng(7).standard_normal((4, DIN)), jnp.bfloat16
    )
    g_kernel = jax.grad(lambda xx: jnp.sum(int4_apply(p, xx)))(x)
    g_dense = jax.grad(
        lambda xx: jnp.sum(int4_apply(p, xx, force_xla=True))
    )(x)
    assert bool(jnp.all(jnp.isfinite(g_kernel)))
    np.testing.assert_allclose(
        np.asarray(g_kernel, np.float32), np.asarray(g_dense, np.float32),
        rtol=5e-2, atol=5e-2,
    )


def test_convert_rejects_act_order_and_bad_groups():
    q, z, s = _synth(8)
    qw, qz, sc, gi = pack_gptq_reference(q, z, s, GSZ)
    perm = np.random.default_rng(9).permutation(DIN).astype(np.int32)
    with pytest.raises(ValueError, match="activation-ordered"):
        convert_gptq_linear(qw, qz, sc, (perm // GSZ))
    q32, z32, s32 = _synth(10, gsz=32)
    qw, qz, sc, gi = pack_gptq_reference(q32, z32, s32, 32)
    with pytest.raises(ValueError, match="group_size"):
        convert_gptq_linear(qw, qz, sc, gi)


def test_linear_dispatch_with_gbias():
    """models/common.linear routes kernel_q4 params through int4_apply —
    a converted GPTQ linear drops into any model forward unchanged."""
    import jax.numpy as jnp

    from vlrlhf_tpu.models.common import linear

    q, z, s = _synth(11, pow2_scales=True)
    qw, qz, sc, gi = pack_gptq_reference(q, z, s, GSZ)
    p = {k: jnp.asarray(v) for k, v in
         convert_gptq_linear(qw, qz, sc, gi).items()}
    x = jnp.asarray(
        np.random.default_rng(12).standard_normal((2, 3, DIN)), jnp.bfloat16
    )
    y = linear(p, x)
    assert y.shape == (2, 3, DOUT)
    w = _dense_from_converted(p)
    np.testing.assert_allclose(
        np.asarray(y, np.float32).reshape(-1, DOUT),
        np.asarray(x, np.float32).reshape(-1, DIN) @ w,
        rtol=3e-2, atol=3e-2,
    )


def test_port_llama_lm_gptq_state_dict():
    """End-to-end: a synthetic GPTQ-format llama state dict (qweight/
    qzeros/scales/g_idx per LM linear, fp elsewhere — the HF-GPTQ
    checkpoint shape) ports through the standard porter (_linear detects
    .qweight) and the forward matches the dense twin built from the
    dequantized weights."""
    import jax
    import jax.numpy as jnp

    from vlrlhf_tpu.models.lm.llama import LMConfig, lm_forward
    from vlrlhf_tpu.utils.hf_port import port_llama_lm

    rng = np.random.default_rng(20)
    H, FF, NL, V, GSZ_ = 128, 256, 2, 64, 64
    cfg = LMConfig(
        vocab_size=V, hidden_size=H, intermediate_size=FF, num_layers=NL,
        num_heads=2, num_kv_heads=2, rms_eps=1e-5, dtype=jnp.float32,
        remat=False,
    )

    sd, dense = {}, {}
    sd["model.embed_tokens.weight"] = rng.standard_normal(
        (V, H)).astype(np.float32) * 0.05
    sd["model.norm.weight"] = np.ones((H,), np.float32)

    def gptq_linear(prefix, din, dout):
        # zlib.crc32, NOT hash(): str hashing is salted per process, and a
        # salt-dependent dataset made this test flake at the 5e-2 tolerance
        # (1/2048 logits at 0.075, seen r5 — passed and failed on the same
        # commit under different salts)
        q, z, s = _synth(zlib.crc32(prefix.encode()) % 1000,
                         pow2_scales=True, gsz=GSZ_, din=din, dout=dout)
        qw, qz, sc, gi = pack_gptq_reference(q, z, s, GSZ_)
        sd[f"{prefix}.qweight"] = qw
        sd[f"{prefix}.qzeros"] = qz
        sd[f"{prefix}.scales"] = sc
        sd[f"{prefix}.g_idx"] = gi
        dense[prefix] = dequantize_gptq_reference(qw, qz, sc)

    for i in range(NL):
        p = f"model.layers.{i}"
        sd[f"{p}.input_layernorm.weight"] = np.ones((H,), np.float32)
        sd[f"{p}.post_attention_layernorm.weight"] = np.ones(
            (H,), np.float32)
        for name, (di, do) in {
            "self_attn.q_proj": (H, H), "self_attn.k_proj": (H, H),
            "self_attn.v_proj": (H, H), "self_attn.o_proj": (H, H),
            "mlp.gate_proj": (H, FF), "mlp.up_proj": (H, FF),
            "mlp.down_proj": (FF, H),
        }.items():
            gptq_linear(f"{p}.{name}", di, do)

    params = port_llama_lm(sd, NL, prefix="model")
    head = rng.standard_normal((H, V)).astype(np.float32) * 0.05
    params["lm_head"] = {"kernel": jnp.asarray(head)}
    # every LM linear carries the packed representation (+ gbias: asym)
    lw = params["layers_scanned"]["attn"]["wq"]
    assert set(lw) >= {"kernel_q4", "kernel_scale", "kernel_gbias"}

    dense_params = jax.tree.map(lambda x: x, params)
    for blk, names in (("attn", ("wq", "wk", "wv", "wo")),
                       ("mlp", ("gate", "up", "down"))):
        hf = {"wq": "self_attn.q_proj", "wk": "self_attn.k_proj",
              "wv": "self_attn.v_proj", "wo": "self_attn.o_proj",
              "gate": "mlp.gate_proj", "up": "mlp.up_proj",
              "down": "mlp.down_proj"}
        for n in names:
            stack = np.stack([
                dense[f"model.layers.{i}.{hf[n]}"] for i in range(NL)
            ])
            dense_params["layers_scanned"][blk][n] = {
                "kernel": jnp.asarray(stack)
            }

    ids = jnp.asarray(rng.integers(0, V, (2, 16)), jnp.int32)
    got, _ = lm_forward(cfg, params, input_ids=ids)
    want, _ = lm_forward(cfg, dense_params, input_ids=ids)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=5e-2, atol=5e-2
    )
