"""int4 group-wise weights-only serving (ops/int4.py).

The Pallas dequant-matmul runs in interpret mode on CPU; force_xla is the
dense dequantize oracle.
"""

import jax
import jax.numpy as jnp
import numpy as np

from vlrlhf_tpu.ops.int4 import (
    GROUP,
    dequantize_kernel_int4,
    int4_matmul,
    quantize_kernel_int4,
    quantize_linear_int4,
    unpack_int4,
)


def test_pack_unpack_roundtrip():
    k = jax.random.normal(jax.random.PRNGKey(0), (256, 96))
    packed, scale = quantize_kernel_int4(k)
    assert packed.shape == (128, 96) and packed.dtype == jnp.int8
    assert scale.shape == (256 // GROUP, 96) and scale.dtype == jnp.bfloat16
    codes = unpack_int4(packed)
    assert codes.shape == (256, 96)
    assert int(jnp.min(codes)) >= -8 and int(jnp.max(codes)) <= 7
    # quantization error bounded by half a step plus the bf16-scale
    # rounding term (|q| <= 8 codes x 2^-9 relative scale error)
    deq = dequantize_kernel_int4(packed, scale, jnp.float32)
    step = np.repeat(np.asarray(scale, np.float32), GROUP, axis=0)
    err = np.abs(np.asarray(k) - np.asarray(deq))
    assert (err <= step * (0.5 + 8 * 2**-9) + 1e-6).all(), float(err.max())


def test_int4_matmul_kernel_matches_oracle():
    kx, kw = jax.random.split(jax.random.PRNGKey(1))
    for t, d_in, d_out in [(4, 128, 128), (8, 256, 200), (300, 384, 512)]:
        x = (jax.random.normal(kx, (t, d_in)) * 0.5).astype(jnp.bfloat16)
        k = jax.random.normal(kw, (d_in, d_out)) * 0.05
        packed, scale = quantize_kernel_int4(k)
        got = int4_matmul(x, packed, scale)
        want = int4_matmul(x, packed, scale, force_xla=True)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            atol=0.05, rtol=0.02,
            err_msg=f"shape ({t},{d_in},{d_out})",
        )


def test_linear_dispatch_int4_with_bias_and_lora():
    from vlrlhf_tpu.models.common import Ctx, linear

    k = jax.random.normal(jax.random.PRNGKey(2), (128, 64)) * 0.1
    bias = jax.random.normal(jax.random.PRNGKey(3), (64,)) * 0.1
    p4 = quantize_linear_int4({"kernel": k, "bias": bias})
    assert "bias" in p4
    x = (jax.random.normal(jax.random.PRNGKey(4), (2, 5, 128)) * 0.5).astype(
        jnp.bfloat16
    )
    adapters = {
        "a": jax.random.normal(jax.random.PRNGKey(5), (128, 4)) * 0.1,
        "b": jax.random.normal(jax.random.PRNGKey(6), (4, 64)) * 0.1,
    }
    ctx = Ctx(adapters=adapters, lora_scale=0.5)
    got = linear(p4, x, ctx)
    deq = dequantize_kernel_int4(p4["kernel_q4"], p4["kernel_scale"])
    want = linear({"kernel": deq, "bias": bias}, x, ctx)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=0.05, rtol=0.02,
    )


def test_quantize_params_bits4_and_fallback():
    from vlrlhf_tpu.models.lm.llama import LMConfig, init_lm_params
    from vlrlhf_tpu.ops.quant import quantize_params

    cfg = LMConfig(
        vocab_size=256, hidden_size=128, intermediate_size=256,
        num_layers=2, num_heads=4, num_kv_heads=4, dtype=jnp.float32,
        remat=False,
    )
    params = {"lm": init_lm_params(cfg, jax.random.PRNGKey(7))}
    q4 = quantize_params(params, bits=4)
    attn = q4["lm"]["layers_scanned"]["attn"]
    assert "kernel_q4" in attn["wq"], attn["wq"].keys()
    # (L, half_p, out): in=128 -> half 64, padded to the 128-row Mosaic
    # lane-alignment block; scale gains the odd-n_lo zero guard row
    assert attn["wq"]["kernel_q4"].shape == (2, 128, 128)
    assert attn["wq"]["kernel_scale"].shape == (2, 3, 128)
    assert "kernel_q4" in q4["lm"]["lm_head"]

    # in-dim not 128-divisible -> silent int8 fallback, not a failure
    tiny = {"lm": {"layers_scanned": {"attn": {"wq": {
        "kernel": jax.random.normal(jax.random.PRNGKey(8), (2, 32, 32))
    }}}}}
    q8 = quantize_params(tiny, bits=4)
    assert "kernel_q" in q8["lm"]["layers_scanned"]["attn"]["wq"]


def test_int4_lm_forward_and_decode_close_to_dense_twin():
    from tests.test_fuse import _prefill_and_decode
    from vlrlhf_tpu.models.lm.llama import LMConfig, init_lm_params
    from vlrlhf_tpu.ops.quant import dequantize_params, quantize_params

    cfg = LMConfig(
        vocab_size=256, hidden_size=128, intermediate_size=256,
        num_layers=2, num_heads=4, num_kv_heads=2, dtype=jnp.float32,
        remat=False,
    )
    base = init_lm_params(cfg, jax.random.PRNGKey(9))
    q4 = quantize_params({"lm": base}, bits=4)["lm"]
    dense_twin = dequantize_params(q4, jnp.float32)

    ids = jax.random.randint(jax.random.PRNGKey(10), (2, 12), 1, 250)
    lens = jnp.asarray([9, 12], jnp.int32)
    got = _prefill_and_decode(cfg, q4, ids, lens)
    # twin forward runs the SAME dequantized weights densely; the int4
    # kernel casts activations to bf16, so tolerance is bf16-level
    want = _prefill_and_decode(cfg, dense_twin, ids, lens)
    for i, (g, w) in enumerate(zip(got, want)):
        np.testing.assert_allclose(
            np.asarray(g, np.float32), np.asarray(w, np.float32),
            atol=0.08, rtol=0.05, err_msg=f"step {i}",
        )


def test_int4_custom_vjp_dx_matches_dense():
    """Activation gradients through the int4 kernel (QLoRA training) match
    the dense dequantized oracle; the packed kernel/scales get none."""
    k = jax.random.normal(jax.random.PRNGKey(13), (128, 192)) * 0.1
    p4 = quantize_linear_int4({"kernel": k})
    x = (jax.random.normal(jax.random.PRNGKey(14), (6, 128)) * 0.5).astype(
        jnp.float32
    )
    cot = jax.random.normal(jax.random.PRNGKey(15), (6, 192))

    from vlrlhf_tpu.ops.int4 import int4_apply

    def f(x):
        return jnp.sum(int4_apply(p4, x) * cot)

    dx = jax.grad(f)(x)
    deq = dequantize_kernel_int4(p4["kernel_q4"], p4["kernel_scale"])

    def f_dense(x):
        return jnp.sum((x.astype(jnp.bfloat16) @ deq).astype(x.dtype) * cot)

    dx_dense = jax.grad(f_dense)(x)
    np.testing.assert_allclose(
        np.asarray(dx, np.float32), np.asarray(dx_dense, np.float32),
        atol=0.05, rtol=0.05,
    )


def test_int4_qlora_dpo_step():
    """Frozen int4 base + LoRA adapters trains end-to-end; step-0 DPO loss
    is log(2) (policy == ref on the SAME quantized base) and decreases."""
    from tests.test_dpo_step import IMG_TOKEN, N_IMG_TOKENS, tiny_batch
    from vlrlhf_tpu.lora.lora import LoraConfig, init_lora
    from vlrlhf_tpu.models.lm.llama import LMConfig
    from vlrlhf_tpu.models.vision.vit import ViTConfig
    from vlrlhf_tpu.models.vlm import (
        ProjectorConfig,
        VLMConfig,
        init_vlm_params,
    )
    from vlrlhf_tpu.ops.quant import TRAIN_QUANT_PATTERNS, quantize_params
    from vlrlhf_tpu.train.dpo import DPOConfig, make_dpo_step
    from vlrlhf_tpu.train.train_state import (
        OptimizerConfig,
        init_train_state,
        make_optimizer,
    )

    # int4 needs 128-divisible in dims — a slightly larger tiny model
    cfg = VLMConfig(
        lm=LMConfig(
            vocab_size=128, hidden_size=128, intermediate_size=256,
            num_layers=2, num_heads=4, num_kv_heads=4,
            dtype=jnp.float32, remat=False,
        ),
        vision=ViTConfig(
            image_size=16, patch_size=4, hidden_size=16, num_layers=2,
            num_heads=2, mlp_dim=32, feature_layer=-2,
            drop_class_token=True, dtype=jnp.float32, remat=False,
        ),
        projector=ProjectorConfig(kind="mlp2x_gelu", in_dim=16, out_dim=128),
        image_token_id=IMG_TOKEN,
        num_image_tokens=N_IMG_TOKENS,
    )
    params = init_vlm_params(cfg, jax.random.PRNGKey(16))
    q4 = quantize_params(params, TRAIN_QUANT_PATTERNS, bits=4)
    assert "kernel_q4" in q4["lm"]["layers_scanned"]["attn"]["wq"]
    lcfg = LoraConfig(
        r=4, alpha=8.0, target_patterns=(r"lm/.*attn/", r"lm/.*mlp/")
    )
    adapters = init_lora(q4, lcfg, jax.random.PRNGKey(17))
    tx = make_optimizer(
        OptimizerConfig(learning_rate=5e-3, warmup_steps=1, total_steps=50),
        adapters,
    )
    state = init_train_state(adapters, tx)
    step = make_dpo_step(cfg, DPOConfig(lora_scale=lcfg.scale), tx)
    batch = tiny_batch(jax.random.PRNGKey(18))
    state, m = step(state, q4, batch)
    np.testing.assert_allclose(float(m["loss"]), np.log(2.0), atol=1e-4)
    losses = [float(m["loss"])]
    for _ in range(6):
        state, m = step(state, q4, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] - 1e-3, losses


def _vlm128():
    from tests.test_dpo_step import IMG_TOKEN, N_IMG_TOKENS
    from vlrlhf_tpu.models.lm.llama import LMConfig
    from vlrlhf_tpu.models.vision.vit import ViTConfig
    from vlrlhf_tpu.models.vlm import ProjectorConfig, VLMConfig

    return VLMConfig(
        lm=LMConfig(
            vocab_size=128, hidden_size=128, intermediate_size=256,
            num_layers=2, num_heads=4, num_kv_heads=4,
            dtype=jnp.float32, remat=False,
        ),
        vision=ViTConfig(
            image_size=16, patch_size=4, hidden_size=16, num_layers=2,
            num_heads=2, mlp_dim=32, feature_layer=-2,
            drop_class_token=True, dtype=jnp.float32, remat=False,
        ),
        projector=ProjectorConfig(kind="mlp2x_gelu", in_dim=16, out_dim=128),
        image_token_id=IMG_TOKEN,
        num_image_tokens=N_IMG_TOKENS,
    )


def test_int4_engine_generate_fused_kv8_e2e():
    """Serving stack end to end over int4 weights: Generator greedy decode
    (empty-prefill + device while_loop), int8 KV cache, fused wqkv/gateup —
    tokens must match the same int4 model served unfused/bf16-cache."""
    from vlrlhf_tpu.generate.engine import GenerateConfig, Generator
    from vlrlhf_tpu.models.lm.fuse import fuse_vlm_params
    from vlrlhf_tpu.models.vlm import init_vlm_params
    from vlrlhf_tpu.ops.quant import quantize_params

    cfg = _vlm128()
    params = init_vlm_params(cfg, jax.random.PRNGKey(20))
    q4 = quantize_params(params, bits=4)
    assert "kernel_q4" in q4["lm"]["layers_scanned"]["attn"]["wq"]

    L, lens = 16, [12, 16]
    ids = jax.random.randint(jax.random.PRNGKey(21), (2, L), 5, 90)
    batch = {
        "input_ids": ids,
        "pad_mask": jnp.arange(L)[None, :] < jnp.asarray(lens)[:, None],
        "prompt_lens": jnp.asarray(lens, jnp.int32),
        "pixel_values": None,
        "image_positions": None,
    }
    base_tokens = np.asarray(
        Generator(cfg, GenerateConfig(max_new_tokens=5, pad_token_id=0))(
            q4, batch
        )
    )
    fused = fuse_vlm_params(q4)
    kv8_tokens = np.asarray(
        Generator(
            cfg,
            GenerateConfig(
                max_new_tokens=5, pad_token_id=0, kv_cache_dtype="int8"
            ),
        )(fused, batch)
    )
    # int8 KV adds cache quantization noise on top of int4 weights — allow
    # divergence only after the traces first differ (greedy determinism),
    # and require the FIRST token to agree.
    np.testing.assert_array_equal(base_tokens[:, 0], kv8_tokens[:, 0])
    fused_tokens = np.asarray(
        Generator(cfg, GenerateConfig(max_new_tokens=5, pad_token_id=0))(
            fused, batch
        )
    )
    np.testing.assert_array_equal(base_tokens, fused_tokens)


def test_int4_multi_device_mesh_dense_fallback():
    """Under a multi-device global mesh int4_apply must take the dense
    (partitionable) path and still match the kernel path numerically."""
    from vlrlhf_tpu.core import mesh as mesh_mod
    from vlrlhf_tpu.core.mesh import MeshConfig, make_mesh
    from vlrlhf_tpu.models.lm.llama import LMConfig, init_lm_params
    from vlrlhf_tpu.ops.quant import quantize_params

    cfg = LMConfig(
        vocab_size=256, hidden_size=128, intermediate_size=256,
        num_layers=2, num_heads=4, num_kv_heads=2, dtype=jnp.float32,
        remat=False,
    )
    params = init_lm_params(cfg, jax.random.PRNGKey(30))
    q4 = quantize_params({"lm": params}, bits=4)["lm"]
    ids = jax.random.randint(jax.random.PRNGKey(31), (2, 10), 1, 250)
    lens = jnp.asarray([8, 10], jnp.int32)
    from tests.test_fuse import _prefill_and_decode

    base = _prefill_and_decode(cfg, q4, ids, lens)
    prev = mesh_mod._GLOBAL_MESH
    make_mesh(MeshConfig(data=1, fsdp=2, model=4))
    try:
        meshed = _prefill_and_decode(cfg, q4, ids, lens)
    finally:
        mesh_mod._GLOBAL_MESH = prev
    for i, (g, w) in enumerate(zip(base, meshed)):
        np.testing.assert_allclose(
            np.asarray(g, np.float32), np.asarray(w, np.float32),
            atol=0.05, rtol=0.05, err_msg=f"step {i}",
        )


def test_fused_int4_parity():
    from tests.test_fuse import _prefill_and_decode
    from vlrlhf_tpu.models.lm.fuse import fuse_lm_params
    from vlrlhf_tpu.models.lm.llama import LMConfig, init_lm_params
    from vlrlhf_tpu.ops.quant import quantize_params

    cfg = LMConfig(
        vocab_size=256, hidden_size=128, intermediate_size=256,
        num_layers=2, num_heads=4, num_kv_heads=2, dtype=jnp.float32,
        remat=False,
    )
    base = init_lm_params(cfg, jax.random.PRNGKey(11))
    q4 = quantize_params({"lm": base}, bits=4)["lm"]
    fused = fuse_lm_params(q4)
    assert "kernel_q4" in fused["layers_scanned"]["attn"]["wqkv"]

    ids = jax.random.randint(jax.random.PRNGKey(12), (2, 10), 1, 250)
    lens = jnp.asarray([8, 10], jnp.int32)
    a = _prefill_and_decode(cfg, q4, ids, lens)
    b = _prefill_and_decode(cfg, fused, ids, lens)
    for i, (g, w) in enumerate(zip(a, b)):
        np.testing.assert_allclose(
            np.asarray(g, np.float32), np.asarray(w, np.float32),
            atol=1e-4, rtol=0, err_msg=f"step {i}",
        )


def test_scale_blocks_layout():
    """_scale_blocks re-layouts the canonical (S, out) scales into the two
    (n_blocks, 2, out) arrays the kernels index on the LEADING dim (the
    only dynamic-offset pattern Mosaic proves aligned on real TPU — the
    r3 hardware sweep rejected 2D dynamic row loads with 'index in
    dimension 0 is a multiple of 8')."""
    from vlrlhf_tpu.ops.int4 import _BLK, _scale_blocks

    for din in (256, 2048, 5504):  # 5504 -> odd n_lo (43): guard-row case
        dout = 64
        k = jax.random.normal(jax.random.PRNGKey(1), (din, dout))
        packed, scale = quantize_kernel_int4(k)
        n_lo = din // _BLK
        n_blocks = packed.shape[0] // _BLK
        s_lo, s_hi = _scale_blocks(scale, n_lo, n_blocks)
        assert s_lo.shape == (n_blocks, 2, dout) == s_hi.shape
        flat_lo = np.asarray(s_lo, np.float32).reshape(-1, dout)
        flat_hi = np.asarray(s_hi, np.float32).reshape(-1, dout)
        sc = np.asarray(scale, np.float32)
        assert (flat_lo[:n_lo] == sc[:n_lo]).all()
        assert (flat_hi[:n_lo] == sc[n_lo : 2 * n_lo]).all()
        # padded pair rows (odd n_lo) must be zero: they multiply the
        # kernel's zero-padded weight rows
        assert (flat_lo[n_lo:] == 0).all() and (flat_hi[n_lo:] == 0).all()
