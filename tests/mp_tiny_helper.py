"""Shared tiny-model builders for the REAL 2-process training-input tests
(tests/test_multiprocess_training.py): both the pytest parent (single-process
ground truth) and the spawned jax.distributed workers import this module, so
the math under comparison is literally the same code."""

import jax
import jax.numpy as jnp
import numpy as np

IMG_TOKEN = 100
N_IMG = 16  # (image_size/patch_size)^2 = 4*4 patches per image


def tiny_cfg():
    from vlrlhf_tpu.models.lm.llama import LMConfig
    from vlrlhf_tpu.models.vision.vit import ViTConfig
    from vlrlhf_tpu.models.vlm import ProjectorConfig, VLMConfig

    return VLMConfig(
        lm=LMConfig(
            vocab_size=128, hidden_size=32, intermediate_size=64,
            num_layers=2, num_heads=4, num_kv_heads=4,
            dtype=jnp.float32, remat=False,
        ),
        vision=ViTConfig(
            image_size=16, patch_size=4, hidden_size=16, num_layers=2,
            num_heads=2, mlp_dim=32, feature_layer=-2, drop_class_token=True,
            dtype=jnp.float32, remat=False,
        ),
        projector=ProjectorConfig(kind="mlp2x_gelu", in_dim=16, out_dim=32),
        image_token_id=IMG_TOKEN,
        num_image_tokens=N_IMG,
    )


def global_dpo_batch(n_pairs=4, seq=32):
    """Deterministic full global batch, [chosen; rejected] concat layout."""
    rng = np.random.default_rng(7)
    b2 = 2 * n_pairs
    ids = rng.integers(0, 100, (b2, seq)).astype(np.int32)
    pos = np.broadcast_to(np.arange(2, 2 + N_IMG)[None], (b2, N_IMG)).copy()
    for i in range(b2):
        ids[i, pos[i]] = IMG_TOKEN
    labels = np.where(np.arange(seq)[None] >= 20, ids, -100).astype(np.int64)
    pad = np.ones((b2, seq), bool)
    pixels = (
        rng.integers(0, 255, (n_pairs, 1, 16, 16, 3)).astype(np.float32) / 255.0
    )
    return {
        "input_ids": ids,
        "labels": labels,
        "pad_mask": pad,
        "pixel_values": pixels,
        "image_positions": pos.astype(np.int32),
    }


def local_slice(batch, lo, hi):
    """What a per-process collator emits: pairs [lo:hi) of the global batch,
    keeping the [chosen_slice; rejected_slice] concat layout per process."""
    n = batch["input_ids"].shape[0] // 2
    out = {}
    for k, v in batch.items():
        if v.shape[0] == 2 * n:
            out[k] = np.concatenate([v[lo:hi], v[n + lo : n + hi]], axis=0)
        else:
            out[k] = v[lo:hi]
    return out


def build_step(cfg):
    from vlrlhf_tpu.lora.lora import LoraConfig, init_lora
    from vlrlhf_tpu.models.vlm import init_vlm_params
    from vlrlhf_tpu.train.dpo import (
        DPOConfig,
        make_dpo_step,
        make_ref_logps_fn,
    )
    from vlrlhf_tpu.train.train_state import (
        OptimizerConfig,
        init_train_state,
        make_optimizer,
    )

    params = init_vlm_params(cfg, jax.random.PRNGKey(0))
    lcfg = LoraConfig(
        r=4, alpha=8.0, target_patterns=(r"lm/.*attn/", r"lm/.*mlp/")
    )
    adapters = init_lora(params, lcfg, jax.random.PRNGKey(1))
    dcfg = DPOConfig(beta=0.1, loss_type="sigmoid", lora_scale=lcfg.scale)
    ocfg = OptimizerConfig(learning_rate=5e-3, warmup_steps=1, total_steps=10)
    tx = make_optimizer(ocfg, adapters)
    state = init_train_state(adapters, tx)
    step = make_dpo_step(cfg, dcfg, tx)
    ref_fn = make_ref_logps_fn(cfg, dcfg)
    return params, state, step, ref_fn
