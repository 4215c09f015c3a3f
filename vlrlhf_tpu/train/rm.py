"""Reward-model training step.

Replaces VLRMTrainer + VLRewardModel training
(/root/reference/src/vlrlhf/base/trainer.py:502-570, base/model.py:12-43):
Bradley-Terry loss over [chosen; rejected] batches, scalar head on the last
non-pad token. Trainables = LoRA adapters + the rm_head (the reference's
`modules_to_save=['rm_head']`, reward_modeling.py:59).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import optax

from vlrlhf_tpu.models.common import Ctx
from vlrlhf_tpu.models.vlm import VLMConfig, vlm_forward
from vlrlhf_tpu.train.losses import rm_loss
from vlrlhf_tpu.train.train_state import TrainState, apply_updates

PyTree = Any


@dataclasses.dataclass(frozen=True)
class RMConfig:
    lora_scale: float = 0.25
    lora_dropout: float = 0.0
    dropout_seed: int = 0


def rm_scores(
    model_cfg: VLMConfig,
    params: PyTree,
    rm_head: PyTree,
    batch: dict,
    ctx: Ctx,
    image_features=None,
) -> jax.Array:
    """(B,) scalar rewards: head on last real token's hidden state."""
    (_, hidden), _ = vlm_forward(
        model_cfg,
        params,
        input_ids=batch["input_ids"],
        pixel_values=None if image_features is not None else batch.get("pixel_values"),
        image_features=image_features,
        image_positions=batch.get("image_positions"),
        pad_mask=batch["pad_mask"],
        ctx=ctx,
        return_logits=True,
        return_hidden=True,
    )
    scores = hidden.astype(jnp.float32) @ rm_head["kernel"].astype(jnp.float32)
    last = jnp.sum(batch["pad_mask"].astype(jnp.int32), axis=1) - 1
    return jnp.take_along_axis(scores[..., 0], last[:, None], axis=1)[:, 0]


def rm_step_fn(
    model_cfg: VLMConfig,
    rm_cfg: RMConfig,
    tx: optax.GradientTransformation,
    state: TrainState,
    base_params: PyTree,
    batch: dict,
):
    """state.trainable = {"adapters": ..., "rm_head": {"kernel": ...}}.

    Batch layout: [chosen; rejected] like DPO; pixel_values are per-pair
    (B,...) and the frozen tower runs ONCE, features tiled to 2B (same
    optimization as train/dpo.py).
    """
    n = batch["input_ids"].shape[0] // 2

    image_features = None
    if batch.get("pixel_values") is not None:
        from vlrlhf_tpu.models.vlm import encode_images

        pv = batch["pixel_values"]
        b, n_img = pv.shape[:2]
        feats = encode_images(
            model_cfg, base_params, pv.reshape(b * n_img, *pv.shape[2:])
        )
        feats = feats.reshape(b, n_img * model_cfg.num_image_tokens, -1)
        image_features = jax.lax.stop_gradient(
            jnp.concatenate([feats, feats], axis=0)
        )

    dropout_rng = None
    if rm_cfg.lora_dropout > 0.0:
        dropout_rng = jax.random.fold_in(
            jax.random.PRNGKey(rm_cfg.dropout_seed), state.step
        )

    def loss_fn(trainable):
        ctx = Ctx(
            adapters=trainable["adapters"],
            lora_scale=rm_cfg.lora_scale,
            dropout_rng=dropout_rng,
            lora_dropout=rm_cfg.lora_dropout,
        )
        scores = rm_scores(
            model_cfg, base_params, trainable["rm_head"], batch, ctx,
            image_features,
        )
        chosen, rejected = scores[:n], scores[n:]
        loss = rm_loss(chosen, rejected)
        return loss, {
            "loss": loss,
            "accuracy": jnp.mean((chosen > rejected).astype(jnp.float32)),
            "reward/chosen": jnp.mean(chosen),
            "reward/rejected": jnp.mean(rejected),
        }

    (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.trainable
    )
    new_state = apply_updates(state, grads, tx)
    metrics["grad_norm"] = optax.global_norm(grads)
    return new_state, metrics


def make_rm_step(model_cfg: VLMConfig, rm_cfg: RMConfig, tx):
    from vlrlhf_tpu.core.xla_options import xla_compiler_options

    def step(state, base_params, batch):
        return rm_step_fn(model_cfg, rm_cfg, tx, state, base_params, batch)

    return jax.jit(step, donate_argnums=(0,),
                   compiler_options=xla_compiler_options())
