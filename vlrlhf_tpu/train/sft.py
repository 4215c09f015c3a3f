"""SFT training step (replaces VLSFTTrainer, base/trainer.py:573-674).

Causal-LM loss over assistant tokens only; supports LoRA-adapter training
(trainable = adapters) or full fine-tuning with freeze masks (trainable =
params, vision frozen via the optimizer mask in train_state.py).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax

from vlrlhf_tpu.models.common import Ctx
from vlrlhf_tpu.models.vlm import VLMConfig, lm_head_fn, vlm_forward
from vlrlhf_tpu.train.losses import LABEL_PAD, chunked_logps, sft_loss
from vlrlhf_tpu.train.train_state import TrainState, apply_updates

PyTree = Any


@dataclasses.dataclass(frozen=True)
class SFTConfig:
    lora_scale: float = 0.25
    mode: str = "adapter"  # 'adapter' | 'full'
    lora_dropout: float = 0.0
    dropout_seed: int = 0
    # >0: fused chunked lm_head + CE over S-chunks (losses.chunked_logps) —
    # never materializes the (B, S, V) f32 log_softmax; biggest win on
    # large-vocab families (Qwen V=151k).
    logits_chunk: int = 0


def sft_step_fn(
    model_cfg: VLMConfig,
    sft_cfg: SFTConfig,
    tx: optax.GradientTransformation,
    state: TrainState,
    base_params: Optional[PyTree],
    batch: dict,
):
    dropout_rng = None
    if sft_cfg.lora_dropout > 0.0 and sft_cfg.mode == "adapter":
        dropout_rng = jax.random.fold_in(
            jax.random.PRNGKey(sft_cfg.dropout_seed), state.step
        )

    def loss_fn(trainable):
        if sft_cfg.mode == "adapter":
            params = base_params
            ctx = Ctx(
                adapters=trainable,
                lora_scale=sft_cfg.lora_scale,
                dropout_rng=dropout_rng,
                lora_dropout=sft_cfg.lora_dropout,
            )
        else:
            params = trainable
            ctx = Ctx()
        kwargs = dict(
            input_ids=batch["input_ids"],
            pixel_values=batch.get("pixel_values"),
            image_positions=batch.get("image_positions"),
            anyres_gather=batch.get("anyres_gather"),
            qformer_ids=batch.get("qformer_input_ids"),
            qformer_mask=batch.get("qformer_mask"),
            pad_mask=batch["pad_mask"],
            ctx=ctx,
        )
        if sft_cfg.logits_chunk:
            hidden, _ = vlm_forward(
                model_cfg, params, return_logits=False, **kwargs
            )
            logps, _ = chunked_logps(
                hidden,
                batch["labels"],
                lm_head_fn(model_cfg, params, ctx),
                loss_mask=batch["pad_mask"],
                chunk=sft_cfg.logits_chunk,
            )
            mask = (batch["labels"][:, 1:] != LABEL_PAD) & batch["pad_mask"][
                :, 1:
            ].astype(bool)
            loss = -jnp.sum(logps) / jnp.maximum(jnp.sum(mask), 1)
        else:
            logits, _ = vlm_forward(model_cfg, params, **kwargs)
            loss = sft_loss(logits, batch["labels"], batch["pad_mask"])
        return loss, {"loss": loss}

    (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.trainable
    )
    new_state = apply_updates(state, grads, tx)
    metrics["grad_norm"] = optax.global_norm(grads)
    metrics["ppl"] = jnp.exp(metrics["loss"])
    return new_state, metrics


def make_sft_step(model_cfg: VLMConfig, sft_cfg: SFTConfig, tx):
    from vlrlhf_tpu.core.xla_options import xla_compiler_options

    def step(state, base_params, batch):
        return sft_step_fn(model_cfg, sft_cfg, tx, state, base_params, batch)

    return jax.jit(step, donate_argnums=(0,),
                   compiler_options=xla_compiler_options())
