"""Train state + optimizer factory.

Replaces the reference's HF TrainingArguments + DeepSpeed optimizer assembly:
AdamW with warmup+cosine (the recipe in /root/reference/scripts/dpo_qwenvl.sh
and README.md:72-115), gradient clipping, optional gradient accumulation via
optax.MultiSteps, and parameter freezing (freeze_vision_tower,
/root/reference/src/vlrlhf/utils/auto_load.py:554-555) via an optax mask —
frozen params never get optimizer state, which is ZeRO-2-for-free under
sharded state.
"""

from __future__ import annotations

import dataclasses
import re
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax

from vlrlhf_tpu.core.partitioning import tree_paths

PyTree = Any


@dataclasses.dataclass(frozen=True)
class OptimizerConfig:
    learning_rate: float = 1e-5
    warmup_steps: int = 0
    warmup_ratio: float = 0.1
    total_steps: int = 1000
    schedule: str = "cosine"  # 'cosine' | 'linear' | 'constant'
    b1: float = 0.9
    b2: float = 0.999
    eps: float = 1e-8
    weight_decay: float = 0.0
    max_grad_norm: float = 1.0
    grad_accum_steps: int = 1
    # Param paths matching any of these regexes are frozen.
    freeze_patterns: tuple[str, ...] = ()


def _lr_schedule(cfg: OptimizerConfig):
    warmup = cfg.warmup_steps or int(cfg.warmup_ratio * cfg.total_steps)
    if cfg.schedule == "constant":
        return optax.linear_schedule(0.0, cfg.learning_rate, max(warmup, 1))
    if cfg.schedule == "linear":
        return optax.warmup_linear_schedule(
            0.0, cfg.learning_rate, warmup, cfg.total_steps
        )
    return optax.warmup_cosine_decay_schedule(
        0.0, cfg.learning_rate, warmup, max(cfg.total_steps, warmup + 1)
    )


def freeze_mask(params: PyTree, patterns: tuple[str, ...]) -> PyTree:
    """True = trainable."""
    regs = [re.compile(p) for p in patterns]
    flat = tree_paths(params)
    leaves = [not any(r.search(path) for r in regs) for path, _ in flat]
    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(treedef, leaves)


def make_optimizer(cfg: OptimizerConfig, params: PyTree) -> optax.GradientTransformation:
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.adamw(
            _lr_schedule(cfg),
            b1=cfg.b1,
            b2=cfg.b2,
            eps=cfg.eps,
            weight_decay=cfg.weight_decay,
        ),
    )
    if cfg.freeze_patterns:
        mask = freeze_mask(params, cfg.freeze_patterns)
        tx = optax.chain(
            optax.masked(tx, mask),
            # Zero out any grads that leaked into frozen leaves.
            optax.masked(optax.set_to_zero(), jax.tree.map(lambda m: not m, mask)),
        )
    if cfg.grad_accum_steps > 1:
        tx = optax.MultiSteps(tx, cfg.grad_accum_steps)
    return tx


@dataclasses.dataclass
class TrainState:
    """Functional train state. `trainable` is what the optimizer updates —
    the LoRA adapter tree in adapter mode, or the full param tree in full-FT
    mode (with freeze masks). `frozen` holds everything else (base params in
    adapter mode)."""

    step: jax.Array
    trainable: PyTree
    opt_state: PyTree

    def tree_flatten(self):
        return (self.step, self.trainable, self.opt_state), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        del aux
        return cls(*children)


jax.tree_util.register_pytree_node(
    TrainState, TrainState.tree_flatten, TrainState.tree_unflatten
)


def init_train_state(
    trainable: PyTree, tx: optax.GradientTransformation
) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        trainable=trainable,
        opt_state=tx.init(trainable),
    )


def apply_updates(
    state: TrainState,
    grads: PyTree,
    tx: optax.GradientTransformation,
) -> TrainState:
    updates, new_opt = tx.update(grads, state.opt_state, state.trainable)
    new_trainable = optax.apply_updates(state.trainable, updates)
    return TrainState(state.step + 1, new_trainable, new_opt)
