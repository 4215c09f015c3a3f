"""Preference-learning loss family.

Numerics match the reference trainer exactly (so per-step DPO loss parity
within 1e-3 is achievable — BASELINE.json north star):
  - batch_logps     == VLDPOTrainer.get_batch_logps
                       (/root/reference/src/vlrlhf/base/trainer.py:148-188)
  - dpo_loss family == VLDPOTrainer.dpo_loss (trainer.py:244-301):
                       sigmoid (with label smoothing), hinge, ipo, kto_pair,
                       ddpo (= sigmoid over diff-masked logps)
  - sft_loss        == shifted CE over labeled tokens
                       (models/Llava/__init__.py:246-257)
  - rm_loss         == TRL RewardTrainer's -logsigmoid(r_c - r_r)

DDPO's shared-token masking (difflib over token ids, trainer.py:169-184) is
precomputed in the data pipeline (data/diffmask.py) and arrives as
`loss_mask` — the reference recomputes it on CPU inside every training step,
which we deliberately do not replicate.

All logps are computed in float32 from bf16 logits.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

LABEL_PAD = -100


def batch_logps(
    logits: jax.Array,  # (B, S, V)
    labels: jax.Array,  # (B, S), LABEL_PAD on non-completion tokens
    average_log_prob: bool = False,
    loss_mask: Optional[jax.Array] = None,  # extra mask (DDPO diff mask)
) -> jax.Array:
    """Sum (or mean) log p(label) over labeled positions. (B,)"""
    # Shift: logits at t predict labels at t+1.
    logits = logits[:, :-1]
    labels = labels[:, 1:]
    mask = labels != LABEL_PAD
    if loss_mask is not None:
        mask = mask & loss_mask[:, 1:].astype(bool)
    safe_labels = jnp.where(mask, labels, 0)
    # gather - logsumexp instead of materializing a (B,S,V) f32 log_softmax:
    # the f32 cast fuses into the reduction, halving logits HBM traffic.
    lse = jax.nn.logsumexp(logits.astype(jnp.float32), axis=-1)
    # mode="clip": an out-of-vocab label (tokenizer/config mismatch) must not
    # hit jit's OOB NaN-fill — same defensive convention as common.embed.
    tok = jnp.take_along_axis(
        logits, safe_labels[..., None], axis=-1, mode="clip"
    )[..., 0]
    per_token = (tok.astype(jnp.float32) - lse) * mask
    if average_log_prob:
        return per_token.sum(-1) / jnp.maximum(mask.sum(-1), 1)
    return per_token.sum(-1)


def chunked_logps(
    hidden: jax.Array,  # (B, S, H) final hidden states (pre lm_head)
    labels: jax.Array,  # (B, S), LABEL_PAD on non-completion tokens
    head_fn,  # (B, C, H) -> (B, C, V) logits chunk (lm_head / tied embed)
    *,
    average_log_prob: bool = False,
    loss_mask: Optional[jax.Array] = None,
    chunk: int = 512,
) -> tuple[jax.Array, jax.Array]:
    """batch_logps without ever materializing (B, S, V) logits.

    lax.scan over S-chunks; each chunk computes head matmul + gather/lse and
    is jax.checkpoint'ed, so the backward re-derives one (B, C, V) logits
    chunk at a time instead of holding the full tensor + its f32 softmax VJP.
    At 7B (V=32000, S=1024) that removes ~0.5 GiB of peak HBM per forward
    (Liger-kernel-style fused linear+loss, restructured as an XLA scan — a
    Pallas matmul here would just re-implement what the MXU path already
    does).

    Returns (logps (B,), logits_sum (B,)) — logits_sum is the f32 sum of
    logits over ALL S positions (only chunk-padding beyond S is excluded,
    right-padded batch positions are included), matching the dense path's
    logits.mean(axis=(1,2)) -> the reference's `logits/chosen` mean metric.
    """
    b, s, h = hidden.shape
    # Shift: logits at t predict labels at t+1 (same as batch_logps).
    labels_next = jnp.concatenate(
        [labels[:, 1:], jnp.full((b, 1), LABEL_PAD, labels.dtype)], axis=1
    )
    mask = labels_next != LABEL_PAD
    if loss_mask is not None:
        lm = jnp.concatenate(
            [loss_mask[:, 1:], jnp.zeros_like(loss_mask[:, :1])], axis=1
        )
        mask = mask & lm.astype(bool)
    c = min(chunk, s)
    n = -(-s // c)
    sp = n * c

    def pad(x, value=0):
        if sp == s:
            return x
        widths = [(0, 0), (0, sp - s)] + [(0, 0)] * (x.ndim - 2)
        return jnp.pad(x, widths, constant_values=value)

    xs = (
        pad(hidden).reshape(b, n, c, h).swapaxes(0, 1),
        pad(jnp.where(mask, labels_next, 0)).reshape(b, n, c).swapaxes(0, 1),
        pad(mask).reshape(b, n, c).swapaxes(0, 1),
        pad(jnp.ones((b, s), bool)).reshape(b, n, c).swapaxes(0, 1),
    )

    def body(carry, xs_t):
        acc_lp, acc_ls = carry
        hc, lc, mc, vc = xs_t
        logits = head_fn(hc)  # (B, C, V)
        lse = jax.nn.logsumexp(logits.astype(jnp.float32), axis=-1)
        tok = jnp.take_along_axis(logits, lc[..., None], axis=-1, mode="clip")[
            ..., 0
        ]
        acc_lp = acc_lp + ((tok.astype(jnp.float32) - lse) * mc).sum(-1)
        acc_ls = acc_ls + (logits.astype(jnp.float32).sum(-1) * vc).sum(-1)
        return (acc_lp, acc_ls), None

    body = jax.checkpoint(body, prevent_cse=False)
    zeros = jnp.zeros((b,), jnp.float32)
    (logps, logits_sum), _ = jax.lax.scan(body, (zeros, zeros), xs)
    if average_log_prob:
        logps = logps / jnp.maximum(mask.sum(-1), 1)
    return logps, logits_sum


def chunked_token_logps(
    hidden: jax.Array,  # (B, S, H) final hidden states (pre lm_head)
    ids: jax.Array,  # (B, S) token ids
    head_fn,  # (B, C, H) -> (B, C, V)
    *,
    chunk: int = 512,
) -> jax.Array:
    """Per-token logp of ids[t+1] under head(hidden[t]), (B, S-1) — the
    PPO _token_logprobs computation without materializing (B, S, V) logits
    (same scanned/checkpointed structure as chunked_logps, but emitting the
    per-position values instead of their sum)."""
    b, s, h = hidden.shape
    ids_next = jnp.concatenate(
        [ids[:, 1:], jnp.zeros((b, 1), ids.dtype)], axis=1
    )
    c = min(chunk, s)
    n = -(-s // c)
    sp = n * c

    def pad(x):
        if sp == s:
            return x
        widths = [(0, 0), (0, sp - s)] + [(0, 0)] * (x.ndim - 2)
        return jnp.pad(x, widths)

    xs = (
        pad(hidden).reshape(b, n, c, h).swapaxes(0, 1),
        pad(ids_next).reshape(b, n, c).swapaxes(0, 1),
    )

    def body(carry, xs_t):
        hc, lc = xs_t
        logits = head_fn(hc)  # (B, C, V)
        lse = jax.nn.logsumexp(logits.astype(jnp.float32), axis=-1)
        tok = jnp.take_along_axis(logits, lc[..., None], axis=-1, mode="clip")[
            ..., 0
        ]
        return carry, tok.astype(jnp.float32) - lse

    body = jax.checkpoint(body, prevent_cse=False)
    _, ys = jax.lax.scan(body, None, xs)  # (n, B, C)
    return ys.swapaxes(0, 1).reshape(b, sp)[:, : s - 1]


class DPOLossOutput(NamedTuple):
    loss: jax.Array  # scalar
    chosen_rewards: jax.Array  # (B,)
    rejected_rewards: jax.Array  # (B,)


def dpo_loss(
    policy_chosen_logps: jax.Array,
    policy_rejected_logps: jax.Array,
    ref_chosen_logps: jax.Array,
    ref_rejected_logps: jax.Array,
    *,
    beta: float = 0.1,
    label_smoothing: float = 0.0,
    loss_type: str = "sigmoid",  # sigmoid | ddpo | hinge | ipo | kto_pair
    reference_free: bool = False,
) -> DPOLossOutput:
    pi_logratios = policy_chosen_logps - policy_rejected_logps
    ref_logratios = (
        jnp.zeros_like(pi_logratios)
        if reference_free
        else ref_chosen_logps - ref_rejected_logps
    )
    logits = pi_logratios - ref_logratios

    if loss_type in ("sigmoid", "ddpo"):
        losses = -jax.nn.log_sigmoid(beta * logits) * (
            1 - label_smoothing
        ) - jax.nn.log_sigmoid(-beta * logits) * label_smoothing
    elif loss_type == "hinge":
        losses = jax.nn.relu(1 - beta * logits)
    elif loss_type == "ipo":
        losses = (logits - 1 / (2 * beta)) ** 2
    elif loss_type == "kto_pair":
        chosen_kl = jnp.clip(
            jnp.mean(policy_chosen_logps - ref_chosen_logps), 0, None
        )
        rejected_kl = jnp.clip(
            jnp.mean(policy_rejected_logps - ref_rejected_logps), 0, None
        )
        chosen_lr = policy_chosen_logps - ref_chosen_logps
        rejected_lr = policy_rejected_logps - ref_rejected_logps
        losses = jnp.concatenate(
            [
                1 - jax.nn.sigmoid(beta * (chosen_lr - rejected_kl)),
                1 - jax.nn.sigmoid(beta * (chosen_kl - rejected_lr)),
            ]
        )
    else:
        raise ValueError(f"Unknown loss type: {loss_type}")

    chosen_rewards = beta * jax.lax.stop_gradient(
        policy_chosen_logps - ref_chosen_logps
    )
    rejected_rewards = beta * jax.lax.stop_gradient(
        policy_rejected_logps - ref_rejected_logps
    )
    return DPOLossOutput(jnp.mean(losses), chosen_rewards, rejected_rewards)


def sft_loss(
    logits: jax.Array,  # (B, S, V)
    labels: jax.Array,  # (B, S)
    pad_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Mean shifted CE over labeled tokens (token-mean, HF convention)."""
    logits = logits[:, :-1].astype(jnp.float32)
    labels = labels[:, 1:]
    mask = labels != LABEL_PAD
    if pad_mask is not None:
        mask = mask & pad_mask[:, 1:].astype(bool)
    safe = jnp.where(mask, labels, 0)
    logps = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logps, safe[..., None], axis=-1, mode="clip")[
        ..., 0
    ]
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1)


def rm_loss(chosen_rewards: jax.Array, rejected_rewards: jax.Array) -> jax.Array:
    """Bradley-Terry pairwise loss (TRL RewardTrainer default)."""
    return -jnp.mean(jax.nn.log_sigmoid(chosen_rewards - rejected_rewards))
