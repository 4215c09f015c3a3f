"""PPO training (replaces VLPPOTrainer + TRL PPOTrainer,
/root/reference/src/vlrlhf/base/trainer.py:363-499, base/model.py:72-201).

Flow per outer step (reference §3.4 call stack):
  1. rollout: the generation engine samples responses with policy adapters ON
  2. score: reward = trained RM (train/rm.py rm_scores) on query+response
  3. stats (one jitted fn): policy logprobs + values, adapter-OFF ref
     logprobs, per-token KL penalty rewards, GAE advantages/returns
  4. update (one jitted fn, scanned ppo_epochs x minibatches): clipped PG
     loss + clipped value loss, exactly TRL's objective
  5. adaptive KL controller on host (TRL's AdaptiveKLController)

The value head lives on the policy trunk (trainable = {"adapters", "v_head"});
a separate LoRA value-adapter set is supported by passing distinct adapter
trees, mirroring the reference's use_value_adapter
(/root/reference/src/vlrlhf/ppo.py:151-170).

Right-padded layout throughout: prompt tokens then response tokens, so GAE's
reversed scan passes zeros through the padded tail with no special casing.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from vlrlhf_tpu.models.common import Ctx
from vlrlhf_tpu.models.vlm import VLMConfig, vlm_forward
from vlrlhf_tpu.train.train_state import TrainState, apply_updates

PyTree = Any


@dataclasses.dataclass(frozen=True)
class PPOConfig:
    lora_scale: float = 0.25
    init_kl_coef: float = 0.2
    target_kl: float = 6.0
    kl_horizon: int = 10000
    adaptive_kl: bool = True
    gamma: float = 1.0
    lam: float = 0.95
    cliprange: float = 0.2
    cliprange_value: float = 0.2
    vf_coef: float = 0.1
    ppo_epochs: int = 4
    minibatch_size: int = 0  # 0 = full batch
    whiten_advantages: bool = True
    score_clip: Optional[float] = None
    use_score_scaling: bool = False
    use_score_norm: bool = False
    # >0: per-token logps via losses.chunked_token_logps — the (B, L, V)
    # logits never materialize in the stats or update forwards (PPO holds
    # policy+ref+update logits otherwise; the saving is per-forward the same
    # as DPO's logits_chunk). Caveat: in bf16 on TPU the stats and update
    # compilations of the rematerialized scan can round differently, so the
    # first inner update's ratio is ~1 +/- bf16 eps instead of exactly 1
    # (the dense path happens to compile bit-identically); the clipped
    # objective is insensitive to this, and the CPU parity test bounds the
    # deviation at 2e-5 in f32.
    logits_chunk: int = 0


def masked_mean(x, mask, axis=None):
    return jnp.sum(x * mask, axis=axis) / jnp.maximum(jnp.sum(mask, axis=axis), 1)


def masked_whiten(x, mask):
    """TRL's masked_whiten with shift_mean=True (zero-mean output)."""
    mean = masked_mean(x, mask)
    var = masked_mean((x - mean) ** 2, mask)
    return (x - mean) * jax.lax.rsqrt(var + 1e-8)


class RolloutStats(NamedTuple):
    logprobs: jax.Array  # (B, L-1) per-token logp of sequence tokens
    ref_logprobs: jax.Array
    values: jax.Array  # (B, L-1) value at each position
    advantages: jax.Array
    returns: jax.Array
    response_mask: jax.Array  # (B, L-1) 1 on response tokens
    kl: jax.Array  # scalar mean KL (for the controller)


def _token_logprobs(logits, ids):
    """logp of ids[t+1] under logits[t]; (B, L-1)."""
    logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
    return jnp.take_along_axis(logp, ids[:, 1:, None], axis=-1)[..., 0]


def _forward_logps_and_values(
    model_cfg, ppo_cfg, params, v_head, batch, ctx, value_ctx=None
):
    """Per-token logps (B, L-1) + values (B, L). With a separate
    value-adapter set (the reference's use_value_adapter,
    base/model.py:72-100 + ppo.py:151-170), values come from a second trunk
    pass under `value_ctx`; otherwise the value head rides the policy
    trunk. With ppo_cfg.logits_chunk the lm_head applies per S-chunk and
    (B, L, V) logits never materialize."""

    def trunk(c, want_logits):
        return vlm_forward(
            model_cfg,
            params,
            input_ids=batch["input_ids"],
            pixel_values=batch.get("pixel_values"),
            image_positions=batch.get("image_positions"),
            pad_mask=batch["pad_mask"],
            ctx=c,
            return_logits=want_logits,
            return_hidden=True,
        )[0]

    if ppo_cfg.logits_chunk:
        from vlrlhf_tpu.models.vlm import lm_head_fn
        from vlrlhf_tpu.train.losses import chunked_token_logps

        hidden = trunk(ctx, want_logits=False)
        logprobs = chunked_token_logps(
            hidden,
            batch["input_ids"],
            lm_head_fn(model_cfg, params, ctx),
            chunk=ppo_cfg.logits_chunk,
        )
        if value_ctx is not None:
            hidden = trunk(value_ctx, want_logits=False)
    else:
        logits, hidden = trunk(ctx, want_logits=True)
        logprobs = _token_logprobs(logits, batch["input_ids"])
        if value_ctx is not None:
            _, hidden = trunk(value_ctx, want_logits=True)
    values = (
        hidden.astype(jnp.float32) @ v_head["kernel"].astype(jnp.float32)
    )[..., 0]
    if "bias" in v_head:
        values = values + v_head["bias"][0]
    return logprobs, values


def compute_rollout_stats(
    model_cfg: VLMConfig,
    ppo_cfg: PPOConfig,
    params: PyTree,
    trainable: PyTree,  # {"adapters", "v_head"}
    batch: dict,  # input_ids (B,L) prompt+response, pad_mask, response_mask
    scores: jax.Array,  # (B,) sequence-level rewards from the RM
    kl_coef: jax.Array,  # scalar
) -> RolloutStats:
    ctx = Ctx(adapters=trainable["adapters"], lora_scale=ppo_cfg.lora_scale)
    value_ctx = None
    if "value_adapters" in trainable:
        value_ctx = Ctx(
            adapters=trainable["value_adapters"], lora_scale=ppo_cfg.lora_scale
        )
    logprobs, values = _forward_logps_and_values(
        model_cfg, ppo_cfg, params, trainable["v_head"], batch, ctx, value_ctx
    )
    ids = batch["input_ids"]
    if ppo_cfg.logits_chunk:
        from vlrlhf_tpu.models.vlm import lm_head_fn
        from vlrlhf_tpu.train.losses import chunked_token_logps

        ref_hidden, _ = vlm_forward(
            model_cfg,
            params,
            input_ids=ids,
            pixel_values=batch.get("pixel_values"),
            image_positions=batch.get("image_positions"),
            pad_mask=batch["pad_mask"],
            ctx=Ctx(),
            return_logits=False,
        )
        ref_logprobs = chunked_token_logps(
            ref_hidden, ids, lm_head_fn(model_cfg, params, Ctx()),
            chunk=ppo_cfg.logits_chunk,
        )
    else:
        ref_logits, _ = vlm_forward(
            model_cfg,
            params,
            input_ids=ids,
            pixel_values=batch.get("pixel_values"),
            image_positions=batch.get("image_positions"),
            pad_mask=batch["pad_mask"],
            ctx=Ctx(),
        )
        ref_logprobs = _token_logprobs(ref_logits, ids)
    mask = batch["response_mask"][:, 1:].astype(jnp.float32)
    values = values[:, :-1] * mask

    if ppo_cfg.score_clip is not None:
        scores = jnp.clip(scores, -ppo_cfg.score_clip, ppo_cfg.score_clip)

    kl = (logprobs - ref_logprobs) * mask
    non_score_rewards = -kl_coef * kl
    # sequence score lands on the LAST response token
    last_idx = jnp.sum(batch["response_mask"], axis=1).astype(jnp.int32) - 1
    resp_start = jnp.argmax(batch["response_mask"], axis=1)
    last_pos = resp_start + jnp.maximum(last_idx, 0) - 1  # shifted coords
    rewards = non_score_rewards
    rewards = rewards.at[jnp.arange(ids.shape[0]), last_pos].add(scores)
    rewards = rewards * mask

    def gae_step(carry, xs):
        lastgaelam = carry
        delta, m = xs
        lastgaelam = delta + ppo_cfg.gamma * ppo_cfg.lam * lastgaelam * m
        return lastgaelam, lastgaelam

    next_values = jnp.concatenate(
        [values[:, 1:], jnp.zeros_like(values[:, :1])], axis=1
    )
    deltas = (rewards + ppo_cfg.gamma * next_values - values) * mask
    _, adv_rev = jax.lax.scan(
        gae_step,
        jnp.zeros((ids.shape[0],)),
        (deltas[:, ::-1].T, mask[:, ::-1].T),
    )
    advantages = adv_rev.T[:, ::-1] * mask
    returns = advantages + values
    if ppo_cfg.whiten_advantages:
        advantages = masked_whiten(advantages, mask) * mask
    advantages = jax.lax.stop_gradient(advantages)

    return RolloutStats(
        logprobs=jax.lax.stop_gradient(logprobs),
        ref_logprobs=jax.lax.stop_gradient(ref_logprobs),
        values=jax.lax.stop_gradient(values),
        advantages=advantages,
        returns=jax.lax.stop_gradient(returns),
        response_mask=mask,
        kl=masked_mean(kl, mask),
    )


def ppo_update_fn(
    model_cfg: VLMConfig,
    ppo_cfg: PPOConfig,
    tx: optax.GradientTransformation,
    state: TrainState,
    base_params: PyTree,
    batch: dict,
    stats: RolloutStats,
):
    """One PPO inner update over the whole batch (driver loops epochs)."""

    def loss_fn(trainable):
        ctx = Ctx(adapters=trainable["adapters"], lora_scale=ppo_cfg.lora_scale)
        value_ctx = None
        if "value_adapters" in trainable:
            value_ctx = Ctx(
                adapters=trainable["value_adapters"],
                lora_scale=ppo_cfg.lora_scale,
            )
        new_logprobs, values = _forward_logps_and_values(
            model_cfg, ppo_cfg, base_params, trainable["v_head"], batch, ctx,
            value_ctx,
        )
        mask = stats.response_mask
        values = values[:, :-1] * mask

        ratio = jnp.exp((new_logprobs - stats.logprobs) * mask)
        pg1 = -stats.advantages * ratio
        pg2 = -stats.advantages * jnp.clip(
            ratio, 1.0 - ppo_cfg.cliprange, 1.0 + ppo_cfg.cliprange
        )
        pg_loss = masked_mean(jnp.maximum(pg1, pg2), mask)

        v_clipped = jnp.clip(
            values,
            stats.values - ppo_cfg.cliprange_value,
            stats.values + ppo_cfg.cliprange_value,
        )
        vf1 = (values - stats.returns) ** 2
        vf2 = (v_clipped - stats.returns) ** 2
        vf_loss = 0.5 * masked_mean(jnp.maximum(vf1, vf2), mask)

        loss = pg_loss + ppo_cfg.vf_coef * vf_loss
        approx_kl = masked_mean(0.5 * (new_logprobs - stats.logprobs) ** 2, mask)
        metrics = {
            "ppo/loss/policy": pg_loss,
            "ppo/loss/value": vf_loss,
            "ppo/loss/total": loss,
            "ppo/policy/approxkl": approx_kl,
            "ppo/policy/clipfrac": masked_mean(
                (jnp.abs(ratio - 1.0) > ppo_cfg.cliprange).astype(jnp.float32),
                mask,
            ),
            "ppo/ratio_mean": masked_mean(ratio, mask),
            # On the first inner epoch this is 0 in exact arithmetic; with
            # logits_chunk the stats/update compilations can round
            # differently in bf16, so watch this stays within bf16 eps
            # (~1e-2) at epoch 0 — larger drift means a real logps mismatch.
            "ppo/ratio_max_abs_dev": jnp.max(jnp.abs(ratio - 1.0) * mask),
        }
        return loss, metrics

    (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.trainable
    )
    new_state = apply_updates(state, grads, tx)
    metrics["grad_norm"] = optax.global_norm(grads)
    return new_state, metrics


def rollout_to_batch(
    prompt_batch: dict,
    response_tokens,  # (B, N) from the generation engine (pad-filled)
    pad_token_id: int,
    resp_lens=None,  # (B,) EXACT response lengths from the engine. Without
    # them, lengths fall back to counting non-pad tokens — wrong whenever a
    # SAMPLED token equals pad_token_id (a real vocab id): the splice then
    # drops the trailing eos and the reward/KL positions shift. The PPO CLI
    # passes engine lengths in both rollout modes; only legacy callers with
    # greedy/eos-free rollouts should rely on the fallback.
) -> dict:
    """Host-side: splice generated responses after each row's prompt.

    Keeps token IDS from the rollout rather than the reference's
    decode->retokenize round trip (base/trainer.py:444-447) — identical
    semantics when the template's tokenization is prefix-stable, and it can't
    desync the reward positions.
    """
    import numpy as np

    ids_p = np.asarray(prompt_batch["input_ids"])
    plens = np.asarray(prompt_batch["prompt_lens"])
    resp = np.asarray(response_tokens)
    b, n_new = resp.shape
    if resp_lens is None:
        resp_lens = (resp != pad_token_id).sum(axis=1)
    else:
        resp_lens = np.asarray(resp_lens)
    L = int((plens + resp_lens).max())
    L = -(-L // 128) * 128 if L > 128 else L
    ids = np.full((b, L), pad_token_id, ids_p.dtype)
    pad_mask = np.zeros((b, L), bool)
    resp_mask = np.zeros((b, L), bool)
    for i in range(b):
        p, r = int(plens[i]), int(resp_lens[i])
        ids[i, :p] = ids_p[i, :p]
        ids[i, p : p + r] = resp[i, :r]
        pad_mask[i, : p + r] = True
        resp_mask[i, p : p + r] = True
    out = {
        "input_ids": ids,
        "pad_mask": pad_mask,
        "response_mask": resp_mask,
    }
    for k in ("pixel_values", "image_positions"):
        if prompt_batch.get(k) is not None:
            out[k] = prompt_batch[k]
    return out


def _take_rows(x, idx, b):
    if x is None or not hasattr(x, "shape") or x.ndim == 0 or x.shape[0] != b:
        return x
    return jnp.take(jnp.asarray(x), idx, axis=0)


def ppo_update_epochs(
    update_fn,
    state: TrainState,
    base_params: PyTree,
    batch: dict,
    stats: RolloutStats,
    ppo_cfg: PPOConfig,
    seed: int = 0,
):
    """TRL's inner loop (trl 0.8.1 PPOTrainer.step): for each of ppo_epochs,
    shuffle the rollout batch and take one optimizer step per minibatch of
    `minibatch_size` (0 = full batch). The reference exposes minibatch_size
    via PPOConfig (/root/reference/src/vlrlhf/ppo.py:72-119); round 1 ran
    full-batch only. Remainder rows (< one minibatch) are dropped within an
    epoch to keep compiled shapes static; the permutation re-draws per epoch
    so no row is systematically excluded."""
    import numpy as np

    b = batch["input_ids"].shape[0]
    mb = min(ppo_cfg.minibatch_size, b) if ppo_cfg.minibatch_size else b
    n_mb = b // mb
    rng = np.random.default_rng(seed)
    metrics: dict = {}
    for _ in range(ppo_cfg.ppo_epochs):
        perm = rng.permutation(b)[: n_mb * mb]
        for m in range(n_mb):
            idx = jnp.asarray(perm[m * mb : (m + 1) * mb])
            mb_batch = {k: _take_rows(v, idx, b) for k, v in batch.items()}
            mb_stats = RolloutStats(
                *[_take_rows(f, idx, b) for f in stats]
            )
            state, metrics = update_fn(state, base_params, mb_batch, mb_stats)
    return state, metrics


class RunningMoments:
    """TRL's RunningMoments (trl 0.8.1 core.py): parallel-variance merge of
    per-batch moments, so after any number of update() calls mean/var equal
    the mean/var of everything seen. Drives use_score_scaling/use_score_norm
    (TRL PPOTrainer.step score preprocessing; the reference exposes these via
    trl.PPOConfig, /root/reference/src/vlrlhf/ppo.py:72-119)."""

    def __init__(self):
        self.mean = 0.0
        self.var = 1.0
        self.std = 1.0
        self.count = 1e-24

    def update(self, xs) -> tuple[float, float]:
        import numpy as np

        xs = np.asarray(xs, np.float64)
        xs_count = xs.size
        xs_mean = float(xs.mean())
        xs_var = float(xs.var())  # biased, as in TRL
        delta = xs_mean - self.mean
        tot_count = self.count + xs_count
        new_sum = xs_var * xs_count
        old_sum = self.var * self.count + delta**2 * self.count * xs_count / tot_count
        self.mean += delta * xs_count / tot_count
        self.var = (old_sum + new_sum) / tot_count
        self.std = float((self.var * tot_count / max(tot_count - 1, 1e-24)) ** 0.5)
        self.count = tot_count
        return xs_mean, float(
            (xs_var * xs_count / max(xs_count - 1, 1e-24)) ** 0.5
        )


def preprocess_scores(scores, ppo_cfg: PPOConfig, moments: RunningMoments):
    """TRL's score pipeline, in TRL's order: running scale/norm, then clip.

    Host-side (numpy), exactly like TRL applies it before compute_rewards.
    compute_rollout_stats clips again in-jit with the same bounds, which is
    idempotent, so callers may use either or both."""
    import numpy as np

    scores = np.asarray(scores, np.float32)
    if ppo_cfg.use_score_scaling:
        moments.update(scores)
        factor = moments.std + np.finfo(np.float32).eps
        if ppo_cfg.use_score_norm:
            scores = (scores - moments.mean) / factor
        else:
            scores = scores / factor
    if ppo_cfg.score_clip is not None:
        scores = np.clip(scores, -ppo_cfg.score_clip, ppo_cfg.score_clip)
    return scores


class AdaptiveKLController:
    """TRL's adaptive KL controller (proportional, clipped)."""

    def __init__(self, cfg: PPOConfig):
        self.value = cfg.init_kl_coef
        self.cfg = cfg

    def update(self, current_kl: float, n_steps: int):
        if not self.cfg.adaptive_kl:
            return self.value
        target = self.cfg.target_kl
        proportional_error = float(jnp.clip(current_kl / target - 1, -0.2, 0.2))
        mult = 1 + proportional_error * n_steps / self.cfg.kl_horizon
        self.value *= mult
        return self.value


def make_ppo_fns(model_cfg: VLMConfig, ppo_cfg: PPOConfig, tx):
    from vlrlhf_tpu.core.xla_options import xla_compiler_options

    opts = xla_compiler_options()
    stats_fn = jax.jit(
        lambda params, trainable, batch, scores, kl_coef: compute_rollout_stats(
            model_cfg, ppo_cfg, params, trainable, batch, scores, kl_coef
        ),
        compiler_options=opts,
    )
    update_fn = jax.jit(
        lambda state, base_params, batch, stats: ppo_update_fn(
            model_cfg, ppo_cfg, tx, state, base_params, batch, stats
        ),
        donate_argnums=(0,),
        compiler_options=opts,
    )
    return stats_fn, update_fn
