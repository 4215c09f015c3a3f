"""Loss-math parity vs an independent torch implementation of the reference
trainer's formulas (/root/reference/src/vlrlhf/base/trainer.py:148-301), plus
DDPO diff-mask parity against the reference's own diff_lib (imported
read-only, used only as a test oracle)."""

import importlib.util

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from vlrlhf_tpu.data.diffmask import diff_masks, get_diff_ids
from vlrlhf_tpu.train.losses import batch_logps, dpo_loss, rm_loss, sft_loss

LABEL_PAD = -100


def _torch_batch_logps(logits, labels, average_log_prob=False, loss_mask_extra=None):
    labels = labels[:, 1:].clone()
    logits = logits[:, :-1, :]
    loss_mask = labels != LABEL_PAD
    if loss_mask_extra is not None:
        loss_mask &= torch.as_tensor(loss_mask_extra)[:, 1:]
    labels[labels == LABEL_PAD] = 0
    per_token = torch.gather(
        logits.log_softmax(-1), dim=2, index=labels.unsqueeze(2)
    ).squeeze(2)
    if average_log_prob:
        return (per_token * loss_mask).sum(-1) / loss_mask.sum(-1)
    return (per_token * loss_mask).sum(-1)


def _rand_batch(seed=0, b=4, s=12, v=32):
    g = torch.Generator().manual_seed(seed)
    logits = torch.randn(b, s, v, generator=g)
    labels = torch.randint(0, v, (b, s), generator=g)
    labels[:, :4] = LABEL_PAD  # prompt tokens
    labels[0, -2:] = LABEL_PAD  # some padding
    return logits, labels


@pytest.mark.parametrize("avg", [False, True])
def test_batch_logps_parity(avg):
    logits, labels = _rand_batch()
    want = _torch_batch_logps(logits, labels, avg).numpy()
    got = batch_logps(jnp.asarray(logits.numpy()), jnp.asarray(labels.numpy()), avg)
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_batch_logps_with_diff_mask():
    logits, labels = _rand_batch(seed=1)
    mask = torch.rand(labels.shape) > 0.4
    want = _torch_batch_logps(logits, labels, False, mask).numpy()
    got = batch_logps(
        jnp.asarray(logits.numpy()),
        jnp.asarray(labels.numpy()),
        False,
        loss_mask=jnp.asarray(mask.numpy()),
    )
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def _torch_dpo_loss(pc, pr, rc, rr, beta, loss_type, label_smoothing=0.0):
    logits = (pc - pr) - (rc - rr)
    if loss_type in ("sigmoid", "ddpo"):
        losses = (
            -F.logsigmoid(beta * logits) * (1 - label_smoothing)
            - F.logsigmoid(-beta * logits) * label_smoothing
        )
    elif loss_type == "hinge":
        losses = torch.relu(1 - beta * logits)
    elif loss_type == "ipo":
        losses = (logits - 1 / (2 * beta)) ** 2
    elif loss_type == "kto_pair":
        chosen_KL = (pc - rc).mean().clamp(min=0)
        rejected_KL = (pr - rr).mean().clamp(min=0)
        losses = torch.cat(
            (
                1 - torch.sigmoid(beta * ((pc - rc) - rejected_KL)),
                1 - torch.sigmoid(beta * (chosen_KL - (pr - rr))),
            ),
            0,
        )
    return losses.mean(), beta * (pc - rc), beta * (pr - rr)


@pytest.mark.parametrize(
    "loss_type,ls",
    [("sigmoid", 0.0), ("sigmoid", 0.1), ("ddpo", 0.0), ("hinge", 0.0),
     ("ipo", 0.0), ("kto_pair", 0.0)],
)
def test_dpo_loss_parity(loss_type, ls):
    g = torch.Generator().manual_seed(7)
    pc, pr, rc, rr = (torch.randn(6, generator=g) * 5 for _ in range(4))
    want_loss, want_cr, want_rr = _torch_dpo_loss(pc, pr, rc, rr, 0.1, loss_type, ls)
    out = dpo_loss(
        *(jnp.asarray(x.numpy()) for x in (pc, pr, rc, rr)),
        beta=0.1,
        label_smoothing=ls,
        loss_type=loss_type,
    )
    np.testing.assert_allclose(out.loss, want_loss.numpy(), atol=1e-6, rtol=1e-6)
    np.testing.assert_allclose(out.chosen_rewards, want_cr.numpy(), atol=1e-6)
    np.testing.assert_allclose(out.rejected_rewards, want_rr.numpy(), atol=1e-6)


def test_sft_loss_matches_torch_ce():
    logits, labels = _rand_batch(seed=3)
    want = F.cross_entropy(
        logits[:, :-1].reshape(-1, logits.shape[-1]),
        labels[:, 1:].reshape(-1),
        ignore_index=LABEL_PAD,
    ).numpy()
    got = sft_loss(jnp.asarray(logits.numpy()), jnp.asarray(labels.numpy()))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_rm_loss():
    c = jnp.asarray([1.0, 2.0]); r = jnp.asarray([0.5, 3.0])
    want = -np.mean(np.log(1 / (1 + np.exp(-(np.array(c) - np.array(r))))))
    np.testing.assert_allclose(rm_loss(c, r), want, atol=1e-6)


def _load_reference_diff_lib():
    spec = importlib.util.spec_from_file_location(
        "ref_diff_lib", "/root/reference/src/vlrlhf/utils/diff_lib.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_diff_ids_match_reference(seed):
    ref = _load_reference_diff_lib()
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 50, size=40).tolist()
    b = list(base)
    # random substitutions / insertions / deletions
    for _ in range(rng.integers(1, 6)):
        op = rng.integers(0, 3)
        i = int(rng.integers(0, len(b)))
        if op == 0:
            b[i] = int(rng.integers(50, 60))
        elif op == 1:
            b.insert(i, int(rng.integers(50, 60)))
        elif len(b) > 2:
            del b[i]
    want = ref.get_diff_ids(base, b, min_match_size=3)
    got = get_diff_ids(base, b, min_match_size=3)
    assert got == tuple(want) or list(got) == list(want)


def test_diff_masks_substitution_only():
    # Pure insertion on one side must NOT mark tokens (both-non-empty rule).
    a = [1, 2, 3, 4, 5, 6, 7, 8]
    b = [1, 2, 3, 4, 99, 5, 6, 7, 8]
    ca, cb = get_diff_ids(a, b)
    assert ca == [] and cb == []
    # Substitution marks both sides.
    c = [1, 2, 3, 4, 77, 6, 7, 8]
    ca, cc = get_diff_ids(a, c)
    assert ca == [4] and cc == [4]


def test_diff_masks_respect_label_pad():
    chosen = [-100, -100, 5, 6, 7, 9]
    rejected = [-100, -100, 5, 6, 8, 9]
    cm, rm = diff_masks(chosen, rejected, min_match_size=1)
    assert not cm[0] and not cm[1]
    assert cm[4] and rm[4]
    assert not cm[2] and not rm[3]
