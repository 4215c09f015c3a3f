"""Preemption-safe training: SIGTERM -> checkpoint at the step boundary ->
clean stop (train/loop.py PreemptionGuard). The reference has nothing here
(SURVEY.md §5: static world, a killed rank loses everything since the last
save)."""

import os
import signal

import numpy as np


class _FakeState:
    def __init__(self, step=0):
        self.step = step
        self.trainable = {"w": np.zeros(1)}
        self.opt_state = {}


class _FakeCkpt:
    def __init__(self):
        self.saved = {}
        self.waited = False

    def save(self, step, tree):
        self.saved[step] = tree

    def wait(self):
        self.waited = True


def test_sigterm_checkpoints_and_stops():
    from vlrlhf_tpu.train.loop import run_training

    ckpt = _FakeCkpt()
    steps_run = []

    def step_fn(state, params, batch):
        steps_run.append(batch["i"])
        return _FakeState(state.step + 1), {"loss": 0.5}

    def on_step(step_idx, metrics, state):
        if step_idx == 3:
            os.kill(os.getpid(), signal.SIGTERM)  # the preemption notice

    batches = ({"i": i} for i in range(100))
    state = run_training(
        step_fn, _FakeState(), {}, batches,
        checkpoint_manager=ckpt, save_steps=50, on_step=on_step,
    )
    # the handler set the flag during step 3's on_step; the loop saved at
    # that boundary and stopped — no step 4, no lost work
    assert steps_run == [0, 1, 2]
    assert list(ckpt.saved) == [3] and ckpt.waited
    assert state.step == 3
    # SIGTERM default disposition is restored afterwards
    assert signal.getsignal(signal.SIGTERM) == signal.SIG_DFL


def test_no_duplicate_save_when_boundary_aligns():
    """Preemption on a save_steps boundary saves once, not twice."""
    from vlrlhf_tpu.train.loop import run_training

    ckpt = _FakeCkpt()

    def step_fn(state, params, batch):
        return _FakeState(state.step + 1), {}

    def on_step(step_idx, metrics, state):
        if step_idx == 2:
            os.kill(os.getpid(), signal.SIGTERM)

    calls = []
    orig = ckpt.save

    def counting_save(step, tree):
        calls.append(step)
        orig(step, tree)

    ckpt.save = counting_save
    run_training(
        step_fn, _FakeState(), {}, ({"i": i} for i in range(10)),
        checkpoint_manager=ckpt, save_steps=2, on_step=on_step,
    )
    assert calls == [2]
