"""Checkpoint save/restore round trip, incl. resume-equals-continuous."""

import jax
import jax.numpy as jnp
import numpy as np

from tests.test_dpo_step import _setup, tiny_batch
from vlrlhf_tpu.train.checkpoint import CheckpointManager, load_params, save_params


def test_roundtrip_params(tmp_path):
    params = {"a": jnp.arange(8.0), "b": {"c": jnp.ones((2, 3), jnp.bfloat16)}}
    save_params(str(tmp_path / "p"), params)
    out = load_params(str(tmp_path / "p"))
    for x, y in zip(jax.tree.leaves(params), jax.tree.leaves(out)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_resume_matches_continuous(tmp_path):
    _, params, state, step, batch = _setup()
    mgr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=2)

    # 2 steps, save, 2 more steps -> loss trajectory A
    for _ in range(2):
        state, _ = step(state, params, batch)
    mgr.save(2, {"trainable": state.trainable, "opt_state": state.opt_state,
                 "step": state.step})
    mgr.wait()
    losses_cont = []
    for _ in range(2):
        state, m = step(state, params, batch)
        losses_cont.append(float(m["loss"]))

    # restore at step 2, run the same 2 steps -> must match exactly
    _, params2, state2, step2, _ = _setup()
    restored, _ = mgr.restore(
        2,
        template={"trainable": state2.trainable, "opt_state": state2.opt_state,
                  "step": state2.step},
    )
    from vlrlhf_tpu.train.train_state import TrainState

    state2 = TrainState(restored["step"], restored["trainable"],
                        restored["opt_state"])
    losses_resume = []
    for _ in range(2):
        state2, m = step2(state2, params2, batch)
        losses_resume.append(float(m["loss"]))
    np.testing.assert_allclose(losses_resume, losses_cont, rtol=1e-6)
    mgr.close()
