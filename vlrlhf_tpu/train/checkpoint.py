"""Checkpointing: orbax async save/restore of sharded pytrees.

Replaces the reference's entire save stack — HF Trainer checkpoints,
PeftSavingCallback (dpo.py:89-95), ZeRO-3 gather-and-consolidate
(utils/common.py:90-121) and the vendored zero_to_fp32.py: orbax writes each
shard from its host and restores with resharding, so there is no
consolidation step at all. Adapters are a separate item, so LoRA-only
checkpoints (the reference's PeftSavingCallback behavior) are the default.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

PyTree = Any


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, create=True, enable_async_checkpointing=True
        )
        self._mgr = ocp.CheckpointManager(self.directory, options=options)

    def save(
        self,
        step: int,
        state: PyTree,
        extra: Optional[dict] = None,
    ) -> None:
        """state = TrainState-like pytree (adapters/opt_state/step)."""
        items = {"state": ocp.args.StandardSave(state)}
        if extra:
            items["extra"] = ocp.args.JsonSave(extra)
        self._mgr.save(step, args=ocp.args.Composite(**items))

    def restore(
        self,
        step: Optional[int] = None,
        template: Optional[PyTree] = None,
    ) -> tuple[PyTree, Optional[dict]]:
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"No checkpoint in {self.directory}")
        if template is not None:
            args = ocp.args.Composite(
                state=ocp.args.StandardRestore(template)
            )
        else:
            args = ocp.args.Composite(state=ocp.args.StandardRestore())
        out = self._mgr.restore(step, args=args)
        extra = None
        try:
            extra_out = self._mgr.restore(
                step, args=ocp.args.Composite(extra=ocp.args.JsonRestore())
            )
            extra = extra_out.get("extra")
        except Exception:
            pass
        return out["state"], extra

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def wait(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.close()


def save_params(path: str, params: PyTree) -> None:
    """One-shot full-model save (merged export, RM final save, etc.)."""
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), params, force=True)
    ckptr.wait_until_finished()


def load_params(path: str, template: Optional[PyTree] = None) -> PyTree:
    ckptr = ocp.StandardCheckpointer()
    if template is not None:
        return ckptr.restore(os.path.abspath(path), template)
    return ckptr.restore(os.path.abspath(path))
