"""Generic training loop driver.

Replaces the HF Trainer loop the reference inherits (SURVEY.md §3.1): python
drives data -> collate -> device step; everything heavy is inside the jitted
step. The collator runs for the NEXT batch while the device executes the
current one (dispatch is async), giving host/device overlap without a
separate prefetch thread; a background-thread loader can be swapped in via
`iterator_factory`.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Iterable, Optional, Sequence

import jax
import numpy as np

PyTree = Any


@dataclasses.dataclass
class LoopConfig:
    num_epochs: float = 1.0
    max_steps: int = 0  # 0 = derive from epochs
    per_device_batch_size: int = 4
    global_batch_size: int = 0  # 0 = per_device * n_devices (data-parallel)
    logging_steps: int = 10
    save_steps: int = 500
    seed: int = 42
    shuffle: bool = True
    drop_last: bool = True


def batch_iterator(
    rows: Sequence[dict],
    tokenize_fn: Callable[[dict], dict],
    collate_fn: Callable[[list[dict]], dict],
    batch_size: int,
    num_epochs: float,
    seed: int = 42,
    shuffle: bool = True,
    drop_last: bool = True,
    global_batch_size: int = 0,
    process_slice: Optional[tuple] = None,
) -> Iterable[dict]:
    """Tokenize lazily per batch (the reference pre-tokenizes the whole
    dataset with dataset.map; lazy keeps startup instant and memory flat).

    Multi-process: every process draws the SAME permutation (same seed) over
    the full row list, forms global batches of `global_batch_size` indices,
    and collates only its `process_slice` = (lo, hi) of each — so the union
    of local batches is exactly the single-process global batch (the
    reference's per-rank dataloader shards, accelerate zero2.yaml:6-8, but
    with global-batch semantics identical to one process)."""
    n = len(rows)
    g = global_batch_size or batch_size
    lo, hi = process_slice if process_slice is not None else (0, batch_size)
    assert hi - lo == batch_size, (
        f"process_slice {process_slice} must cover batch_size {batch_size}"
    )
    if g != batch_size and not drop_last:
        raise ValueError(
            "multi-process batching requires drop_last: a short final global "
            "batch cannot be split into equal per-process shards"
        )
    emitted_epochs = 0.0
    rng = np.random.default_rng(seed)
    while emitted_epochs < num_epochs:
        order = rng.permutation(n) if shuffle else np.arange(n)
        for start in range(0, n, g):
            idx = order[start : start + g]
            if len(idx) < g and drop_last:
                continue
            local = idx[lo:hi]
            yield collate_fn([tokenize_fn(rows[int(i)]) for i in local])
            emitted_epochs += g / n
            if emitted_epochs >= num_epochs:
                return


class PreemptionGuard:
    """SIGTERM -> finish the current step, checkpoint, stop cleanly.

    TPU pods are preemptible; the resource manager sends SIGTERM with a
    grace window (the reference has nothing here — a killed rank loses
    everything since the last --save_steps checkpoint,
    SURVEY.md §5 failure/elastic: 'a crashed rank kills the job'). Every
    process of a multi-host job receives the signal, so they all reach
    the same save step and the orbax save stays collective-aligned.
    Installation is a no-op off the main thread (signal module rules).
    """

    def __init__(self):
        self.flag = False
        self._prev = None
        self._installed = False

    def install(self) -> "PreemptionGuard":
        import signal as _signal

        def _on(signum, frame):
            self.flag = True

        try:
            self._prev = _signal.signal(_signal.SIGTERM, _on)
            self._installed = True
        except ValueError:  # non-main thread
            pass
        return self

    def uninstall(self):
        if self._installed:
            import signal as _signal

            _signal.signal(_signal.SIGTERM, self._prev)
            self._installed = False


def run_training(
    step_fn: Callable,  # (state, base_params, batch) -> (state, metrics)
    state: PyTree,
    base_params: PyTree,
    batches: Iterable[dict],
    logger=None,
    checkpoint_manager=None,
    save_steps: int = 500,
    logging_steps: int = 10,
    max_steps: int = 0,
    batch_sharding=None,
    start_step: int = 0,
    on_step: Optional[Callable] = None,  # (step_idx, metrics, state)
    concat_pairs: bool = False,
    handle_preemption: bool = True,
) -> PyTree:
    """Drive the jitted step over batches; returns the final state.

    concat_pairs: set for DPO/RM ([chosen; rejected] concat batches) so
    multi-process assembly preserves the first-half/second-half layout
    (core/dist.make_global_batch)."""
    from vlrlhf_tpu.core.dist import make_global_batch

    guard = PreemptionGuard().install() if handle_preemption else None
    last_saved = -1

    def _ckpt(step_idx, state):
        nonlocal last_saved
        if checkpoint_manager is not None and step_idx != last_saved:
            checkpoint_manager.save(
                step_idx,
                {
                    "trainable": state.trainable,
                    "opt_state": state.opt_state,
                    "step": state.step,
                },
            )
            last_saved = step_idx

    step_idx = start_step
    pending_metrics = None
    interval_tokens = 0
    interval_images = 0
    for batch in batches:
        if batch_sharding is not None:
            batch = make_global_batch(
                batch, batch_sharding, concat_pairs=concat_pairs
            )
        state, metrics = step_fn(state, base_params, batch)
        step_idx += 1
        ids = batch.get("input_ids")
        if ids is not None:
            interval_tokens += int(np.prod(ids.shape))
        pv = batch.get("pixel_values")
        if pv is not None:
            interval_images += int(np.prod(pv.shape[:2]))
        if logger is not None and step_idx % logging_steps == 0:
            # one host sync per logging interval, not per step
            host_metrics = {k: float(v) for k, v in metrics.items()}
            host_metrics["perf/interval_tokens"] = interval_tokens
            host_metrics["perf/interval_images"] = interval_images
            interval_tokens = interval_images = 0
            logger.log(step_idx, host_metrics)
        if on_step is not None:
            on_step(step_idx, metrics, state)
        if step_idx % save_steps == 0:
            _ckpt(step_idx, state)
        if guard is not None and guard.flag:
            # preempted: save at this step boundary and stop; the run
            # resumes from here via --resume_from_checkpoint (bit-exact
            # resume is already tested for the periodic path)
            _ckpt(step_idx, state)
            if checkpoint_manager is not None:
                checkpoint_manager.wait()
            if logger is not None:
                logger.log(step_idx, {"train/preempted": 1.0})
            print(f"preempted: checkpoint saved at step {step_idx}")
            break
        if max_steps and step_idx >= max_steps:
            break
        pending_metrics = metrics
    del pending_metrics
    if guard is not None:
        guard.uninstall()
    return state


def prefetch_iterator(it: Iterable[dict], depth: int = 2) -> Iterable[dict]:
    """Run the upstream iterator (tokenize+collate+image decode) in a
    background thread so host data work overlaps device steps. The native
    image loader releases the GIL in its C++ thread pool, so this overlaps
    for real on multi-core hosts."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    sentinel = object()
    err: list[BaseException] = []

    def worker():
        try:
            for item in it:
                q.put(item)
        except BaseException as e:  # propagate into the consumer
            err.append(e)
        finally:
            q.put(sentinel)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is sentinel:
            if err:
                raise err[0]
            return
        yield item
