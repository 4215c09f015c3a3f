"""Multi-host distribution utilities.

Replaces the reference's accelerate process-group bootstrap and its host-level
collectives (SURVEY.md §2.4):
  accelerate launch spawn        -> jax.distributed.initialize (one process
                                    per host; libtpu owns ICI/DCN transport)
  gather_object / gather_for_metrics
  (base/trainer.py:479, eval/utils.py:76) -> process_allgather
  PartialState().local_main_process_first()
  (utils/data.py:74)             -> main_process_first context
"""

from __future__ import annotations

import contextlib
import os
from typing import Any, Optional

import jax


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize multi-host JAX. No-ops on single-host (TPU metadata supplies
    everything on Cloud TPU pods; explicit args support manual clusters)."""
    if jax.process_count() > 1:
        return  # already initialized
    env_addr = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if env_addr is None and num_processes is None:
        return  # single host
    jax.distributed.initialize(
        coordinator_address=env_addr,
        num_processes=num_processes,
        process_id=process_id,
    )


def is_main_process() -> bool:
    return jax.process_index() == 0


def process_allgather(x: Any) -> Any:
    """Host-level allgather (eval results, skip-batch consensus)."""
    if jax.process_count() == 1:
        return x
    from jax.experimental import multihost_utils

    return multihost_utils.process_allgather(x)


def sync_global_devices(name: str = "barrier") -> None:
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)


def gather_objects(objs: list) -> list:
    """Multi-host gather of arbitrary JSON-serializable objects (eval result
    rows contain STRINGS — multihost_utils.process_allgather handles array
    pytrees only, so round 1's direct call would have failed on real
    multi-process runs).

    Mechanism: JSON-encode the local shard to a uint8 buffer, allgather
    (after agreeing on the max length), decode every process's shard and
    concatenate in process order. shard_rows_for_process hands out contiguous
    shards by process index, so concatenation restores dataset order — the
    reference's gather_for_metrics ordering contract (eval/utils.py:76-77).
    """
    if jax.process_count() == 1:
        return list(objs)
    import json

    import numpy as np
    from jax.experimental import multihost_utils

    def _default(o):
        if hasattr(o, "item"):
            return o.item()
        return str(o)

    payload = json.dumps(objs, default=_default).encode()
    local_len = np.asarray([len(payload)], np.int64)
    lens = np.asarray(
        multihost_utils.process_allgather(local_len)
    ).reshape(-1)
    buf = np.zeros((int(lens.max()),), np.uint8)
    buf[: len(payload)] = np.frombuffer(payload, np.uint8)
    all_bufs = np.asarray(multihost_utils.process_allgather(buf))
    out: list = []
    for i in range(jax.process_count()):
        out.extend(json.loads(bytes(all_bufs[i, : int(lens[i])]).decode()))
    return out


def batch_process_span(sharding) -> tuple:
    """Fraction (lo, hi) of the batch dimension covered by THIS process's
    addressable devices under `sharding`, as a pair of Fractions.

    Drives per-process dataloading: with the batch dim sharded over
    ('data','fsdp') and replicated over 'model', processes holding replica
    devices get the same span (and must feed identical rows — the
    make_array_from_process_local_data replica contract)."""
    from fractions import Fraction

    probe = sharding.mesh.size
    idx_map = sharding.addressable_devices_indices_map((probe,))
    starts, stops = [], []
    for sl in idx_map.values():
        s = sl[0]
        starts.append(s.start or 0)
        stops.append(probe if s.stop is None else s.stop)
    return Fraction(min(starts), probe), Fraction(max(stops), probe)


_CONCAT_CACHE: dict = {}


def _sharded_concat(a, b, sharding):
    """Device-side concat of two global arrays along dim 0, output resharded
    to `sharding` (ICI traffic; tiny next to the model forward)."""
    import jax.numpy as jnp

    fn = _CONCAT_CACHE.get(sharding)
    if fn is None:
        fn = jax.jit(
            lambda x, y: jnp.concatenate([x, y], axis=0),
            out_shardings=sharding,
        )
        _CONCAT_CACHE[sharding] = fn
    return fn(a, b)


def make_global_batch(batch: dict, sharding, concat_pairs: bool = False) -> dict:
    """Per-process host batch slices -> global device arrays.

    Single-process: plain device_put (round-2 behavior). Multi-process: each
    process passes only its LOCAL rows and
    jax.make_array_from_process_local_data assembles the global batch across
    non-addressable devices — the TPU equivalent of the reference's per-rank
    accelerate dataloader shards (accelerate_config/zero2.yaml:6-8).

    concat_pairs: DPO/RM batches are [chosen; rejected] concatenated
    host-side. Naive per-process assembly would block-interleave
    [c0;r0;c1;r1] and break the step's first-half/second-half split, so
    2B-row leaves are assembled as two global halves (process order) and
    concatenated on device into [all chosen; all rejected]; B-row leaves
    (pixel_values, ref logps, qformer ids) assemble directly, keeping
    chosen[i] <-> pixel[i] <-> rejected[i] row pairing.

    `sharding` is a NamedSharding, or a callable (key, leaf) -> NamedSharding
    for per-leaf layouts (sequence-parallel steps shard (B, S) leaves'
    sequence dim — core/partitioning.sp_batch_spec).
    """
    import numpy as np

    def leaf_sharding(k, v):
        return sharding(k, v) if callable(sharding) else sharding

    if jax.process_count() == 1:
        return {
            k: jax.device_put(v, leaf_sharding(k, v)) for k, v in batch.items()
        }
    local_pairs = (
        batch["input_ids"].shape[0] // 2 if concat_pairs else None
    )

    def put(k, x):
        x = np.asarray(x)
        sh = leaf_sharding(k, x)
        if concat_pairs and x.shape[0] == 2 * local_pairs:
            c = jax.make_array_from_process_local_data(
                sh, np.ascontiguousarray(x[:local_pairs])
            )
            r = jax.make_array_from_process_local_data(
                sh, np.ascontiguousarray(x[local_pairs:])
            )
            return _sharded_concat(c, r, sh)
        return jax.make_array_from_process_local_data(sh, x)

    return {k: put(k, v) for k, v in batch.items()}


def replicate_1d_to_host(x):
    """Fetch a small batch-dim-sharded global array (e.g. per-row logps) to
    every host as numpy, regardless of which process holds which shard."""
    import numpy as np

    if jax.process_count() == 1 or getattr(x, "is_fully_addressable", True):
        return np.asarray(x)
    parts = []
    for s in x.addressable_shards:
        sl = s.index[0]
        parts.append(
            [int(sl.start or 0), np.asarray(s.data, np.float64).tolist()]
        )
    out = np.zeros(x.shape, np.float64)
    for start, vals in gather_objects(parts):
        arr = np.asarray(vals)
        out[start : start + arr.shape[0]] = arr
    return out


def any_process_failed(local_fail: bool) -> bool:
    """Skip-batch consensus: True iff ANY process hit a failure this step —
    every rank then skips the same batch, keeping collectives aligned (the
    reference's gather_object vote, base/trainer.py:462-482)."""
    import numpy as np

    if jax.process_count() == 1:
        return bool(local_fail)
    flags = process_allgather(np.asarray([int(local_fail)], np.int32))
    return bool(np.asarray(flags).sum() > 0)


@contextlib.contextmanager
def main_process_first(name: str = "main_first"):
    """Rank-0 runs the body first (dataset cache builds), others wait —
    the reference's local_main_process_first barrier."""
    if is_main_process():
        yield
        sync_global_devices(f"{name}_done")
    else:
        sync_global_devices(f"{name}_done")
        yield


@contextlib.contextmanager
def profiler_trace(log_dir: Optional[str], enabled: bool = True):
    """jax.profiler trace scope — per-step tokens/sec + MFU live in
    train/metrics.py; this captures full XLA traces for deep dives
    (tensorboard-plugin-profile reads log_dir)."""
    if not enabled or not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
