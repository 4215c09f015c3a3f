"""Device mesh construction.

The TPU replacement for the reference's accelerate/DeepSpeed process topology
(/root/reference/accelerate_config/{ddp,zero2,zero3}.yaml): a single
`jax.sharding.Mesh` with named axes

  data   — pure data parallelism (between slices: rides DCN)
  fsdp   — ZeRO-3-style parameter/optimizer sharding (rides ICI)
  model  — tensor parallelism for attention heads / MLP (rides ICI)
  pipe   — pipeline stages: decoder layers split into contiguous blocks,
           GPipe microbatches hop stages via ppermute (models/lm/pipeline.py)

ZeRO-2 == shard optimizer state on `fsdp` while replicating params; ZeRO-3 ==
shard params on `fsdp` too. Both fall out of the sharding rules rather than a
runtime (see core/partitioning.py).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Sequence

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh

AXES = ("data", "fsdp", "model", "pipe")

# The process-wide mesh, registered by make_mesh. Ops that need the physical
# Mesh object (shard_map users like ops/ring_attention) fetch it here — model
# configs stay plain data and forward functions stay mesh-agnostic.
_GLOBAL_MESH: Optional[Mesh] = None


def set_global_mesh(mesh: Mesh) -> Mesh:
    global _GLOBAL_MESH
    _GLOBAL_MESH = mesh
    return mesh


def get_global_mesh() -> Mesh:
    if _GLOBAL_MESH is None:
        raise RuntimeError(
            "No global mesh registered — call core.mesh.make_mesh() (or "
            "set_global_mesh) before using sequence-parallel attention."
        )
    return _GLOBAL_MESH


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Logical mesh shape. -1 axes absorb remaining devices (at most one)."""

    data: int = 1
    fsdp: int = -1
    model: int = 1
    pipe: int = 1  # pipeline stages (models/lm/pipeline.py); 1 = off

    def resolve(self, n_devices: int) -> tuple[int, int, int, int]:
        sizes = [self.data, self.fsdp, self.model, self.pipe]
        n_auto = sum(1 for s in sizes if s == -1)
        if n_auto > 1:
            raise ValueError(f"At most one mesh axis may be -1, got {sizes}")
        fixed = math.prod(s for s in sizes if s != -1)
        if n_auto == 1:
            if n_devices % fixed != 0:
                raise ValueError(
                    f"{n_devices} devices not divisible by fixed axes product {fixed}"
                )
            sizes = [n_devices // fixed if s == -1 else s for s in sizes]
        elif fixed > n_devices:
            raise ValueError(
                f"Mesh {sizes} needs {fixed} devices but {n_devices} are available"
            )
        # fixed < n_devices: use the first `fixed` devices (handled by caller)
        return tuple(sizes)


def make_mesh(
    config: MeshConfig | None = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a Mesh with (data, fsdp, model) axes over all (or given) devices.

    Uses mesh_utils.create_device_mesh so the `model` and `fsdp` axes map to
    physically adjacent chips (ICI neighbours) where possible.
    """
    config = config or MeshConfig()
    devices = list(devices if devices is not None else jax.devices())
    shape = config.resolve(len(devices))
    devices = devices[: math.prod(shape)]
    try:
        dev_mesh = mesh_utils.create_device_mesh(shape, devices=devices)
    except (ValueError, AssertionError):
        # Non-toroidal device counts (e.g. CPU simulation) — plain reshape.
        dev_mesh = np.asarray(devices).reshape(shape)
    return set_global_mesh(Mesh(dev_mesh, AXES))


def local_mesh(n: int | None = None) -> Mesh:
    """Mesh over the first n local devices with everything on `fsdp`."""
    devices = jax.devices()[: n or len(jax.devices())]
    return make_mesh(MeshConfig(data=1, fsdp=len(devices), model=1), devices)
