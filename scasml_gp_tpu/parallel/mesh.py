"""Device meshes and sharding helpers.

New capability relative to the reference, which is strictly single-device
(SURVEY.md §2 X1/X2: no pmap/pjit/shard/psum anywhere).  The workload has two
natural parallel axes:

- ``data``  — the (test batch x MC sample) axis of the Picard rollouts:
  embarrassingly parallel, each chip rolls out its batch shard and the only
  collectives are the implicit ones XLA inserts for the final gather;
- ``model`` — the training-point axis of the GP: Gram rows / posterior
  cross-kernel columns are sharded for large N_domain, with psum-style
  reductions over the contraction.

Shardings are expressed with ``jax.sharding.NamedSharding`` and GSPMD
partitioning (jit in/out shardings + ``with_sharding_constraint``), so the
same code runs on 1 chip, an ICI-connected slice, or (with
``jax.distributed.initialize``) a multi-host pod.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data: int = -1, model: int = 1, devices: Optional[Sequence] = None
) -> Mesh:
    """2-D ('data', 'model') mesh. data=-1 uses all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        if n % model:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model > n:
        raise ValueError(f"mesh {data}x{model} needs {data*model} > {n} devices")
    devs = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(devs, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the 'data' mesh axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def train_point_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (training point) axis over the 'model' mesh axis."""
    return NamedSharding(mesh, P("model"))


def shard_batch(x: jax.Array, mesh: Mesh) -> jax.Array:
    """Place a batch array with its leading axis sharded over 'data'."""
    return jax.device_put(x, batch_sharding(mesh))


def pad_to_multiple(x: jax.Array, multiple: int, axis: int = 0):
    """Pad axis to a multiple (required for even sharding); returns (padded, n)."""
    import jax.numpy as jnp

    n = x.shape[axis]
    pad = (-n) % multiple
    if pad == 0:
        return x, n
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths), n


def initialize_distributed(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host initialization (jax.distributed). No-op for single process."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
