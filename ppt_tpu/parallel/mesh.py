"""Device mesh + sharding helpers: the framework's distributed backend.

Replaces the reference's NCCL/torch.distributed layer (``utils/utils.py:
104-250``): instead of explicit process groups, hand-written all-reduce
wrappers and a differentiable GatherLayer, the framework runs
single-controller JAX over a ``jax.sharding.Mesh``. Batches are sharded
over the ``data`` axis; parameters are replicated; XLA inserts the psum
for gradient reduction over ICI, and every collective is differentiable
by construction.

The reference's rank plumbing maps as:
  RANK / WORLD_SIZE env parsing     -> jax.process_index()/process_count()
  dist.all_reduce on metric meters  -> jnp sums over the sharded batch
  GatherLayer (diff. all_gather)    -> jax.lax.all_gather (has transpose)
  DistributedSampler                -> per-host slicing in the data loader

Scaling axes beyond data parallelism (tensor/pipeline/sequence/expert) are
not required for PPT parity (SURVEY.md §2.4) but the mesh is created with
named axes so they can be added without restructuring.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(
    n_devices: Optional[int] = None,
    axis_names: Sequence[str] = ("data",),
    shape: Optional[Sequence[int]] = None,
    batch_size: Optional[int] = None,
) -> Mesh:
    """1-D (or reshaped) device mesh over the available devices.

    With ``batch_size``, the data axis shrinks to the largest device
    count that divides the (global) batch, so small-batch runs don't
    fail sharding-divisibility checks.
    """
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    if batch_size is not None:
        n = len(devices)
        while n > 1 and batch_size % n != 0:
            n -= 1
        devices = devices[:n]
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names)


def data_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Sharding that splits the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(axis))


def shard_batch(batch: Any, mesh: Mesh, axis: str = "data") -> Any:
    """Place a host batch on the mesh, batch-dim sharded over ``axis``."""
    sharding = data_sharding(mesh, axis)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Fully replicate a pytree (params/state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree
    )
