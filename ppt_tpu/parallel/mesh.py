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

import logging
import os
from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

log = logging.getLogger(__name__)


def _first_slurm_node(nodelist: str) -> str:
    """First hostname of a SLURM nodelist, expanding the compressed
    bracket form: ``'node[01-04,07],other'`` -> ``'node01'`` (the
    reference resolves the coordinator the same way via
    ``scontrol show hostnames``; this avoids shelling out)."""
    if not nodelist:
        return ""
    # first top-level element (commas inside [...] are range separators)
    depth, head = 0, nodelist
    for i, ch in enumerate(nodelist):
        if ch == "[":
            depth += 1
        elif ch == "]":
            depth -= 1
        elif ch == "," and depth == 0:
            head = nodelist[:i]
            break
    if "[" not in head:
        return head
    prefix, rest = head.split("[", 1)
    spec = rest.split("]", 1)[0].split(",")[0]  # first range/id in brackets
    first = spec.split("-", 1)[0]
    return prefix + first


def init_multihost(args=None) -> bool:
    """Multi-host (pod-slice) process bring-up.

    The TPU-native equivalent of the reference's
    ``init_distributed_mode`` (``utils/utils.py:104-143``: env:// RANK/
    WORLD_SIZE parsing + SLURM detection + NCCL process group): here
    the process group is ``jax.distributed.initialize``, after which
    ``jax.devices()`` spans the whole slice, GSPMD handles every
    collective over ICI/DCN, and ``create_mesh`` builds the global mesh.

    Coordinator discovery, in precedence order:
      1. explicit env: ``PPT_COORDINATOR`` (+ ``PPT_NUM_PROCESSES``,
         ``PPT_PROCESS_ID``) — the env:// equivalent;
      2. torchrun-style env: ``MASTER_ADDR``/``MASTER_PORT`` +
         ``WORLD_SIZE``/``RANK`` (reference parity, utils.py:126-129);
      3. SLURM: ``SLURM_PROCID``/``SLURM_NTASKS`` + first node of
         ``SLURM_STEP_NODELIST`` (reference parity, utils.py:130-132);
      4. TPU metadata: bare ``jax.distributed.initialize()`` —
         Cloud TPU pod slices self-discover.

    Returns True when running distributed (process_count > 1 after
    init), False for single-process runs ("Not using distributed
    mode"). Idempotent: re-initialization errors are swallowed.
    Mirrors the reference's rank fields onto ``args`` when given
    (``args.rank`` / ``args.world_size`` / ``args.distributed``).
    """
    kwargs = {}
    env = os.environ
    if "PPT_COORDINATOR" in env:
        kwargs = dict(
            coordinator_address=env["PPT_COORDINATOR"],
            num_processes=int(env.get("PPT_NUM_PROCESSES", "1")),
            process_id=int(env.get("PPT_PROCESS_ID", "0")),
        )
    elif "MASTER_ADDR" in env and "WORLD_SIZE" in env:
        kwargs = dict(
            coordinator_address=(
                f"{env['MASTER_ADDR']}:{env.get('MASTER_PORT', '12355')}"
            ),
            num_processes=int(env["WORLD_SIZE"]),
            process_id=int(env.get("RANK", "0")),
        )
    elif "SLURM_PROCID" in env and "SLURM_NTASKS" in env:
        nodelist = env.get("SLURM_STEP_NODELIST", env.get("SLURM_NODELIST", ""))
        first = _first_slurm_node(nodelist) or "localhost"
        port = env.get("PPT_COORDINATOR_PORT", "12355")
        kwargs = dict(
            coordinator_address=f"{first}:{port}",
            num_processes=int(env["SLURM_NTASKS"]),
            process_id=int(env["SLURM_PROCID"]),
        )
    elif len(env.get("TPU_WORKER_HOSTNAMES", "").split(",")) > 1:
        pass  # multi-host pod slice: bare initialize() self-discovers
    else:
        if args is not None:
            args.distributed = False
        log.info("init_multihost: no coordinator config — single process")
        return False

    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as e:  # already initialized (idempotence)
        # jax <=0.4 says "already initialized"; jax 0.9 says
        # "distributed.initialize should only be called once."
        msg = str(e).lower()
        if ("already initialized" not in msg
                and "should only be called once" not in msg):
            raise
    except ValueError as e:
        # metadata discovery unavailable (e.g. tunneled single-chip TPU
        # without pod metadata) — bring-up must never break single-host
        if args is not None:
            args.distributed = False
        log.warning("init_multihost: %s — continuing single process", e)
        return False
    distributed = jax.process_count() > 1
    if args is not None:
        args.rank = jax.process_index()
        args.world_size = jax.process_count()
        args.distributed = distributed
    log.info(
        "init_multihost: process %d/%d, %d global devices",
        jax.process_index(), jax.process_count(), len(jax.devices()),
    )
    return distributed


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
