"""Multi-host bring-up: 2 real processes on localhost (CPU backend).

The TPU-native equivalent of the reference's ``init_distributed_mode``
(``utils/utils.py:104-143``) is ``ppt_tpu.parallel.init_multihost`` —
``jax.distributed.initialize`` from env-discovered coordinator config.
This test spawns two actual OS processes that each see ONE local CPU
device, form a 2-device global mesh, stride the loader by process
index, and compute a psum-reduced global loss — asserting (a) disjoint
full coverage of the global batch and (b) identical loss on both ranks.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r"""
import json, os, sys
import jax
jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
except Exception:
    pass

from ppt_tpu.parallel import init_multihost

class Args: pass
args = Args()
distributed = init_multihost(args)
assert distributed, "expected 2-process bring-up"
assert jax.process_count() == 2
assert len(jax.devices()) == 2  # global device view spans both hosts

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from ppt_tpu.data.datasets import ArrayDataset
from ppt_tpu.data.loader import Loader

# deterministic tiny dataset, identical on both ranks
pts = np.arange(8, dtype=np.float32).reshape(8, 1, 1).repeat(4, 1)
ds = ArrayDataset(points=pts, labels=np.arange(8, dtype=np.int32),
                  classnames=["a"], name="toy")
loader = Loader(ds, batch_size=4, shuffle=False, drop_last=True)
batch = next(iter(loader))
local_labels = sorted(int(x) for x in batch["label"])

# global mesh over both processes' devices; psum-reduced "loss"
mesh = Mesh(np.asarray(jax.devices()), ("data",))
from jax.experimental import multihost_utils
global_labels = multihost_utils.process_allgather(
    jnp.asarray(local_labels, jnp.int32)
)
local_sum = jnp.sum(jnp.asarray(batch["label"], jnp.float32))
global_loss = float(multihost_utils.process_allgather(local_sum).sum())

print(json.dumps({
    "rank": jax.process_index(),
    "local": local_labels,
    "global_labels": np.asarray(global_labels).reshape(-1).tolist(),
    "loss": global_loss,
}), flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_cpu_bringup(tmp_path):
    port = _free_port()
    procs = []
    for rank in range(2):
        env = dict(
            os.environ,
            PPT_COORDINATOR=f"localhost:{port}",
            PPT_NUM_PROCESSES="2",
            PPT_PROCESS_ID=str(rank),
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=1",
        )
        env.pop("JAX_NUM_CPU_DEVICES", None)
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", _WORKER],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            )
        )
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost worker timed out")
        assert p.returncode == 0, err.decode()[-2000:]
        line = [l for l in out.decode().splitlines() if l.startswith("{")][-1]
        outs.append(json.loads(line))

    r0, r1 = sorted(outs, key=lambda o: o["rank"])
    # (a) the two ranks' loader shards are disjoint and cover the batch
    assert not set(r0["local"]) & set(r1["local"])
    assert sorted(r0["local"] + r1["local"]) == sorted(r0["global_labels"])
    # (b) the reduced global loss is identical on both ranks
    assert r0["loss"] == r1["loss"] == float(sum(r0["global_labels"]))


def test_first_slurm_node_expansion():
    """Compressed SLURM nodelists must resolve to a real first hostname
    (reference parity: the reference shells out to `scontrol show
    hostnames`; utils/utils.py:130-132)."""
    from ppt_tpu.parallel.mesh import _first_slurm_node

    assert _first_slurm_node("tpu-host001") == "tpu-host001"
    assert _first_slurm_node("nodeA,nodeB") == "nodeA"
    assert _first_slurm_node("node[01-04]") == "node01"
    assert _first_slurm_node("node[01-04,07],other") == "node01"
    assert _first_slurm_node("node[3,5]") == "node3"
    assert _first_slurm_node("a[1-2],b[3-4]") == "a1"
    assert _first_slurm_node("") == ""
