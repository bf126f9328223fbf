"""Parameter sharding rules: tensor parallelism over a 'model' mesh axis.

PPT itself needs only data parallelism (SURVEY.md §2.4) — its largest
tower is ~63M params — but the framework is built for meshes with named
axes, and these rules give it a real Megatron-style TP layout for scaled
variants (PointNeXt-XL, longer prompt sets, bigger text towers):

  - attention QKV / ViT qkv kernels: output (head) dim sharded -> each
    model-shard computes its head slice; the out/proj kernel shards its
    input dim, and GSPMD inserts the all-reduce after the projection;
  - MLP fc1/c_fc kernels: hidden dim sharded; fc2/c_proj input dim
    sharded -> one all-reduce per block;
  - token embedding: feature dim sharded (gather stays local).

Everything else (norms, biases, prompt tokens, projections) replicates.
Applying the rules is just a ``device_put`` with ``NamedSharding``s;
GSPMD propagates activation shardings and places collectives on ICI.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
from flax import traverse_util
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def ulip_param_spec(path: Tuple[str, ...], leaf) -> P:
    """PartitionSpec for one parameter leaf under ('data', 'model')."""
    name = path[-1]
    joined = "/".join(path)
    if name != "kernel" and name != "embedding":
        return P()  # biases, norms, scalars, prompt tokens: replicated
    if leaf.ndim != 2:
        return P()
    # column-parallel (output dim sharded)
    if any(tag in joined for tag in ("in_proj", "qkv", "c_fc", "mlp/fc1")):
        return P(None, "model")
    # row-parallel (input dim sharded; GSPMD adds the all-reduce)
    if any(tag in joined for tag in ("out_proj", "attn/proj", "c_proj", "mlp/fc2")):
        return P("model", None)
    if name == "embedding":
        return P(None, "model")
    return P()


def shard_params(params: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Place a param tree on the mesh per :func:`ulip_param_spec`."""
    flat = traverse_util.flatten_dict(params)
    out = {}
    for path, leaf in flat.items():
        spec = ulip_param_spec(path, leaf) if "model" in mesh.axis_names else P()
        out[path] = jax.device_put(leaf, NamedSharding(mesh, spec))
    return traverse_util.unflatten_dict(out)
