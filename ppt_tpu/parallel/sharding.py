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


# Exact module-name rules (matched on path COMPONENTS, not substrings —
# a rename of an unrelated module can't silently change the layout).
# Column-parallel shards the output dim; its paired row-parallel module
# shards the input dim so GSPMD places one all-reduce per block.
_COLUMN_PARALLEL = {
    "in_proj": None,  # CLIP text attention fused qkv (any parent)
    "qkv": "attn",  # ViT attention, only under an attn module
    "c_fc": None,  # CLIP MLP up-projection
    "fc1": "mlp",  # ViT MLP up-projection, only inside mlp blocks
}
_ROW_PARALLEL = {
    "out_proj": None,
    "proj": "attn",  # ViT attention output proj only (NOT pc/text proj)
    "c_proj": None,
    "fc2": "mlp",
}


def _matches(rules: Dict[str, Any], module: str, parent: str) -> bool:
    want_parent = rules.get(module, "missing")
    if want_parent == "missing":
        return False
    return want_parent is None or parent == want_parent


def ulip_param_spec(path: Tuple[str, ...], leaf) -> P:
    """PartitionSpec for one parameter leaf under ('data', 'model')."""
    name = path[-1]
    if name == "embedding" and leaf.ndim == 2:
        return P(None, "model")  # token embedding: feature dim sharded
    if name != "kernel" or leaf.ndim != 2:
        return P()  # biases, norms, scalars, prompt tokens: replicated
    module = path[-2] if len(path) >= 2 else ""
    parent = path[-3] if len(path) >= 3 else ""
    if _matches(_COLUMN_PARALLEL, module, parent):
        return P(None, "model")
    if _matches(_ROW_PARALLEL, module, parent):
        return P("model", None)
    return P()


def shard_params(params: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Place a param tree on the mesh per :func:`ulip_param_spec`."""
    flat = traverse_util.flatten_dict(params)
    out = {}
    for path, leaf in flat.items():
        spec = ulip_param_spec(path, leaf) if "model" in mesh.axis_names else P()
        out[path] = jax.device_put(leaf, NamedSharding(mesh, spec))
    return traverse_util.unflatten_dict(out)
