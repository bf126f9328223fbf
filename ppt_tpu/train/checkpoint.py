"""Checkpointing: best-only saves of the trainable partition + converters
for the reference's PyTorch ULIP/SLIP checkpoints.

Reference behavior (``main_cls.py:118-137``, ``utils/utils.py:97-101``):
rank-0 saves only the best checkpoint — prompt-learner state, optimizer
state, best accuracy and args; partseg additionally the whole point
encoder. Here the "trainable partition" generalizes that: whatever
:func:`ppt_tpu.models.trainable_mask` marked trainable is exactly what's
saved/restored, plus optimizer state and metadata.

Formats: flax msgpack (single file, no extra deps, works on any
filesystem). The torch ``.pt`` converters live in
``ppt_tpu/tools/ckpt_convert.py``; ``load_pretrained_backbones`` loads
their ``.msgpack`` outputs.
"""

from __future__ import annotations

import json
import logging
import os
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization, traverse_util

log = logging.getLogger(__name__)


def _to_host(tree):
    return jax.tree_util.tree_map(np.asarray, tree)


def save_checkpoint(directory: str, state, meta: Optional[Dict[str, Any]] = None):
    """Save trainable params + their optimizer state + batch stats."""
    os.makedirs(directory, exist_ok=True)
    payload = {
        "trainable": _to_host(state.trainable),
        "opt_state": _to_host(state.opt_state),
        "batch_stats": _to_host(state.batch_stats),
        "step": np.asarray(state.step),
    }
    with open(os.path.join(directory, "checkpoint_best.msgpack"), "wb") as f:
        f.write(serialization.to_bytes(payload))
    if meta is not None:
        with open(os.path.join(directory, "checkpoint_best.json"), "w") as f:
            json.dump(meta, f, indent=2, default=str)
    log.info("saved checkpoint to %s", directory)


def load_checkpoint(path: str, state):
    """Restore a saved trainable partition into a TrainState template."""
    if os.path.isdir(path):
        path = os.path.join(path, "checkpoint_best.msgpack")
    with open(path, "rb") as f:
        data = f.read()
    template = {
        "trainable": _to_host(state.trainable),
        "opt_state": _to_host(state.opt_state),
        "batch_stats": _to_host(state.batch_stats),
        "step": np.asarray(state.step),
    }
    payload = serialization.from_bytes(template, data)

    def _restore(template_tree, loaded_tree):
        return jax.tree_util.tree_map(
            lambda _, p: jax.numpy.asarray(p), template_tree, loaded_tree
        )

    return state.replace(
        trainable=_restore(state.trainable, payload["trainable"]),
        opt_state=_restore(state.opt_state, payload["opt_state"]),
        batch_stats=_restore(state.batch_stats, payload["batch_stats"]),
        step=jax.numpy.asarray(payload["step"]),
    )


def load_params_file(path: str) -> Dict[str, Any]:
    """Load a raw param tree saved by the ckpt converter (msgpack dict)."""
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def merge_pretrained(variables: Dict, pretrained: Dict, prefix: str = "") -> Dict:
    """Graft a pretrained param/batch-stats tree onto model variables.

    Leaves present in ``pretrained`` override the random init; everything
    else (prompt learner, heads absent from the ckpt) keeps its init —
    mirroring the reference's name-by-name copy with skips
    (``models/ULIP_models.py:472-507``).
    """
    out = {}
    for collection, tree in variables.items():
        if collection not in pretrained:
            out[collection] = tree
            continue
        flat_v = traverse_util.flatten_dict(tree)
        flat_p = traverse_util.flatten_dict(pretrained[collection])
        merged = {}
        n_loaded = 0
        for k, v in flat_v.items():
            if k in flat_p and flat_p[k].shape == tuple(v.shape):
                merged[k] = jax.numpy.asarray(flat_p[k], dtype=v.dtype)
                n_loaded += 1
            else:
                merged[k] = v
        log.info(
            "%s: loaded %d/%d leaves from pretrained", collection, n_loaded,
            len(flat_v),
        )
        out[collection] = traverse_util.unflatten_dict(merged)
    return out


def load_pretrained_backbones(args, variables: Dict) -> Dict:
    """Load converted point-encoder + SLIP text-tower weights.

    Expects ``{pretrained_dir}/<backbone>.msgpack`` and
    ``{pretrained_dir}/slip_text.msgpack`` produced by
    ``python -m ppt_tpu.tools.ckpt_convert`` from the reference ``.pt``
    files (``pointbert(_ulip2).pt``, ``slip_base_100ep.pt``, ...).
    """
    backbone_files = {
        "ULIP_PointBERT": "pointbert_ulip2" if args.ulip2 else "pointbert",
        "ULIP_PointBERT_partseg": "pointbert_ulip2" if args.ulip2 else "pointbert",
        "ULIP_PN_SSG": "pointnet2_ssg",
        "ULIP_PN_MSG": "pointnet2_msg_1kpts",
        "ULIP_PN_MLP": "pointmlp",
        "ULIP_PN_NEXT": "pointnext",
    }
    fname = backbone_files.get(args.model)
    loaded_any = False
    if fname:
        path = os.path.join(args.pretrained_dir, fname + ".msgpack")
        if os.path.exists(path):
            variables = merge_pretrained(variables, load_params_file(path))
            loaded_any = True
    slip_path = os.path.join(args.pretrained_dir, "slip_text.msgpack")
    if os.path.exists(slip_path):
        variables = merge_pretrained(variables, load_params_file(slip_path))
        loaded_any = True
    if not loaded_any:
        raise FileNotFoundError(
            f"no converted checkpoints in {args.pretrained_dir}"
        )
    return variables
