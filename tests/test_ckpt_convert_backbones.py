"""PointMLP / PointNeXt converter tests against the *actual* reference
torch models (instantiated from /root/reference as oracles): every
converted leaf must land with matching shape in our flax model init."""

import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp
from flax import traverse_util

from ppt_tpu.nn import PointMLP, PointNext
from ppt_tpu.tools.ckpt_convert import convert_pointmlp, convert_pointnext

REF = "/root/reference"


def _check_full_merge(tree, model, sample, collections=("params", "batch_stats")):
    variables = model.init(jax.random.PRNGKey(0), sample)
    problems = []
    for col in collections:
        flat_model = traverse_util.flatten_dict(variables.get(col, {}))
        flat_conv = traverse_util.flatten_dict(tree.get(col, {}))
        # strip the point_encoder prefix: converters emit Ulip-level paths
        flat_conv = {
            (k[1:] if k and k[0] == "point_encoder" else k): v
            for k, v in flat_conv.items()
            if k != ("pc_projection",)
        }
        for k, v in flat_conv.items():
            if k not in flat_model:
                problems.append((col, k, "missing"))
            elif tuple(flat_model[k].shape) != tuple(v.shape):
                problems.append(
                    (col, k, f"shape {flat_model[k].shape} != {v.shape}")
                )
        # count coverage: converted leaves should cover most model leaves
        covered = sum(1 for k in flat_model if k in flat_conv)
        assert covered / max(len(flat_model), 1) > 0.95, (
            col, covered, len(flat_model),
            sorted(set(flat_model) - set(flat_conv))[:10],
        )
    assert not problems, problems


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference unavailable")
def test_pointmlp_conversion_covers_model():
    sys.path.insert(0, os.path.join(REF, "models", "pointmlp"))
    try:
        from pointMLP import pointMLP as ref_pointmlp
    finally:
        sys.path.pop(0)
    ref = ref_pointmlp()
    sd = {"point_encoder." + k: v for k, v in ref.state_dict().items()}
    tree = convert_pointmlp(sd)
    sample = jnp.zeros((1, 256, 3))
    _check_full_merge(tree, PointMLP(), sample)


def _stub(name, **attrs):
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules.setdefault(name, mod)


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference unavailable")
def test_pointnext_conversion_covers_model():
    import yaml

    class EasyDict(dict):
        def __init__(self, d=None, **kw):
            super().__init__()
            for k, v in dict(d or {}, **kw).items():
                self[k] = EasyDict(v) if isinstance(v, dict) else v

        def __getattr__(self, k):
            try:
                return self[k]
            except KeyError:
                raise AttributeError(k)

        __setattr__ = dict.__setitem__

    _stub("multimethod", multimethod=lambda f: f)
    _stub("easydict", EasyDict=EasyDict)
    _stub("termcolor", colored=lambda s, *a, **k: s)
    _stub("shortuuid", uuid=lambda: "x")
    _stub("pointnet2_batch_cuda")
    sys.path.insert(0, os.path.join(REF, "models", "pointnext", "PointNeXt"))
    try:
        import logging

        logging.disable(logging.CRITICAL)
        from openpoints.models import build_model_from_cfg

        raw = yaml.safe_load(
            open(os.path.join(REF, "models", "pointnext", "pointnext-s.yaml"))
        )
        ref = build_model_from_cfg(EasyDict(raw["model"]))
        logging.disable(logging.NOTSET)
    finally:
        sys.path.pop(0)

    sd = {"point_encoder." + k: v for k, v in ref.state_dict().items()}
    tree = convert_pointnext(sd)
    sample = jnp.zeros((1, 256, 4))
    _check_full_merge(tree, PointNext(), sample)
