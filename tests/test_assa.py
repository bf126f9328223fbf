"""ASSA layer: smoke + torch parity against the openpoints reference
(CUDA groupers patched exactly as in test_full_model_parity)."""

import os
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ppt_tpu.nn import Assa

REF = "/root/reference"
OPENPOINTS = os.path.join(REF, "models", "pointnext", "PointNeXt")


def test_assa_shapes(rng):
    layer = Assa(channels=(8, 16, 16, 32), radius=0.3, nsample=8)
    sup = jnp.asarray(rng.rand(2, 64, 3).astype(np.float32))
    q = sup[:, :16]
    feats = jnp.asarray(rng.rand(2, 64, 8).astype(np.float32))
    qidx = jnp.asarray(np.tile(np.arange(16), (2, 1)))
    variables = layer.init(jax.random.PRNGKey(0), q, sup, feats, qidx)
    out = layer.apply(variables, q, sup, feats, qidx)
    assert out.shape == (2, 16, 32)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference unavailable")
def test_assa_full_parity(rng):
    torch = pytest.importorskip("torch")

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

    def _stub(name, **attrs):
        m = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(m, k, v)
        sys.modules.setdefault(name, m)

    _stub("multimethod", multimethod=lambda f: f)
    _stub("easydict", EasyDict=EasyDict)
    _stub("termcolor", colored=lambda s, *a, **k: s)
    _stub("shortuuid", uuid=lambda: "x")
    _stub("pointnet2_batch_cuda")
    sys.path.insert(0, OPENPOINTS)
    try:
        import logging

        logging.disable(logging.CRITICAL)
        from openpoints.models.layers import group as ref_group
        from openpoints.models.layers.local_aggregation import ASSA as RefAssa
        logging.disable(logging.NOTSET)
    except Exception as e:
        sys.path.pop(0)
        pytest.skip(f"openpoints ASSA unimportable: {e}")
    sys.path.pop(0)

    def torch_ball_query(radius, nsample, support, query):
        B, N, _ = support.shape
        S = query.shape[1]
        d = torch.cdist(query, support) ** 2
        arange = torch.arange(N).view(1, 1, N).expand(B, S, N).clone()
        arange[d > radius * radius] = N
        idx = arange.sort(dim=-1).values[:, :, :nsample]
        first = idx[:, :, :1].expand(-1, -1, nsample)
        idx = torch.where(idx == N, first, idx)
        return idx.clamp(max=N - 1).int()

    def torch_grouping(features, idx):
        B, C, N = features.shape
        flat = idx.long().reshape(B, -1)
        out = torch.gather(features, 2, flat.unsqueeze(1).expand(-1, C, -1))
        return out.reshape(B, C, idx.shape[1], idx.shape[2])

    ref_group.ball_query = torch_ball_query
    ref_group.grouping_operation = torch_grouping

    radius, nsample = 0.3, 8
    torch.manual_seed(0)
    ref = RefAssa(
        channels=[8, 16, 16, 32],
        conv_args={},
        norm_args={"norm": "bn"},
        act_args={"act": "relu"},
        group_args=EasyDict({"NAME": "ballquery", "radius": radius,
                             "nsample": nsample, "normalize_dp": True,
                             "use_xyz": True}),
        feature_type="assa",
        reduction="mean",
        use_res=True,
    ).eval()

    B, N, S = 2, 64, 16
    sup_np = rng.rand(B, N, 3).astype(np.float32)
    feats_np = rng.rand(B, N, 8).astype(np.float32)
    qidx_np = np.tile(np.arange(S), (B, 1))
    q_np = sup_np[:, :S]

    with torch.no_grad():
        want = ref(
            torch.tensor(q_np), torch.tensor(sup_np),
            torch.tensor(np.swapaxes(feats_np, 1, 2)).contiguous(),
            torch.tensor(qidx_np),
        ).numpy()
    want = np.swapaxes(want, 1, 2)  # -> [B, S, C]

    from flax import traverse_util

    layer = Assa(channels=(8, 16, 16, 32), radius=radius, nsample=nsample)
    q = jnp.asarray(q_np)
    variables = layer.init(
        jax.random.PRNGKey(0), q, jnp.asarray(sup_np),
        jnp.asarray(feats_np), jnp.asarray(qidx_np),
    )

    # convert: convs.{i}.{0 conv1d, 1 bn} -> conv{i}; skip_layer conv1d
    sd = ref.state_dict()
    p = {}
    st = {}
    i = 0
    while f"convs.{i}.0.weight" in sd:
        w = sd[f"convs.{i}.0.weight"].numpy()
        p[(f"conv{i}", "conv", "kernel")] = w.reshape(w.shape[0], w.shape[1]).T
        p[(f"conv{i}", "bn", "scale")] = sd[f"convs.{i}.1.weight"].numpy()
        p[(f"conv{i}", "bn", "bias")] = sd[f"convs.{i}.1.bias"].numpy()
        st[(f"conv{i}", "bn", "mean")] = sd[f"convs.{i}.1.running_mean"].numpy()
        st[(f"conv{i}", "bn", "var")] = sd[f"convs.{i}.1.running_var"].numpy()
        i += 1
    if "skip_layer.weight" in sd:
        w = sd["skip_layer.weight"].numpy()
        p[("skip_layer", "kernel")] = w.reshape(w.shape[0], w.shape[1]).T
    merged = {
        "params": traverse_util.unflatten_dict(p),
        "batch_stats": traverse_util.unflatten_dict(st),
    }
    got = np.asarray(layer.apply(
        merged, q, jnp.asarray(sup_np), jnp.asarray(feats_np),
        jnp.asarray(qidx_np),
    ))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-4)
