"""BallDgcnn / DeepGcn / GroupPointNet: smoke + FULL-MODEL torch parity.

Reference models (``openpoints/models/backbone/{ball_dgcnn,deepgcn,
grouppointnet}.py``) are instantiated on CPU with their CUDA point ops
(ball_query, grouping_operation, furthest_point_sample) replaced by
exact torch re-implementations — the same harness as
``test_full_model_parity.py``.
"""

import os
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ppt_tpu.nn import BallDgcnn, DeepGcn, DeepGcnConfig, GroupPointNet

REF = "/root/reference"
OPENPOINTS = os.path.join(REF, "models", "pointnext", "PointNeXt")


def _stub(name, **attrs):
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules.setdefault(name, mod)


def _prepare_openpoints(torch):
    """Import openpoints with CUDA ops patched to torch equivalents.
    Returns the (graph_conv, group, layers-pkg) modules, or skips."""
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
    sys.path.insert(0, OPENPOINTS)
    try:
        import logging

        logging.disable(logging.CRITICAL)
        from openpoints.models.layers import graph_conv as ref_gc
        from openpoints.models.layers import group as ref_group
        from openpoints.models import backbone as ref_backbone
        logging.disable(logging.NOTSET)
    except Exception as e:
        sys.path.pop(0)
        pytest.skip(f"openpoints unimportable: {e}")
    sys.path.pop(0)

    def torch_grouping(features, idx):
        # features [B, C, N], idx [B, S, K] -> [B, C, S, K].
        # GroupPointNet passes [B, C, N, 1] (grouppointnet.py:80) —
        # tolerate the trailing singleton like the CUDA op's flat view.
        if features.dim() == 4:
            features = features.squeeze(-1)
        B, C, N = features.shape
        flat = idx.long().reshape(B, -1)
        out = torch.gather(features, 2, flat.unsqueeze(1).expand(-1, C, -1))
        return out.reshape(B, C, idx.shape[1], idx.shape[2])

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

    def torch_fps(xyz, npoint):
        B, N, _ = xyz.shape
        out = torch.zeros(B, npoint, dtype=torch.long)
        dist = torch.full((B, N), 1e10)
        far = torch.zeros(B, dtype=torch.long)
        batch = torch.arange(B)
        for i in range(npoint):
            out[:, i] = far
            c = xyz[batch, far].unsqueeze(1)
            d = ((xyz - c) ** 2).sum(-1)
            dist = torch.minimum(dist, d)
            far = dist.argmax(-1)
        return out.int()

    ref_gc.grouping_operation = torch_grouping
    ref_group.ball_query = torch_ball_query
    ref_group.grouping_operation = torch_grouping
    return ref_gc, ref_group, ref_backbone, torch_fps


# ---------------------------------------------------------------------------
# smoke
# ---------------------------------------------------------------------------


def test_balldgcnn_shapes(rng):
    model = BallDgcnn(channels=8, embed_dim=32, k=4, radius=0.3)
    pts = jnp.asarray(rng.rand(2, 64, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), pts)
    out = model.apply(variables, pts)
    assert out.shape == (2, 64, 32)
    feat = model.apply(variables, pts, method=BallDgcnn.cls_feat)
    assert feat.shape == (2, 64)


def test_deepgcn_shapes(rng):
    model = DeepGcn(DeepGcnConfig(channels=8, emb_dims=32, n_blocks=4, k=4))
    pts = jnp.asarray(rng.rand(2, 64, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), pts)
    out = model.apply(variables, pts)
    assert out.shape == (2, 64, 32)


def test_deepgcn_dense_and_plain(rng):
    pts = jnp.asarray(rng.rand(2, 64, 3).astype(np.float32))
    for block in ("dense", "plain"):
        model = DeepGcn(
            DeepGcnConfig(channels=8, emb_dims=32, n_blocks=3, k=4, block=block)
        )
        variables = model.init(jax.random.PRNGKey(0), pts)
        out = model.apply(variables, pts)
        assert out.shape == (2, 64, 32), block


def test_grouppointnet_shapes(rng):
    model = GroupPointNet(channels=16, nsample=8, radius=0.3)
    pts = jnp.asarray(rng.rand(2, 64, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), pts)
    out = model.apply(variables, pts)
    assert out.shape == (2, 16, 16)
    feat = model.apply(variables, pts, method=GroupPointNet.cls_feat)
    assert feat.shape == (2, 32)


# ---------------------------------------------------------------------------
# torch parity
# ---------------------------------------------------------------------------


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference unavailable")
def test_balldgcnn_full_forward_parity(rng):
    torch = pytest.importorskip("torch")
    ref_gc, ref_group, ref_backbone, _ = _prepare_openpoints(torch)
    from openpoints.models.backbone.ball_dgcnn import BallDGCNN as RefNet

    torch.manual_seed(0)
    ref = RefNet(channels=8, embed_dim=32, n_blocks=5, k=4, radius=0.3).eval()
    pc = torch.tensor(rng.rand(2, 64, 3).astype(np.float32))
    with torch.no_grad():
        want = ref.forward_cls_feat(pc).numpy()

    from ppt_tpu.tools.ckpt_convert import convert_balldgcnn
    from ppt_tpu.train.checkpoint import merge_pretrained

    tree = convert_balldgcnn(ref.state_dict())
    model = BallDgcnn(channels=8, embed_dim=32, k=4, radius=0.3)
    pts = jnp.asarray(pc.numpy())
    variables = model.init(jax.random.PRNGKey(0), pts)
    merged = merge_pretrained(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        tree,
    )
    got = np.asarray(model.apply(merged, pts, method=BallDgcnn.cls_feat))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-4)


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference unavailable")
def test_deepgcn_full_forward_parity(rng):
    torch = pytest.importorskip("torch")
    _prepare_openpoints(torch)
    from openpoints.models.backbone.deepgcn import DeepGCN as RefNet

    torch.manual_seed(0)
    ref = RefNet(channels=8, emb_dims=32, n_blocks=4, k=4,
                 use_stochastic=False).eval()
    pc = torch.tensor(rng.rand(2, 64, 3).astype(np.float32))
    with torch.no_grad():
        want = ref.forward_cls_feat(pc).numpy()

    from ppt_tpu.tools.ckpt_convert import convert_deepgcn
    from ppt_tpu.train.checkpoint import merge_pretrained

    tree = convert_deepgcn(ref.state_dict())
    model = DeepGcn(
        DeepGcnConfig(channels=8, emb_dims=32, n_blocks=4, k=4,
                      use_stochastic=False)
    )
    pts = jnp.asarray(pc.numpy())
    variables = model.init(jax.random.PRNGKey(0), pts)
    merged = merge_pretrained(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        tree,
    )
    got = np.asarray(model.apply(merged, pts, method=DeepGcn.cls_feat))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-4)


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference unavailable")
def test_grouppointnet_full_forward_parity(rng):
    torch = pytest.importorskip("torch")
    _, _, _, torch_fps = _prepare_openpoints(torch)
    import openpoints.models.backbone.grouppointnet as ref_mod

    ref_mod.furthest_point_sample = torch_fps
    torch.manual_seed(0)
    ref = ref_mod.GroupPointNet(
        channels=16, n_blocks=5,
        group_args={"group": "knn", "radius": 0.3, "nsample": 8},
    ).eval()
    pc = torch.tensor(rng.rand(2, 64, 3).astype(np.float32))
    with torch.no_grad():
        want = ref.forward_cls_feat(pc).numpy()

    from ppt_tpu.tools.ckpt_convert import convert_grouppointnet
    from ppt_tpu.train.checkpoint import merge_pretrained

    tree = convert_grouppointnet(ref.state_dict())
    model = GroupPointNet(channels=16, nsample=8, radius=0.3)
    pts = jnp.asarray(pc.numpy())
    variables = model.init(jax.random.PRNGKey(0), pts)
    merged = merge_pretrained(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        tree,
    )
    got = np.asarray(model.apply(merged, pts, method=GroupPointNet.cls_feat))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-4)
