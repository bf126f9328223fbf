"""RandLANet: shape/jit smoke + FULL-MODEL torch parity.

The reference (``openpoints/models/backbone/randlenet.py``) needs only a
``torch_points.knn`` stub (exact torch reimplementation: k nearest
support points per query, euclidean distances) to run on CPU; its random
decimation permutation is pinned to identity, matching this port's
``deterministic_perm=True``.
"""

import os
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ppt_tpu.nn import RandLANet, RandLANetConfig

REF = "/root/reference"


def test_randlanet_shapes_and_jit(rng):
    model = RandLANet(RandLANetConfig(d_in=3, num_classes=6, num_neighbors=4))
    pts = jnp.asarray(rng.rand(2, 256, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), pts)
    out = jax.jit(lambda v, p: model.apply(v, p))(variables, pts)
    assert out.shape == (2, 256, 6)
    assert np.isfinite(np.asarray(out)).all()


def test_randlanet_train_mode(rng):
    model = RandLANet(RandLANetConfig(d_in=3, num_classes=6, num_neighbors=4))
    pts = jnp.asarray(rng.rand(2, 256, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), pts)
    out, mutated = model.apply(
        variables, pts, train=True, deterministic_perm=False,
        mutable=["batch_stats"],
        rngs={"decimation": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)},
    )
    assert out.shape == (2, 256, 6)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference unavailable")
def test_randlanet_full_forward_parity(rng):
    torch = pytest.importorskip("torch")

    def knn_stub(support, query, k):
        # torch_points_kernels.knn: per query point, k nearest supports;
        # returns (idx [B, Nq, k] long, dist [B, Nq, k] euclidean)
        d = torch.cdist(query.float(), support.float())
        dist, idx = torch.topk(d, k, dim=-1, largest=False)
        return idx.long(), dist

    tp = types.ModuleType("torch_points")
    tp.knn = knn_stub
    sys.modules["torch_points"] = tp

    def _stubmod(name, **attrs):
        m = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(m, k, v)
        sys.modules.setdefault(name, m)

    _stubmod("multimethod", multimethod=lambda f: f)
    _stubmod("easydict", EasyDict=dict)
    _stubmod("termcolor", colored=lambda s, *a, **k: s)
    _stubmod("shortuuid", uuid=lambda: "x")
    _stubmod("pointnet2_batch_cuda")

    sys.path.insert(0, os.path.join(REF, "models", "pointnext", "PointNeXt"))
    try:
        import logging

        logging.disable(logging.CRITICAL)
        from openpoints.models.backbone.randlenet import RandLANet as RefNet
        logging.disable(logging.NOTSET)
    except Exception as e:
        pytest.skip(f"reference RandLANet unimportable: {e}")
    finally:
        sys.path.pop(0)

    torch.manual_seed(0)
    ref = RefNet(
        d_in=3, num_classes=6, num_neighbors=4, decimation=4,
        device=torch.device("cpu"),
    ).eval()

    B, N = 2, 256
    pts_np = rng.rand(B, N, 3).astype(np.float32)

    orig_randperm = torch.randperm
    torch.randperm = lambda n, **kw: torch.arange(n)
    try:
        with torch.no_grad():
            want = ref(torch.tensor(pts_np)).numpy()  # [B, classes, N]
    finally:
        torch.randperm = orig_randperm
    want = np.transpose(want, (0, 2, 1))  # -> [B, N, classes]

    from ppt_tpu.tools.ckpt_convert import convert_randlanet
    from ppt_tpu.train.checkpoint import merge_pretrained

    tree = convert_randlanet(ref.state_dict())
    model = RandLANet(RandLANetConfig(d_in=3, num_classes=6, num_neighbors=4))
    pts = jnp.asarray(pts_np)
    variables = model.init(jax.random.PRNGKey(0), pts)
    merged = merge_pretrained(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        tree,
    )
    got = np.asarray(model.apply(merged, pts))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)
