"""SimpleView: projection golden test + FULL-MODEL torch parity.

The reference MVModel (``openpoints/models/backbone/simpleview.py``) is
pure torch except for ``.cuda()`` calls in PCViews.__init__, patched to
no-ops; the projection math and the thin ResNet18 are then compared
end to end.
"""

import os
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ppt_tpu.nn import SimpleView, SimpleViewConfig, points_to_depth_views

REF = "/root/reference"
OPENPOINTS = os.path.join(REF, "models", "pointnext", "PointNeXt")


def test_depth_views_shapes(rng):
    pts = jnp.asarray((rng.rand(2, 64, 3) - 0.5).astype(np.float32))
    img = points_to_depth_views(pts, resolution=32)
    assert img.shape == (12, 32, 32)
    assert np.isfinite(np.asarray(img)).all()
    # most of the canvas is empty (depth 0), some pixels are hit
    arr = np.asarray(img)
    assert (arr != 0).sum() > 0
    assert (arr == 0).mean() > 0.5


def test_simpleview_forward(rng):
    model = SimpleView(SimpleViewConfig(num_classes=7, channels=4,
                                        resolution=32, layers=(1, 1, 1, 1)))
    pts = jnp.asarray((rng.rand(2, 64, 3) - 0.5).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), pts)
    out = model.apply(variables, pts)
    assert out.shape == (2, 7)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference unavailable")
def test_simpleview_projection_parity(rng):
    """points_to_depth_views must reproduce PCViews.get_img exactly."""
    torch = pytest.importorskip("torch")
    import importlib.util

    util_path = os.path.join(
        OPENPOINTS, "openpoints", "models", "backbone", "simpleview_util.py"
    )
    # load standalone (self-contained torch+numpy file) to avoid the
    # openpoints package __init__ dependency chain
    spec = importlib.util.spec_from_file_location("_sv_util", util_path)
    sv_util = importlib.util.module_from_spec(spec)
    orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    try:
        spec.loader.exec_module(sv_util)
        pv = sv_util.PCViews()
        pts_np = (rng.rand(2, 128, 3) - 0.5).astype(np.float32)
        with torch.no_grad():
            want = pv.get_img(torch.tensor(pts_np)).numpy()
    finally:
        torch.Tensor.cuda = orig_cuda

    got = np.asarray(points_to_depth_views(jnp.asarray(pts_np)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference unavailable")
def test_simpleview_full_forward_parity(rng):
    torch = pytest.importorskip("torch")

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

    orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    sys.path.insert(0, OPENPOINTS)
    try:
        import logging

        logging.disable(logging.CRITICAL)
        from openpoints.models.backbone.simpleview import MVModel
        logging.disable(logging.NOTSET)

        torch.manual_seed(0)
        ref = MVModel(task="cls", backbone="resnet18", channels=4,
                      num_classes=7).eval()
        pts_np = (rng.rand(2, 128, 3) - 0.5).astype(np.float32)
        with torch.no_grad():
            want = ref(torch.tensor(pts_np)).numpy()
    except Exception as e:
        pytest.skip(f"reference MVModel unusable: {e}")
    finally:
        torch.Tensor.cuda = orig_cuda
        sys.path.pop(0)

    from ppt_tpu.tools.ckpt_convert import convert_simpleview
    from ppt_tpu.train.checkpoint import merge_pretrained

    tree = convert_simpleview(ref.state_dict())
    model = SimpleView(SimpleViewConfig(num_classes=7, channels=4))
    pts = jnp.asarray(pts_np)
    variables = model.init(jax.random.PRNGKey(0), pts)
    merged = merge_pretrained(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        tree,
    )
    got = np.asarray(model.apply(merged, pts))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)
