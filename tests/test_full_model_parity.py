"""FULL-MODEL numerical parity: our flax backbones with converted torch
weights must reproduce the reference models' forward passes.

The reference models are instantiated from /root/reference with random
weights (eval mode), their state dicts run through our checkpoint
converter, and both frameworks evaluate the same cloud. FPS start
randomness is pinned by patching torch.randint to zero (our FPS starts
at index 0 by convention).
"""

import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from ppt_tpu.train.checkpoint import merge_pretrained

REF = "/root/reference"


class _PinnedFps:
    """Context manager pinning torch's random FPS start to index 0."""

    def __enter__(self):
        self._orig = torch.randint

        def fixed(low, high, size, **kw):
            return torch.zeros(
                size, dtype=kw.get("dtype", torch.long), device=kw.get("device")
            )

        torch.randint = fixed
        return self

    def __exit__(self, *exc):
        torch.randint = self._orig


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference unavailable")
def test_pointmlp_full_forward_parity(rng):
    sys.path.insert(0, os.path.join(REF, "models", "pointmlp"))
    try:
        from pointMLP import pointMLP as ref_factory
    finally:
        sys.path.pop(0)
    torch.manual_seed(0)
    ref = ref_factory().eval()
    pc = torch.tensor(rng.rand(2, 512, 3).astype(np.float32))
    with _PinnedFps(), torch.no_grad():
        want = ref(pc).numpy()

    from ppt_tpu.nn import PointMLP
    from ppt_tpu.nn.pointmlp import PointMLPConfig
    from ppt_tpu.tools.ckpt_convert import convert_pointmlp

    sd = {"point_encoder." + k: v for k, v in ref.state_dict().items()}
    tree = convert_pointmlp(sd)
    model = PointMLP(PointMLPConfig(points=1024))
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(pc.numpy()))
    merged = merge_pretrained(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        {
            "params": tree["params"]["point_encoder"],
            "batch_stats": tree["batch_stats"]["point_encoder"],
        },
    )
    got = np.asarray(model.apply(merged, jnp.asarray(pc.numpy())))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-5)


def _stub(name, **attrs):
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules.setdefault(name, mod)


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference unavailable")
def test_pointbert_full_forward_parity(rng):
    # stub the reference's exotic deps (timm DropPath is identity in eval)
    import torch.nn as tnn

    class _DropPath(tnn.Module):
        def __init__(self, p=0.0):
            super().__init__()

        def forward(self, x):
            return x

    _stub("timm")
    _stub("timm.models")
    _stub("timm.models.layers", DropPath=_DropPath)
    _stub("matplotlib")
    _stub("matplotlib.pyplot")
    _stub("mpl_toolkits")
    _stub("mpl_toolkits.mplot3d", Axes3D=object)
    _stub("easydict")
    sys.modules["easydict"].EasyDict = dict

    sys.path.insert(0, REF)
    try:
        from models.pointbert.point_encoder import PointTransformer
    except Exception as e:
        pytest.skip(f"reference PointBERT unimportable: {e}")
    finally:
        sys.path.pop(0)

    class Cfg:
        trans_dim = 96
        depth = 3
        drop_path_rate = 0.0
        cls_dim = 40
        num_heads = 6
        group_size = 8
        num_group = 32
        encoder_dims = 64

    torch.manual_seed(0)
    ref = PointTransformer(Cfg(), args=None).eval()
    pc = torch.tensor(rng.rand(2, 256, 3).astype(np.float32))
    with _PinnedFps(), torch.no_grad():
        want = ref(pc).numpy()

    from ppt_tpu.nn import PointBert, PointBertConfig
    from ppt_tpu.tools.ckpt_convert import convert_pointbert

    sd = {"point_encoder." + k: v for k, v in ref.state_dict().items()}
    tree = convert_pointbert(sd)
    cfg = PointBertConfig(
        trans_dim=96, depth=3, drop_path_rate=0.0, num_heads=6,
        group_size=8, num_group=32, encoder_dims=64,
    )
    model = PointBert(cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(pc.numpy()))
    merged = merge_pretrained(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        {
            "params": tree["params"]["point_encoder"],
            "batch_stats": tree["batch_stats"]["point_encoder"],
        },
    )
    got = np.asarray(model.apply(merged, jnp.asarray(pc.numpy())))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-3)


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference unavailable")
def test_pointnet2_ssg_full_forward_parity(rng):
    """SSG is BASELINE config #1 (frozen-feature linear probe)."""
    sys.path.insert(0, REF)
    try:
        from models.pointnet2.pointnet2 import Pointnet2_Ssg
    except Exception as e:
        pytest.skip(f"reference PointNet2 unimportable: {e}")
    finally:
        sys.path.pop(0)

    torch.manual_seed(0)
    ref = Pointnet2_Ssg().eval()
    pc = torch.tensor(rng.rand(2, 600, 3).astype(np.float32))
    with _PinnedFps(), torch.no_grad():
        want = ref(pc).numpy()

    from ppt_tpu.nn import PointNet2Ssg
    from ppt_tpu.tools.ckpt_convert import convert_pointnet2

    sd = {"point_encoder." + k: v for k, v in ref.state_dict().items()}
    tree = convert_pointnet2(sd)
    model = PointNet2Ssg()
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(pc.numpy()))
    merged = merge_pretrained(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        {
            "params": tree["params"]["point_encoder"],
            "batch_stats": tree["batch_stats"]["point_encoder"],
        },
    )
    got = np.asarray(model.apply(merged, jnp.asarray(pc.numpy())))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference unavailable")
def test_pointnext_full_forward_parity(rng):
    """Reference PointNeXt-S with its CUDA point ops replaced by exact
    torch re-implementations (FPS start pinned, reference ball-query
    semantics) vs our converted flax model."""
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
        from openpoints.models.backbone import pointnext as ref_pn
        from openpoints.models.layers import group as ref_group

        logging.disable(logging.NOTSET)
    except Exception as e:
        sys.path.pop(0)
        pytest.skip(f"openpoints unimportable: {e}")
    sys.path.pop(0)

    # exact torch re-implementations of the CUDA ops
    def torch_fps(xyz, npoint):
        B, N, _ = xyz.shape
        out = torch.zeros(B, npoint, dtype=torch.long)
        dist = torch.full((B, N), 1e10)
        far = torch.zeros(B, dtype=torch.long)  # pinned start
        batch = torch.arange(B)
        for i in range(npoint):
            out[:, i] = far
            c = xyz[batch, far].unsqueeze(1)
            d = ((xyz - c) ** 2).sum(-1)
            dist = torch.minimum(dist, d)
            far = dist.argmax(-1)
        return out.int()

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
        # features [B, C, N], idx [B, S, K] -> [B, C, S, K]
        B, C, N = features.shape
        S, K = idx.shape[1], idx.shape[2]
        flat = idx.long().reshape(B, -1)
        out = torch.gather(
            features, 2, flat.unsqueeze(1).expand(-1, C, -1)
        )
        return out.reshape(B, C, S, K)

    ref_pn.furthest_point_sample = torch_fps
    ref_group.ball_query = torch_ball_query
    ref_group.grouping_operation = torch_grouping

    raw = yaml.safe_load(
        open(os.path.join(REF, "models", "pointnext", "pointnext-s.yaml"))
    )
    torch.manual_seed(0)
    ref = build_model_from_cfg(EasyDict(raw["model"])).eval()

    pc = torch.tensor(rng.rand(2, 256, 4).astype(np.float32))
    with torch.no_grad():
        want = ref(pc).numpy()

    from ppt_tpu.nn import PointNext
    from ppt_tpu.tools.ckpt_convert import convert_pointnext

    sd = {"point_encoder." + k: v for k, v in ref.state_dict().items()}
    tree = convert_pointnext(sd)
    model = PointNext()
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(pc.numpy()))
    merged = merge_pretrained(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        {
            "params": tree["params"]["point_encoder"],
            "batch_stats": tree["batch_stats"]["point_encoder"],
        },
    )
    got = np.asarray(model.apply(merged, jnp.asarray(pc.numpy())))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-3)


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference unavailable")
def test_pointnet2_msg_full_forward_parity(rng):
    """MSG variant: multi-radius ball-query grouping end to end."""
    sys.path.insert(0, REF)
    try:
        from models.pointnet2.pointnet2 import Pointnet2_Msg
    except Exception as e:
        pytest.skip(f"reference PointNet2 unimportable: {e}")
    finally:
        sys.path.pop(0)

    torch.manual_seed(0)
    ref = Pointnet2_Msg().eval()
    pc = torch.tensor(rng.rand(2, 600, 3).astype(np.float32))
    with _PinnedFps(), torch.no_grad():
        want = ref(pc).numpy()

    from ppt_tpu.nn import PointNet2Msg
    from ppt_tpu.tools.ckpt_convert import convert_pointnet2

    sd = {"point_encoder." + k: v for k, v in ref.state_dict().items()}
    tree = convert_pointnet2(sd, msg=True)
    model = PointNet2Msg()
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(pc.numpy()))
    merged = merge_pretrained(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        {
            "params": tree["params"]["point_encoder"],
            "batch_stats": tree["batch_stats"]["point_encoder"],
        },
    )
    got = np.asarray(model.apply(merged, jnp.asarray(pc.numpy())))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference unavailable")
def test_dgcnn_full_forward_parity(rng):
    """openpoints DGCNN (pure torch, dynamic feature-space graphs) vs our
    DgcnnClassifier(trunk=False) through forward_cls_feat."""
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
        from openpoints.models.backbone.dgcnn import DGCNN as RefDgcnn
        from openpoints.models.layers import graph_conv as ref_gc

        logging.disable(logging.NOTSET)
    except Exception as e:
        sys.path.pop(0)
        pytest.skip(f"openpoints DGCNN unimportable: {e}")
    sys.path.pop(0)

    def torch_grouping(features, idx):
        B, C, N = features.shape
        flat = idx.long().reshape(B, -1)
        out = torch.gather(features, 2, flat.unsqueeze(1).expand(-1, C, -1))
        return out.reshape(B, C, idx.shape[1], idx.shape[2])

    ref_gc.grouping_operation = torch_grouping

    torch.manual_seed(0)
    ref = RefDgcnn(k=8).eval()
    pc = torch.tensor(rng.rand(2, 128, 3).astype(np.float32))
    with torch.no_grad():
        want = ref.forward_cls_feat(pc).numpy()

    from ppt_tpu.nn import DgcnnClassifier
    from ppt_tpu.tools.ckpt_convert import convert_dgcnn

    sd = {"point_encoder." + k: v for k, v in ref.state_dict().items()}
    tree = convert_dgcnn(sd)
    model = DgcnnClassifier(k=8, trunk=False)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(pc.numpy()))
    merged = merge_pretrained(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        {
            "params": tree["params"]["point_encoder"],
            "batch_stats": tree["batch_stats"]["point_encoder"],
        },
    )
    got = np.asarray(model.apply(merged, jnp.asarray(pc.numpy())))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-4)


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference unavailable")
def test_pointnet_encoder_full_forward_parity(rng):
    """Classic PointNet with both T-Nets (pure torch) vs our
    PointNetEncoder through forward_cls_feat."""
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
        from openpoints.models.backbone.pointnet import PointNetEncoder as RefPn

        logging.disable(logging.NOTSET)
    except Exception as e:
        sys.path.pop(0)
        pytest.skip(f"openpoints PointNet unimportable: {e}")
    sys.path.pop(0)

    torch.manual_seed(0)
    ref = RefPn(in_channels=3).eval()
    pc = torch.tensor(rng.rand(2, 256, 3).astype(np.float32))
    with torch.no_grad():
        want = ref.forward_cls_feat(pc).numpy()

    from ppt_tpu.nn import PointNetEncoder
    from ppt_tpu.tools.ckpt_convert import convert_pointnet

    sd = {"point_encoder." + k: v for k, v in ref.state_dict().items()}
    tree = convert_pointnet(sd)
    model = PointNetEncoder()
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(pc.numpy()))
    merged = merge_pretrained(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        {
            "params": tree["params"]["point_encoder"],
            "batch_stats": tree["batch_stats"]["point_encoder"],
        },
    )
    got = np.asarray(model.apply(merged, jnp.asarray(pc.numpy())))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference unavailable")
def test_pointbert_partseg_full_forward_parity(rng):
    """The partseg trunk (reference point_encoder.py:260-420): ViT taps
    at blocks {3,7,11}, 3-NN feature propagation, DGCNN propagation,
    128-d per-point head. trans_dim must be 384 (DGCNN_Propagation
    hardcodes 768->512/1024->384 widths, pointnet2_utils.py:382-390)."""
    import torch.nn as tnn

    class _DropPath(tnn.Module):
        def __init__(self, p=0.0):
            super().__init__()

        def forward(self, x):
            return x

    _stub("timm")
    _stub("timm.models")
    _stub("timm.models.layers", DropPath=_DropPath)
    _stub("matplotlib")
    _stub("matplotlib.pyplot")
    _stub("mpl_toolkits")
    _stub("mpl_toolkits.mplot3d", Axes3D=object)
    _stub("easydict")
    sys.modules["easydict"].EasyDict = dict

    sys.path.insert(0, REF)
    try:
        from models.pointbert.point_encoder import PointTransformer_partseg
    except Exception as e:
        pytest.skip(f"reference partseg trunk unimportable: {e}")
    finally:
        sys.path.pop(0)

    class Cfg:
        trans_dim = 384  # required by DGCNN_Propagation's hardcoded widths
        depth = 12  # required by the fixed fetch_idx {3,7,11}
        drop_path_rate = 0.0
        cls_dim = 50
        num_heads = 6
        group_size = 8
        num_group = 32
        encoder_dims = 64

    torch.manual_seed(0)
    ref = PointTransformer_partseg(Cfg(), args=None).eval()
    B, N = 2, 512
    pc = torch.tensor(rng.rand(B, N, 3).astype(np.float32))
    onehot = torch.zeros(B, 16)
    onehot[0, 3] = 1.0
    onehot[1, 7] = 1.0
    with _PinnedFps(), torch.no_grad():
        want = ref(pc, onehot).numpy()  # [B, N, 128]

    from ppt_tpu.nn import PointBertPartSeg, PointBertConfig
    from ppt_tpu.tools.ckpt_convert import convert_pointbert_partseg

    sd = {"point_encoder." + k: v for k, v in ref.state_dict().items()}
    tree = convert_pointbert_partseg(sd)
    cfg = PointBertConfig(
        trans_dim=384, depth=12, drop_path_rate=0.0, num_heads=6,
        group_size=8, num_group=32, encoder_dims=64,
    )
    model = PointBertPartSeg(cfg)
    pts = jnp.asarray(pc.numpy())
    oh = jnp.asarray(onehot.numpy())
    variables = model.init(jax.random.PRNGKey(0), pts, oh)
    merged = merge_pretrained(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        {
            "params": tree["params"]["point_encoder"],
            "batch_stats": tree["batch_stats"]["point_encoder"],
        },
    )
    got = np.asarray(model.apply(merged, pts, oh))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)
