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
