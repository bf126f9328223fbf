"""BaafNet: smoke + FULL-MODEL torch parity.

The reference BAAFNet is pure torch (its own FPS/kNN helpers), so the
only pinning needed is the random FPS start (torch.randint -> 0).
``farthest_knn=True`` reproduces the reference's executed kNN behavior
(its ``knn`` calls topk without ``largest=False`` — see
ppt_tpu/nn/baafnet.py docstring).
"""

import os
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ppt_tpu.nn import BaafNet, BaafNetConfig

REF = "/root/reference"

CFG = dict(
    n_points=256,
    ds_ratio=4,
    k=4,
    num_classes=5,
    dims=(3, 4, 8, 16, 32),  # 3 encoder levels
)


def test_baafnet_shapes_and_jit(rng):
    model = BaafNet(BaafNetConfig(**CFG))
    p = jnp.asarray(rng.rand(2, 256, 3).astype(np.float32))
    f = jnp.asarray(rng.rand(2, 256, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), p, f)
    out = jax.jit(lambda v, p, f: model.apply(v, p, f))(variables, p, f)
    assert out.shape == (2, 256, 5)
    assert np.isfinite(np.asarray(out)).all()


def test_baafnet_train_mode(rng):
    model = BaafNet(BaafNetConfig(**CFG))
    p = jnp.asarray(rng.rand(2, 256, 3).astype(np.float32))
    f = jnp.asarray(rng.rand(2, 256, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), p, f)
    out, mutated = model.apply(
        variables, p, f, train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(1)},
    )
    assert out.shape == (2, 256, 5)
    assert jax.tree.leaves(mutated["batch_stats"])


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference unavailable")
def test_baafnet_full_forward_parity(rng):
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

    sys.path.insert(0, os.path.join(REF, "models", "pointnext", "PointNeXt"))
    try:
        import logging

        logging.disable(logging.CRITICAL)
        from openpoints.models.backbone.baafnet import BAAFNet as RefNet
        logging.disable(logging.NOTSET)
    except Exception as e:
        pytest.skip(f"reference BAAFNet unimportable: {e}")
    finally:
        sys.path.pop(0)

    torch.manual_seed(0)
    ref = RefNet(**CFG).eval()

    B, N = 2, 256
    p_np = rng.rand(B, N, 3).astype(np.float32)
    f_np = rng.rand(B, N, 3).astype(np.float32)

    orig_randint = torch.randint

    def pinned(low, high, size, **kw):
        return torch.zeros(size, dtype=kw.get("dtype", torch.long))

    torch.randint = pinned
    try:
        with torch.no_grad():
            want = ref(torch.tensor(p_np), torch.tensor(f_np))[0].numpy()
    finally:
        torch.randint = orig_randint

    from ppt_tpu.tools.ckpt_convert import convert_baafnet
    from ppt_tpu.train.checkpoint import merge_pretrained

    tree = convert_baafnet(ref.state_dict())
    model = BaafNet(BaafNetConfig(farthest_knn=True, **CFG))
    p = jnp.asarray(p_np)
    f = jnp.asarray(f_np)
    variables = model.init(jax.random.PRNGKey(0), p, f)
    merged = merge_pretrained(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        tree,
    )
    got = np.asarray(model.apply(merged, p, f))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)
