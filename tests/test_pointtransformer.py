"""PointTransformerSeg: shape/jit smoke + FULL-MODEL torch parity.

The reference ``PTSeg`` (openpoints/models/backbone/pointtransformer.py)
is instantiated on CPU with its ``pointops`` CUDA extension replaced by
exact torch re-implementations matching this framework's conventions
(FPS starts at each cloud's first point; kNN by ascending distance),
weights converted, and per-point logits compared.
"""

import os
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ppt_tpu.nn import PointTransformerConfig, PointTransformerSeg

REF = "/root/reference"

CFG = dict(
    blocks=(2, 2, 2, 2, 2),
    width=8,
    nsample=(4, 4, 4, 4, 2),
    in_channels=3,
    num_classes=13,
)


def test_ptseg_shapes_and_jit(rng):
    model = PointTransformerSeg(PointTransformerConfig(**CFG))
    pts = jnp.asarray(rng.rand(2, 512, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), pts)
    out = jax.jit(lambda v, p: model.apply(v, p))(variables, pts)
    assert out.shape == (2, 512, 13)
    assert np.isfinite(np.asarray(out)).all()


def test_ptseg_edgeconv_block(rng):
    model = PointTransformerSeg(
        PointTransformerConfig(block="EdgeConvBlock", **CFG)
    )
    pts = jnp.asarray(rng.rand(2, 512, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), pts)
    out = model.apply(variables, pts)
    assert out.shape == (2, 512, 13)
    assert np.isfinite(np.asarray(out)).all()


def test_ptseg_train_mode_batch_stats(rng):
    model = PointTransformerSeg(PointTransformerConfig(**CFG))
    pts = jnp.asarray(rng.rand(2, 512, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), pts)
    out, mutated = model.apply(
        variables, pts, train=True, mutable=["batch_stats"]
    )
    assert out.shape == (2, 512, 13)
    leaves = jax.tree.leaves(mutated["batch_stats"])
    assert leaves and all(np.isfinite(np.asarray(l)).all() for l in leaves)


# ---------------------------------------------------------------------------
# torch parity
# ---------------------------------------------------------------------------


def _make_pointops_stub(torch):
    """Torch re-implementation of the pointops API used by PTSeg
    (``openpoints/cpp/pointops/functions/pointops.py``)."""
    mod = types.ModuleType("pointops")

    def _seg_ids(offsets, n):
        seg = torch.zeros(n, dtype=torch.long)
        start = 0
        for i, e in enumerate(offsets.tolist()):
            seg[start:int(e)] = i
            start = int(e)
        return seg

    def knnquery(nsample, xyz, new_xyz, offset, new_offset):
        if new_xyz is None:
            new_xyz = xyz
        d = torch.cdist(new_xyz.float(), xyz.float()) ** 2
        segp = _seg_ids(offset, xyz.shape[0])
        segq = _seg_ids(new_offset, new_xyz.shape[0])
        d = d.masked_fill(segq[:, None] != segp[None, :], float("inf"))
        dist, idx = torch.topk(d, nsample, dim=1, largest=False)
        return idx.int(), torch.sqrt(dist)

    def furthestsampling(p, o, n_o):
        out = []
        start = 0
        prev = 0
        for i in range(o.shape[0]):
            end = int(o[i])
            m = int(n_o[i]) - prev
            prev = int(n_o[i])
            pts = p[start:end]
            dist = torch.full((pts.shape[0],), 1e10)
            far = 0
            for _ in range(m):
                out.append(start + far)
                d = ((pts - pts[far]) ** 2).sum(-1)
                dist = torch.minimum(dist, d)
                far = int(dist.argmax())
            start = end
        return torch.tensor(out, dtype=torch.int32)

    def queryandgroup(nsample, xyz, new_xyz, feat, idx, offset, new_offset,
                      use_xyz=True):
        if new_xyz is None:
            new_xyz = xyz
        if idx is None:
            idx, _ = knnquery(nsample, xyz, new_xyz, offset, new_offset)
        li = idx.view(-1).long()
        m = new_xyz.shape[0]
        grouped_xyz = xyz[li].view(m, nsample, 3) - new_xyz.unsqueeze(1)
        grouped_feat = feat[li].view(m, nsample, feat.shape[1])
        if use_xyz:
            return torch.cat([grouped_xyz, grouped_feat], -1)
        return grouped_feat

    def interpolation(xyz, new_xyz, feat, offset, new_offset, k=3):
        idx, dist = knnquery(k, xyz, new_xyz, offset, new_offset)
        recip = 1.0 / (dist + 1e-8)
        weight = recip / recip.sum(1, keepdim=True)
        out = torch.zeros(new_xyz.shape[0], feat.shape[1])
        for i in range(k):
            out += feat[idx[:, i].long()] * weight[:, i].unsqueeze(-1)
        return out

    mod.knnquery = knnquery
    mod.furthestsampling = furthestsampling
    mod.queryandgroup = queryandgroup
    mod.interpolation = interpolation
    return mod


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference unavailable")
def test_ptseg_full_forward_parity(rng):
    torch = pytest.importorskip("torch")

    stub = _make_pointops_stub(torch)
    functions = types.ModuleType("openpoints.cpp.pointops.functions")
    functions.pointops = stub
    sys.modules["openpoints.cpp.pointops.functions"] = functions
    sys.modules["openpoints.cpp.pointops.functions.pointops"] = stub

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

    # TransitionDown materializes new offsets via torch.cuda.IntTensor
    # (pointtransformer.py:98); redirect to a CPU tensor.
    orig_int_tensor = getattr(torch.cuda, "IntTensor", None)
    torch.cuda.IntTensor = lambda data: torch.tensor(data, dtype=torch.int32)

    sys.path.insert(0, os.path.join(REF, "models", "pointnext", "PointNeXt"))
    try:
        import logging

        logging.disable(logging.CRITICAL)
        from openpoints.models.backbone.pointtransformer import PTSeg
        logging.disable(logging.NOTSET)
    except Exception as e:
        pytest.skip(f"reference PTSeg unimportable: {e}")
    finally:
        sys.path.pop(0)

    try:
        torch.manual_seed(0)
        ref = PTSeg(
            block="PointTransformerBlock",
            blocks=list(CFG["blocks"]),
            width=CFG["width"],
            nsample=list(CFG["nsample"]),
            in_channels=CFG["in_channels"],
            num_classes=CFG["num_classes"],
        ).eval()

        B, N = 2, 512
        pts_np = rng.rand(B, N, 3).astype(np.float32)
        p0 = torch.tensor(pts_np.reshape(-1, 3)).contiguous()
        o0 = torch.tensor([N, 2 * N], dtype=torch.int32)
        with torch.no_grad():
            want = ref(p0, p0.clone(), o0).numpy().reshape(B, N, -1)
    finally:
        if orig_int_tensor is not None:
            torch.cuda.IntTensor = orig_int_tensor

    from ppt_tpu.tools.ckpt_convert import convert_pointtransformer
    from ppt_tpu.train.checkpoint import merge_pretrained

    tree = convert_pointtransformer(ref.state_dict())
    model = PointTransformerSeg(PointTransformerConfig(**CFG))
    pts = jnp.asarray(pts_np)
    variables = model.init(jax.random.PRNGKey(0), pts)
    merged = merge_pretrained(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        tree,
    )
    got = np.asarray(model.apply(merged, pts))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)
