"""Pipeline-parallel ViT trunk (parallel/pipeline.py) vs the sequential
module — forward equality, gradient equality (through the stages AND
back into the pre-trunk embedding), microbatch-count invariance, and
argument validation. Runs on the conftest 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from ppt_tpu.nn import PointBert, PointBertConfig
from ppt_tpu.parallel.pipeline import (
    pipelined_trunk_features,
    stack_vit_blocks,
)

CFG = PointBertConfig(
    trans_dim=64,
    depth=4,
    num_heads=4,
    num_group=32,
    group_size=16,
    encoder_dims=64,
)


@pytest.fixture(scope="module")
def setup():
    model = PointBert(CFG)
    pts = jax.random.normal(jax.random.PRNGKey(1), (8, 128, 3))
    variables = model.init(jax.random.PRNGKey(0), pts, train=False)
    mesh = Mesh(np.array(jax.devices()).reshape(2, 4), ("data", "pipe"))
    return model, variables, pts, mesh


def test_forward_matches_sequential(setup):
    model, variables, pts, mesh = setup
    ref = model.apply(variables, pts, train=False)
    out = jax.jit(
        lambda v, x: pipelined_trunk_features(v, x, CFG, mesh, dp_axis="data")
    )(variables, pts)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_forward_n_micro_invariant(setup):
    """The result is invariant to the microbatch count: fewer
    microbatches than stages (deep bubbles, n_micro=2 on pp=4) and the
    pp-only regime (no dp axis, n_micro=8) both match the sequential
    trunk."""
    model, variables, pts, mesh = setup
    ref = model.apply(variables, pts, train=False)
    out = jax.jit(
        lambda v, x: pipelined_trunk_features(
            v, x, CFG, mesh, dp_axis="data", n_micro=2
        )
    )(variables, pts)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
    out2 = jax.jit(
        lambda v, x: pipelined_trunk_features(
            v, x, CFG, mesh, dp_axis=None, n_micro=8
        )
    )(variables, pts)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref), atol=2e-5)


def test_forward_pp2_mesh(setup):
    """A different stage count (pp=2, two blocks per stage on a 4x2
    mesh) gives the same result — the schedule is pp-size generic."""
    model, variables, pts, _ = setup
    ref = model.apply(variables, pts, train=False)
    mesh2 = Mesh(np.array(jax.devices()).reshape(4, 2), ("data", "pipe"))
    out = jax.jit(
        lambda v, x: pipelined_trunk_features(
            v, x, CFG, mesh2, dp_axis="data"
        )
    )(variables, pts)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_grads_match_sequential(setup):
    """Backprop through ppermute/psum: late-block grads (the head_type
    1-3 unfreeze surface, ULIP_models.py:461-470) and embedding grads
    both match the sequential trunk."""
    model, variables, pts, mesh = setup

    def loss_seq(v):
        return jnp.sum(model.apply(v, pts, train=False) ** 2)

    def loss_pp(v):
        return jnp.sum(
            pipelined_trunk_features(v, pts, CFG, mesh, dp_axis="data") ** 2
        )

    g_seq = jax.grad(loss_seq)(variables)["params"]
    g_pp = jax.jit(jax.grad(loss_pp))(variables)["params"]
    for path in (
        ("block_3", "mlp", "fc2", "kernel"),
        ("block_0", "attn", "qkv", "kernel"),
        ("encoder", "conv1a", "kernel"),
        ("pos_embed2", "kernel"),
    ):
        a, b = g_seq, g_pp
        for k in path:
            a, b = a[k], b[k]
        scale = max(float(jnp.max(jnp.abs(a))), 1e-6)
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=5e-5 * scale,
            err_msg="/".join(path),
        )


def test_validation_errors(setup):
    model, variables, pts, mesh = setup
    bad = PointBertConfig(
        trans_dim=64, depth=6, num_heads=4, num_group=32, group_size=16,
        encoder_dims=64,
    )
    with pytest.raises(ValueError, match="not divisible by pp"):
        pipelined_trunk_features(variables, pts, bad, mesh, dp_axis="data")
    with pytest.raises(ValueError, match="not divisible by n_micro"):
        pipelined_trunk_features(
            variables, pts, CFG, mesh, dp_axis="data", n_micro=3
        )
    with pytest.raises(ValueError, match="has no 'pp' axis"):
        pipelined_trunk_features(variables, pts, CFG, mesh, pp_axis="pp")
    with pytest.raises(ValueError, match="pass dp_axis=None"):
        pipelined_trunk_features(variables, pts, CFG, mesh, dp_axis="dp")


SEG_CFG = PointBertConfig(
    trans_dim=48,
    depth=12,  # taps {3, 7, 11} need the full reference depth
    num_heads=4,
    num_group=32,
    group_size=8,
    encoder_dims=32,
    drop_path_rate=0.0,
)


@pytest.fixture(scope="module")
def seg_setup():
    from ppt_tpu.nn.pointbert import PointBertPartSeg

    model = PointBertPartSeg(SEG_CFG)
    pts = jax.random.normal(jax.random.PRNGKey(1), (8, 128, 3))
    onehot = jnp.eye(16)[jnp.arange(8) % 16]
    variables = model.init(jax.random.PRNGKey(0), pts, onehot, train=False)
    mesh = Mesh(np.array(jax.devices()).reshape(2, 4), ("data", "pipe"))
    return model, variables, pts, onehot, mesh


def test_partseg_forward_matches_sequential(seg_setup):
    """The tapped trunk (blocks {3,7,11} captured by their owning
    stages and psum-broadcast) + propagation head equals the
    sequential PointBertPartSeg."""
    from ppt_tpu.parallel.pipeline import pipelined_partseg_features

    model, variables, pts, onehot, mesh = seg_setup
    ref = model.apply(variables, pts, onehot, train=False)
    out = jax.jit(
        lambda v, x, o: pipelined_partseg_features(
            v, x, o, SEG_CFG, mesh, dp_axis="data"
        )
    )(variables, pts, onehot)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5)


def test_partseg_grads_through_taps(seg_setup):
    """Grads flow from the propagation head back through the psum'd
    taps into an EARLY block, matching the sequential trunk."""
    from ppt_tpu.parallel.pipeline import pipelined_partseg_features

    model, variables, pts, onehot, mesh = seg_setup

    def loss_seq(v):
        return jnp.sum(model.apply(v, pts, onehot, train=False) ** 2)

    def loss_pp(v):
        return jnp.sum(
            pipelined_partseg_features(
                v, pts, onehot, SEG_CFG, mesh, dp_axis="data"
            )
            ** 2
        )

    path = ("block_0", "attn", "qkv", "kernel")
    a = jax.grad(loss_seq)(variables)["params"]
    b = jax.jit(jax.grad(loss_pp))(variables)["params"]
    for k in path:
        a, b = a[k], b[k]
    scale = max(float(jnp.max(jnp.abs(a))), 1e-6)
    assert scale > 1e-4, "sequential grad vanished; test is vacuous"
    np.testing.assert_allclose(
        np.asarray(b), np.asarray(a), atol=1e-4 * scale
    )


def test_stack_vit_blocks_shapes(setup):
    model, variables, pts, mesh = setup
    stacked = stack_vit_blocks(variables["params"], CFG.depth)
    k = stacked["attn"]["qkv"]["kernel"]
    assert k.shape == (CFG.depth, CFG.trans_dim, 3 * CFG.trans_dim)
    one = variables["params"]["block_2"]["attn"]["qkv"]["kernel"]
    np.testing.assert_array_equal(np.asarray(k[2]), np.asarray(one))
