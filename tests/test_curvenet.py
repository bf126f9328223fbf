"""CurveNet encoder tests: walk mechanics, aggregation shapes, forward."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ppt_tpu.nn.curvenet import (
    CurveAggregation,
    CurveNet,
    CurveNetConfig,
    Walk,
)

TINY = CurveNetConfig(
    k=8,
    stages=(
        (128, 0.2, 8, 32, 2, (16, 4)),
        (32, 0.4, 8, 64, 2, None),
    ),
)


class TestWalk:
    def test_walk_shapes_and_validity(self, rng):
        B, N, C, cn, cl, k = 2, 64, 16, 8, 4, 6
        xyz = jnp.asarray(rng.rand(B, N, 3).astype(np.float32))
        feats = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
        from ppt_tpu import ops

        adj = ops.knn_point(k + 1, xyz, xyz)[:, :, 1:]
        start = jnp.asarray(rng.randint(0, N, (B, cn)))
        model = Walk(k, cn, cl)
        params = model.init(
            jax.random.PRNGKey(0), xyz, feats, adj, start, jax.random.PRNGKey(1)
        )
        curves = model.apply(params, xyz, feats, adj, start, jax.random.PRNGKey(2))
        assert curves.shape == (B, cn, cl, C)
        assert np.isfinite(np.asarray(curves)).all()
        # step 0 output must be a convex combo of the start's neighbors
        # (not necessarily the start itself), so just check boundedness
        assert np.abs(np.asarray(curves)).max() < np.abs(np.asarray(feats)).max() + 1


class TestCurveAggregation:
    def test_shapes(self, rng):
        B, N, C, cn, cl = 2, 32, 16, 6, 4
        x = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
        curves = jnp.asarray(rng.randn(B, cn, cl, C).astype(np.float32))
        model = CurveAggregation()
        params = model.init(jax.random.PRNGKey(0), x, curves)
        out = model.apply(params, x, curves)
        assert out.shape == x.shape
        assert np.isfinite(np.asarray(out)).all()


def test_curvenet_forward(rng):
    model = CurveNet(TINY)
    pc = jnp.asarray(rng.rand(2, 256, 3).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), pc)
    out = model.apply(params, pc)
    assert out.shape == (2, 256)
    assert np.isfinite(np.asarray(out)).all()


def test_curvenet_train_mode_grads(rng):
    model = CurveNet(TINY)
    pc = jnp.asarray(rng.rand(2, 256, 3).astype(np.float32))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "gumbel": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)},
        pc, train=True,
    )

    def loss(p):
        out, _ = model.apply(
            {"params": p, "batch_stats": variables["batch_stats"]},
            pc, train=True, mutable=["batch_stats"],
            rngs={"gumbel": jax.random.PRNGKey(3), "dropout": jax.random.PRNGKey(4)},
        )
        return jnp.sum(out.astype(jnp.float32) ** 2)

    g = jax.grad(loss)(variables["params"])
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
