"""PointNextPacked: packed/offset PointNeXt must match the batched one.

The packed model mirrors the batched module & parameter tree, so the
SAME variables drive both; on equal-size clouds the implementations must
agree numerically — a full-network equivalence test of the ragged ops
(packed FPS, packed ball query, segment max) against their batched
counterparts.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ppt_tpu.nn import PointNext, PointNextConfig
from ppt_tpu.nn.pointnext_packed import PointNextPacked
from ppt_tpu.ops.ragged import ball_query_packed
from ppt_tpu import ops

CFG = PointNextConfig(width=8)


def test_ball_query_packed_matches_batched(rng):
    B, N, S = 3, 64, 16
    xyz = rng.rand(B, N, 3).astype(np.float32)
    q = rng.rand(B, S, 3).astype(np.float32)
    batched = np.asarray(
        ops.query_ball_point(0.3, 8, jnp.asarray(xyz), jnp.asarray(q))
    )
    packed_idx = np.asarray(
        ball_query_packed(
            0.3, 8,
            jnp.asarray(xyz.reshape(-1, 3)),
            jnp.asarray(np.arange(1, B + 1) * N, dtype=np.int32),
            jnp.asarray(q.reshape(-1, 3)),
            jnp.asarray(np.arange(1, B + 1) * S, dtype=np.int32),
        )
    ).reshape(B, S, 8)
    for b in range(B):
        np.testing.assert_array_equal(packed_idx[b] - b * N, batched[b])


def test_packed_matches_batched_pointnext(rng):
    B, N = 2, 256
    pts = rng.rand(B, N, 4).astype(np.float32)

    batched = PointNext(CFG)
    variables = batched.init(jax.random.PRNGKey(0), jnp.asarray(pts))
    want = np.asarray(batched.apply(variables, jnp.asarray(pts)))

    packed = PointNextPacked(CFG)
    offsets = jnp.asarray(np.arange(1, B + 1) * N, dtype=np.int32)
    got = np.asarray(
        packed.apply(variables, jnp.asarray(pts.reshape(-1, 4)), offsets)
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_packed_jits_and_train_mode(rng):
    B, N = 2, 256
    pts = jnp.asarray(rng.rand(B * N, 4).astype(np.float32))
    offsets = jnp.asarray(np.arange(1, B + 1) * N, dtype=np.int32)
    model = PointNextPacked(CFG)
    variables = model.init(jax.random.PRNGKey(0), pts, offsets)
    out = jax.jit(lambda v, p, o: model.apply(v, p, o))(variables, pts, offsets)
    assert out.shape == (2, 256)
    out2, mutated = model.apply(
        variables, pts, offsets, train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(1)},
    )
    assert out2.shape == (2, 256)
    assert jax.tree.leaves(mutated["batch_stats"])
