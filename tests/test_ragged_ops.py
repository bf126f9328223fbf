"""Packed/offset point-op tests: results must match the batched ops
applied per cloud."""

import numpy as np
import jax.numpy as jnp
import pytest

from ppt_tpu import ops
from ppt_tpu.ops.ragged import (
    aggregation_packed,
    farthest_point_sample_packed,
    grouping_packed,
    interpolation_packed,
    knn_query_packed,
    segment_ids_from_offsets,
    subtraction_packed,
)


@pytest.fixture
def packed(rng):
    sizes = [40, 64, 28]
    clouds = [rng.rand(n, 3).astype(np.float32) for n in sizes]
    points = np.concatenate(clouds)
    offsets = np.cumsum(sizes).astype(np.int32)
    return clouds, points, offsets


def test_segment_ids(packed):
    clouds, points, offsets = packed
    seg = np.asarray(segment_ids_from_offsets(jnp.asarray(offsets), len(points)))
    want = np.concatenate([np.full(len(c), i) for i, c in enumerate(clouds)])
    np.testing.assert_array_equal(seg, want)


def test_knn_respects_boundaries(packed):
    clouds, points, offsets = packed
    idx, d = knn_query_packed(
        4, jnp.asarray(points), jnp.asarray(offsets),
        jnp.asarray(points), jnp.asarray(offsets),
    )
    idx = np.asarray(idx)
    seg = np.concatenate([np.full(len(c), i) for i, c in enumerate(clouds)])
    # every neighbor stays within the query's cloud
    np.testing.assert_array_equal(seg[idx], seg[:, None].repeat(4, 1))
    # self is the nearest
    np.testing.assert_array_equal(idx[:, 0], np.arange(len(points)))


def test_knn_matches_batched_per_cloud(packed):
    clouds, points, offsets = packed
    q = points
    idx, _ = knn_query_packed(
        3, jnp.asarray(points), jnp.asarray(offsets),
        jnp.asarray(q), jnp.asarray(offsets),
    )
    idx = np.asarray(idx)
    start = 0
    for c in clouds:
        want = np.asarray(ops.knn_point(3, jnp.asarray(c[None]), jnp.asarray(c[None])))[0]
        got = idx[start : start + len(c)] - start
        np.testing.assert_array_equal(np.sort(got, -1), np.sort(want, -1))
        start += len(c)


def test_fps_packed_matches_batched(packed):
    clouds, points, offsets = packed
    out = np.asarray(
        farthest_point_sample_packed(jnp.asarray(points), jnp.asarray(offsets), 8)
    )
    start = 0
    for b, c in enumerate(clouds):
        want = np.asarray(ops.farthest_point_sample(jnp.asarray(c[None]), 8))[0]
        np.testing.assert_array_equal(out[b] - start, want)
        start += len(c)


def test_interpolation_exact_at_sources(packed):
    clouds, points, offsets = packed
    rng = np.random.RandomState(1)
    feats = rng.randn(len(points), 5).astype(np.float32)
    got = np.asarray(
        interpolation_packed(
            jnp.asarray(points), jnp.asarray(offsets),
            jnp.asarray(points), jnp.asarray(offsets),
            jnp.asarray(feats),
        )
    )
    np.testing.assert_allclose(got, feats, rtol=1e-3, atol=1e-3)


def test_grouping_subtraction_aggregation(packed, rng):
    clouds, points, offsets = packed
    feats = rng.randn(len(points), 6).astype(np.float32)
    idx, _ = knn_query_packed(
        4, jnp.asarray(points), jnp.asarray(offsets),
        jnp.asarray(points), jnp.asarray(offsets),
    )
    grouped = np.asarray(grouping_packed(jnp.asarray(feats), idx))
    assert grouped.shape == (len(points), 4, 6)
    np.testing.assert_array_equal(grouped, feats[np.asarray(idx)])

    sub = np.asarray(subtraction_packed(jnp.asarray(feats), jnp.asarray(feats), idx))
    np.testing.assert_allclose(sub[:, 0], 0, atol=1e-6)  # self-neighbor first

    w = np.full((len(points), 4, 1), 0.25, np.float32)
    agg = np.asarray(aggregation_packed(jnp.asarray(grouped), jnp.asarray(w)))
    np.testing.assert_allclose(agg, grouped.mean(1), rtol=1e-5)
