"""Golden tests for ppt_tpu.ops.geometry against brute-force numpy.

The numpy oracles here transcribe the PPT reference semantics
(``models/pointbert/pointnet2_utils.py``) so kernel/ops changes can't
silently drift from the spec.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ppt_tpu import ops


def np_square_distance(src, dst):
    # [B,N,C] x [B,M,C] -> [B,N,M]
    diff = src[:, :, None, :] - dst[:, None, :, :]
    return np.sum(diff**2, axis=-1)


def np_fps(xyz, npoint, start=0):
    B, N, _ = xyz.shape
    out = np.zeros((B, npoint), dtype=np.int64)
    for b in range(B):
        distance = np.full(N, 1e10)
        farthest = start
        for i in range(npoint):
            out[b, i] = farthest
            d = np.sum((xyz[b] - xyz[b, farthest]) ** 2, axis=-1)
            distance = np.minimum(distance, d)
            farthest = int(np.argmax(distance))
    return out


def np_query_ball(radius, nsample, xyz, new_xyz):
    B, N, _ = xyz.shape
    S = new_xyz.shape[1]
    d = np_square_distance(new_xyz, xyz)
    out = np.zeros((B, S, nsample), dtype=np.int64)
    for b in range(B):
        for s in range(S):
            hits = np.where(d[b, s] <= radius**2)[0]
            if len(hits) == 0:
                out[b, s] = N - 1  # clamped sentinel (ref would index OOB)
            elif len(hits) >= nsample:
                out[b, s] = hits[:nsample]
            else:
                out[b, s, : len(hits)] = hits
                out[b, s, len(hits):] = hits[0]
    return out


class TestSquareDistance:
    def test_matches_numpy(self, rng):
        src = rng.randn(2, 17, 3).astype(np.float32)
        dst = rng.randn(2, 29, 3).astype(np.float32)
        got = np.asarray(ops.square_distance(jnp.asarray(src), jnp.asarray(dst)))
        want = np_square_distance(src, dst)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


class TestIndexPoints:
    def test_2d_idx(self, rng):
        pts = rng.randn(3, 50, 7).astype(np.float32)
        idx = rng.randint(0, 50, size=(3, 11))
        got = np.asarray(ops.index_points(jnp.asarray(pts), jnp.asarray(idx)))
        want = np.stack([pts[b][idx[b]] for b in range(3)])
        np.testing.assert_array_equal(got, want)

    def test_3d_idx(self, rng):
        pts = rng.randn(2, 40, 5).astype(np.float32)
        idx = rng.randint(0, 40, size=(2, 8, 6))
        got = np.asarray(ops.index_points(jnp.asarray(pts), jnp.asarray(idx)))
        want = np.stack([pts[b][idx[b].ravel()].reshape(8, 6, 5) for b in range(2)])
        np.testing.assert_array_equal(got, want)


class TestFPS:
    def test_matches_reference_loop(self, rng):
        xyz = rng.randn(2, 64, 3).astype(np.float32)
        got = np.asarray(ops.farthest_point_sample(jnp.asarray(xyz), 16))
        want = np_fps(xyz, 16)
        np.testing.assert_array_equal(got, want)

    def test_start_idx(self, rng):
        xyz = rng.randn(2, 32, 3).astype(np.float32)
        start = np.array([5, 9], dtype=np.int32)
        got = np.asarray(
            ops.farthest_point_sample(jnp.asarray(xyz), 8, start_idx=jnp.asarray(start))
        )
        assert got[0, 0] == 5 and got[1, 0] == 9
        for b in range(2):
            want = np_fps(xyz[b : b + 1], 8, start=int(start[b]))
            np.testing.assert_array_equal(got[b : b + 1], want)

    def test_covers_spread_points(self):
        # FPS from a cluster + one far point must pick the far point 2nd
        xyz = np.zeros((1, 10, 3), dtype=np.float32)
        xyz[0, :9] = np.random.RandomState(1).randn(9, 3) * 0.01
        xyz[0, 9] = [100.0, 0, 0]
        idx = np.asarray(ops.farthest_point_sample(jnp.asarray(xyz), 2))
        assert idx[0, 1] == 9


class TestKNN:
    def test_matches_bruteforce(self, rng):
        xyz = rng.randn(2, 60, 3).astype(np.float32)
        q = rng.randn(2, 13, 3).astype(np.float32)
        got = np.asarray(ops.knn_point(5, jnp.asarray(xyz), jnp.asarray(q)))
        d = np_square_distance(q, xyz)
        want = np.argsort(d, axis=-1, kind="stable")[:, :, :5]
        # compare as sets per query (ties may reorder)
        np.testing.assert_array_equal(np.sort(got, -1), np.sort(want, -1))

    def test_self_knn_first_is_self(self, rng):
        xyz = rng.randn(1, 30, 3).astype(np.float32)
        got = np.asarray(ops.knn_point(4, jnp.asarray(xyz), jnp.asarray(xyz)))
        np.testing.assert_array_equal(got[0, :, 0], np.arange(30))


class TestBallQuery:
    def test_matches_reference(self, rng):
        xyz = rng.rand(2, 80, 3).astype(np.float32)
        q_idx = np_fps(xyz, 10)
        q = np.stack([xyz[b][q_idx[b]] for b in range(2)])
        got = np.asarray(
            ops.query_ball_point(0.2, 8, jnp.asarray(xyz), jnp.asarray(q))
        )
        want = np_query_ball(0.2, 8, xyz, q)
        np.testing.assert_array_equal(got, want)

    def test_pad_with_first(self, rng):
        # sparse points: neighborhoods smaller than nsample get padded
        xyz = (rng.rand(1, 20, 3) * 10).astype(np.float32)
        q = xyz[:, :4]
        got = np.asarray(
            ops.query_ball_point(0.05, 6, jnp.asarray(xyz), jnp.asarray(q))
        )
        want = np_query_ball(0.05, 6, xyz, q)
        np.testing.assert_array_equal(got, want)


class TestSampleAndGroup:
    def test_shapes_and_normalization(self, rng):
        xyz = rng.rand(2, 64, 3).astype(np.float32)
        feats = rng.randn(2, 64, 9).astype(np.float32)
        new_xyz, new_points = ops.sample_and_group(16, 0.4, 8, jnp.asarray(xyz), jnp.asarray(feats))
        assert new_xyz.shape == (2, 16, 3)
        assert new_points.shape == (2, 16, 8, 12)
        # every selected neighbor (incl. padding, which copies an in-ball
        # hit) must lie within the query radius of its center
        rel = np.asarray(new_points)[..., :3]
        d2 = np.sum(rel**2, axis=-1)
        assert np.all(d2 <= 0.4**2 + 1e-6)

    def test_group_all(self, rng):
        xyz = rng.rand(2, 32, 3).astype(np.float32)
        feats = rng.randn(2, 32, 4).astype(np.float32)
        new_xyz, new_points = ops.sample_and_group_all(jnp.asarray(xyz), jnp.asarray(feats))
        assert new_xyz.shape == (2, 1, 3)
        assert new_points.shape == (2, 1, 32, 7)


class TestThreeInterpolate:
    def test_matches_reference(self, rng):
        unknown = rng.rand(2, 24, 3).astype(np.float32)
        known = rng.rand(2, 6, 3).astype(np.float32)
        feats = rng.randn(2, 6, 5).astype(np.float32)
        got = np.asarray(
            ops.three_interpolate(jnp.asarray(unknown), jnp.asarray(known), jnp.asarray(feats))
        )
        d = np_square_distance(unknown, known)
        idx = np.argsort(d, axis=-1)[:, :, :3]
        dd = np.take_along_axis(d, idx, axis=-1)
        w = 1.0 / (dd + 1e-8)
        w = w / w.sum(-1, keepdims=True)
        want = np.zeros((2, 24, 5), dtype=np.float32)
        for b in range(2):
            for n in range(24):
                want[b, n] = (feats[b][idx[b, n]] * w[b, n][:, None]).sum(0)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_exact_at_source_points(self, rng):
        known = rng.rand(1, 8, 3).astype(np.float32)
        feats = rng.randn(1, 8, 4).astype(np.float32)
        got = np.asarray(ops.three_interpolate(jnp.asarray(known), jnp.asarray(known), jnp.asarray(feats)))
        np.testing.assert_allclose(got, feats, rtol=1e-3, atol=1e-3)


class TestGradients:
    def test_grads_flow_through_grouping(self, rng):
        xyz = jnp.asarray(rng.rand(1, 32, 3).astype(np.float32))
        feats = jnp.asarray(rng.randn(1, 32, 4).astype(np.float32))

        def loss(f):
            _, np_ = ops.sample_and_group(8, 0.5, 4, xyz, f)
            return jnp.sum(np_**2)

        g = jax.grad(loss)(feats)
        assert g.shape == feats.shape
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).sum() > 0
