"""Native host library tests: build, grid subsampling, KD-tree kNN vs
brute force, ball renderer output sanity."""

import shutil

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    shutil.which("make") is None or shutil.which("g++") is None,
    reason="native toolchain unavailable",
)

from ppt_tpu import native


@pytest.fixture(scope="module", autouse=True)
def built():
    native.build_native()


class TestGridSubsample:
    def test_single_voxel_barycenter(self):
        pts = np.array([[0.1, 0.1, 0.1], [0.2, 0.2, 0.2]], dtype=np.float32)
        out, _ = native.grid_subsample(pts, cell=1.0)
        assert out.shape == (1, 3)
        np.testing.assert_allclose(out[0], [0.15, 0.15, 0.15], atol=1e-6)

    def test_separate_voxels(self):
        pts = np.array([[0, 0, 0], [5, 5, 5]], dtype=np.float32)
        out, _ = native.grid_subsample(pts, cell=1.0)
        assert out.shape == (2, 3)

    def test_features_averaged(self):
        pts = np.zeros((4, 3), dtype=np.float32)
        feats = np.arange(8, dtype=np.float32).reshape(4, 2)
        out, out_f = native.grid_subsample(pts, cell=1.0, features=feats)
        assert out.shape == (1, 3)
        np.testing.assert_allclose(out_f[0], feats.mean(0))

    def test_reduces_density(self, rng):
        pts = rng.rand(5000, 3).astype(np.float32)
        out, _ = native.grid_subsample(pts, cell=0.2)
        assert 50 <= len(out) <= 216  # ~5^3..6^3 occupied cells


class TestKnn:
    def test_matches_bruteforce(self, rng):
        q = rng.randn(50, 3).astype(np.float32)
        s = rng.randn(200, 3).astype(np.float32)
        idx = native.knn(q, s, 5)
        d = ((q[:, None, :] - s[None, :, :]) ** 2).sum(-1)
        want = np.argsort(d, axis=1)[:, :5]
        dd_got = np.take_along_axis(d, idx.astype(np.int64), axis=1)
        dd_want = np.take_along_axis(d, want, axis=1)
        np.testing.assert_allclose(dd_got, dd_want, rtol=1e-5, atol=1e-6)

    def test_self_query(self, rng):
        s = rng.randn(100, 3).astype(np.float32)
        idx = native.knn(s, s, 1)
        np.testing.assert_array_equal(idx[:, 0], np.arange(100))

    def test_batch(self, rng):
        q = rng.randn(3, 20, 3).astype(np.float32)
        s = rng.randn(3, 80, 3).astype(np.float32)
        idx = native.knn_batch(q, s, 4)
        assert idx.shape == (3, 20, 4)
        for b in range(3):
            single = native.knn(q[b], s[b], 4)
            np.testing.assert_array_equal(idx[b], single)


class TestRenderer:
    def test_renders_colored_ball(self):
        pts = np.zeros((1, 3), dtype=np.float32)
        cols = np.array([[255, 0, 0]], dtype=np.uint8)
        img = native.render_balls(pts, cols, size=(64, 64), radius=5)
        assert img.shape == (64, 64, 3)
        center = img[32, 32]
        assert center[0] > 100 and center[1] == 0 and center[2] == 0
        assert (img[0, 0] == 255).all()  # background

    def test_zbuffer_occlusion(self):
        pts = np.array([[0, 0, 0.5], [0, 0, -0.5]], dtype=np.float32)
        cols = np.array([[0, 255, 0], [255, 0, 0]], dtype=np.uint8)
        img = native.render_balls(pts, cols, size=(64, 64), radius=5)
        center = img[32, 32]
        assert center[1] > center[0]  # nearer (green, z=0.5) wins


class TestFpsBatch:
    """ppt_fps_batch: exact match with the start-0 numpy FPS recurrence
    (same min-distance/argmax algorithm as ops.farthest_point_sample)."""

    def _fps0(self, p, m):
        N = p.shape[0]
        out = np.zeros(m, dtype=np.int64)
        dist = np.full(N, 1e10)
        far = 0
        for i in range(m):
            out[i] = far
            d = ((p - p[far]) ** 2).sum(1)
            dist = np.minimum(dist, d)
            far = int(np.argmax(dist))
        return out

    def test_exact_vs_numpy(self, rng):
        pts = rng.rand(3, 256, 3).astype(np.float32)
        idx = native.fps_batch(pts, 64)
        assert idx.shape == (3, 64)
        for b in range(3):
            np.testing.assert_array_equal(
                idx[b].astype(np.int64), self._fps0(pts[b], 64)
            )

    def test_modelnet_scale_load(self, rng):
        """A 64x8192 corpus re-FPS-es in well under a second per cloud
        (the numpy loop needs seconds per cloud)."""
        import time

        pts = rng.rand(64, 8192, 3).astype(np.float32)
        native.fps_batch(pts[:1], 128)  # warm the .so
        t0 = time.time()
        idx = native.fps_batch(pts, 1024)
        per_cloud = (time.time() - t0) / 64
        assert idx.shape == (64, 1024)
        # generous bound: CI boxes are contended; numpy needs > 1 s/cloud
        assert per_cloud < 0.25, f"{per_cloud:.3f}s per cloud"
