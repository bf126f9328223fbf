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
