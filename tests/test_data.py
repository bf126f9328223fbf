"""Data layer tests: augmentations match reference distributions/shapes,
loader sharding semantics, few-shot sampling."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from ppt_tpu.data import (
    Loader,
    append_height,
    generate_fewshot,
    make_synthetic,
    normalize_to_unit_sphere,
    random_point_dropout,
    rotate_y,
    shuffle_points,
    translate_pointcloud,
)
from ppt_tpu.data.datasets import pc_normalize


class TestAugment:
    def test_normalize(self, rng):
        pc = jnp.asarray(rng.randn(3, 50, 3).astype(np.float32) * 5 + 2)
        out = np.asarray(normalize_to_unit_sphere(pc))
        for b in range(3):
            np.testing.assert_allclose(out[b].mean(0), 0, atol=1e-5)
            assert abs(np.linalg.norm(out[b], axis=1).max() - 1.0) < 1e-5
            # matches the host-side loader version
            np.testing.assert_allclose(
                out[b], pc_normalize(np.asarray(pc)[b]), rtol=1e-4, atol=1e-5
            )

    def test_translate_ranges(self, rng):
        pc = jnp.ones((100, 4, 3))
        out = np.asarray(translate_pointcloud(jax.random.PRNGKey(0), pc))
        # scale in [2/3, 3/2], shift in [-0.2, 0.2] -> bounds [2/3-0.2, 1.5+0.2]
        assert out.min() >= 2 / 3 - 0.2 - 1e-6
        assert out.max() <= 1.5 + 0.2 + 1e-6

    def test_rotate_preserves_norms(self, rng):
        pc = jnp.asarray(rng.randn(4, 32, 3).astype(np.float32))
        out = rotate_y(jax.random.PRNGKey(1), pc)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(out), axis=-1),
            np.linalg.norm(np.asarray(pc), axis=-1),
            rtol=1e-4,
        )
        # y unchanged
        np.testing.assert_allclose(
            np.asarray(out)[..., 1], np.asarray(pc)[..., 1], rtol=1e-5
        )

    def test_dropout_replaces_with_first(self, rng):
        pc = jnp.asarray(rng.randn(4, 64, 3).astype(np.float32))
        out = np.asarray(random_point_dropout(jax.random.PRNGKey(2), pc))
        src = np.asarray(pc)
        for b in range(4):
            changed = ~np.all(out[b] == src[b], axis=1)
            if changed.any():
                np.testing.assert_array_equal(
                    out[b][changed], np.broadcast_to(src[b, 0], (changed.sum(), 3))
                )

    def test_shuffle_is_permutation(self, rng):
        pc = jnp.asarray(rng.randn(3, 32, 3).astype(np.float32))
        out = np.asarray(shuffle_points(jax.random.PRNGKey(3), pc))
        for b in range(3):
            a = {tuple(r) for r in np.asarray(pc)[b]}
            c = {tuple(r) for r in out[b]}
            assert a == c

    def test_height_channel(self, rng):
        pc = jnp.asarray(rng.randn(2, 16, 3).astype(np.float32))
        out = np.asarray(append_height(pc))
        assert out.shape == (2, 16, 4)
        h = out[..., 3]
        assert (h >= 0).all()
        np.testing.assert_allclose(h.min(axis=1), 0, atol=1e-6)


class TestDatasets:
    def test_synthetic_learnable_structure(self):
        ds = make_synthetic(num_classes=4, samples_per_class=6, npoints=64)
        assert len(ds) == 24
        assert ds.points.shape == (24, 64, 3)
        assert sorted(set(ds.labels.tolist())) == [0, 1, 2, 3]

    def test_fewshot_sampling(self):
        ds = make_synthetic(num_classes=5, samples_per_class=10, npoints=32)
        fs = generate_fewshot(ds, nshots=3, seed=0)
        assert len(fs) == 15
        counts = np.bincount(fs.labels, minlength=5)
        np.testing.assert_array_equal(counts, 3)

    def test_fewshot_with_replacement(self):
        ds = make_synthetic(num_classes=3, samples_per_class=2, npoints=16)
        fs = generate_fewshot(ds, nshots=5)
        assert len(fs) == 15  # repeats when scarce

    def test_partseg_synthetic(self):
        ds = make_synthetic(num_classes=4, samples_per_class=2, npoints=64, partseg=True)
        assert ds.seg_labels.shape == (8, 64)
        from ppt_tpu.data.datasets import SHAPENETPART_PART_RANGES

        for i in range(8):
            lo, hi = SHAPENETPART_PART_RANGES[ds.labels[i]]
            assert ds.seg_labels[i].min() >= lo
            assert ds.seg_labels[i].max() < hi


class TestLoader:
    def test_batching_drop_last(self):
        ds = make_synthetic(num_classes=2, samples_per_class=10, npoints=16)
        loader = Loader(ds, batch_size=8, drop_last=True,
                        num_processes=1, process_index=0)
        batches = list(loader)
        assert len(batches) == 2
        assert all(b["pc"].shape == (8, 16, 3) for b in batches)

    def test_pad_last_with_mask(self):
        ds = make_synthetic(num_classes=2, samples_per_class=5, npoints=16)
        loader = Loader(ds, batch_size=8, num_processes=1, process_index=0)
        batches = list(loader)
        assert len(batches) == 2
        assert batches[-1]["valid"].sum() == 2

    def test_multihost_partition(self):
        ds = make_synthetic(num_classes=2, samples_per_class=8, npoints=16)
        seen = []
        for proc in range(2):
            loader = Loader(ds, batch_size=4, shuffle=True, seed=7,
                            num_processes=2, process_index=proc)
            loader.set_epoch(3)
            for b in loader:
                seen.append(b["label"][b["valid"]])
        # all 16 items covered exactly once across hosts
        total = sum(len(s) for s in seen)
        assert total == 16

    def test_epoch_reshuffle(self):
        ds = make_synthetic(num_classes=2, samples_per_class=16, npoints=8)
        loader = Loader(ds, batch_size=32, shuffle=True,
                        num_processes=1, process_index=0)
        loader.set_epoch(0)
        b0 = next(iter(loader))["pc"].copy()
        loader.set_epoch(1)
        b1 = next(iter(loader))["pc"].copy()
        assert not np.array_equal(b0, b1)


class TestCloudIO:
    """read_cloud / read_pcd — the reference IO surface
    (utils/io.py:26-60: npy/pcd/h5/txt)."""

    def _xyz(self, n=32, seed=0):
        return np.random.RandomState(seed).rand(n, 3).astype(np.float32)

    def test_pcd_ascii(self, tmp_path):
        from ppt_tpu.data.datasets import read_cloud

        xyz = self._xyz()
        p = tmp_path / "cloud.pcd"
        header = (
            "# .PCD v0.7 - Point Cloud Data file format\n"
            "VERSION 0.7\nFIELDS x y z\nSIZE 4 4 4\nTYPE F F F\n"
            f"COUNT 1 1 1\nWIDTH {len(xyz)}\nHEIGHT 1\n"
            f"VIEWPOINT 0 0 0 1 0 0 0\nPOINTS {len(xyz)}\nDATA ascii\n"
        )
        with open(p, "w") as f:
            f.write(header)
            for row in xyz:
                f.write(" ".join(f"{v:.8f}" for v in row) + "\n")
        got = read_cloud(str(p))
        np.testing.assert_allclose(got, xyz, rtol=0, atol=1e-6)

    def test_pcd_binary_with_extra_fields(self, tmp_path):
        from ppt_tpu.data.datasets import read_cloud

        xyz = self._xyz(seed=1)
        rgb = np.random.RandomState(2).randint(
            0, 255, (len(xyz), 1)
        ).astype(np.uint8)
        rec = np.zeros(
            len(xyz),
            dtype=np.dtype(
                [("x", "f4"), ("y", "f4"), ("z", "f4"), ("rgb", "u1")]
            ),
        )
        rec["x"], rec["y"], rec["z"] = xyz[:, 0], xyz[:, 1], xyz[:, 2]
        rec["rgb"] = rgb[:, 0]
        p = tmp_path / "cloud_bin.pcd"
        header = (
            "VERSION 0.7\nFIELDS x y z rgb\nSIZE 4 4 4 1\nTYPE F F F U\n"
            f"COUNT 1 1 1 1\nWIDTH {len(xyz)}\nHEIGHT 1\n"
            f"POINTS {len(xyz)}\nDATA binary\n"
        )
        with open(p, "wb") as f:
            f.write(header.encode())
            f.write(rec.tobytes())
        got = read_cloud(str(p))
        assert got.shape == (len(xyz), 3)
        np.testing.assert_allclose(got, xyz, rtol=0, atol=1e-6)

    def test_pcd_compressed_rejected(self, tmp_path):
        from ppt_tpu.data.datasets import read_pcd

        p = tmp_path / "bad.pcd"
        p.write_text(
            "FIELDS x y z\nSIZE 4 4 4\nTYPE F F F\nCOUNT 1 1 1\n"
            "WIDTH 1\nHEIGHT 1\nPOINTS 1\nDATA binary_compressed\n"
        )
        with pytest.raises(ValueError, match="binary_compressed"):
            read_pcd(str(p))

    def test_npy_txt_h5_dispatch(self, tmp_path):
        from ppt_tpu.data.datasets import read_cloud

        xyz = self._xyz(seed=3)
        np.save(tmp_path / "c.npy", xyz)
        np.savetxt(tmp_path / "c.txt", xyz)
        import h5py

        with h5py.File(tmp_path / "c.h5", "w") as f:
            f.create_dataset("data", data=xyz)
        for name in ("c.npy", "c.txt", "c.h5"):
            got = read_cloud(str(tmp_path / name))
            np.testing.assert_allclose(got, xyz, rtol=0, atol=1e-6)
        with pytest.raises(ValueError, match="Unsupported"):
            read_cloud(str(tmp_path / "c.xyz"))
