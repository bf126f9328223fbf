"""OGB graph-dataset pipeline (ppt_tpu/data/graphs.py) — executed,
dependency-free coverage via record injection (VERDICT r4 item 7).

Reference semantics under test: openpoints/dataset/graph_dataset/
{graph_dataset,svd_encodings_dataset,structural_dataset,stack_with_pad}.py
and the molhiv/pcqm4m reader contracts. Only the raw ogb/rdkit readers
stay gated (asserted below); every transform runs here.
"""

import numpy as np
import pytest

from ppt_tpu.data.graphs import (
    EDGE_FEATURES_OFFSET,
    NODE_FEATURES_OFFSET,
    OGBGraphDataset,
    collate_graphs,
    floyd_warshall,
    read_ogb_records,
    stack_with_pad,
    structural_features,
    svd_encodings,
)


def _random_graph(rng, n, n_edges, fn=3, fe=2):
    edges = rng.randint(0, n, size=(n_edges, 2)).astype(np.int16)
    return {
        "num_nodes": np.array(n, np.int16),
        "edges": edges,
        "node_features": rng.randint(0, 50, size=(n, fn)).astype(np.int16),
        "edge_features": rng.randint(0, 5, size=(n_edges, fe)).astype(np.int16),
        "target": np.float32(rng.rand()),
    }


# ---------------------------------------------------------------------------
# SVD encodings (svd_encodings_dataset.py:79-100 semantics)
# ---------------------------------------------------------------------------

def test_svd_encodings_reconstruct_adjacency():
    # At calculated_dim == num_nodes the factorization is exact:
    # enc[...,0] @ enc[...,1].T == U sqrt(S) (V sqrt(S)).T == A
    rng = np.random.RandomState(0)
    n = 7
    edges = rng.randint(0, n, size=(12, 2))
    enc = svd_encodings(edges, n, calculated_dim=n)
    assert enc.shape == (n, n, 2)
    adj = np.zeros((n, n), np.float32)
    adj[edges[:, 0], edges[:, 1]] = 1.0
    np.fill_diagonal(adj, 1.0)
    np.testing.assert_allclose(enc[..., 0] @ enc[..., 1].T, adj, atol=1e-5)


def test_svd_encodings_truncate_and_pad():
    rng = np.random.RandomState(1)
    edges = rng.randint(0, 10, size=(20, 2))
    assert svd_encodings(edges, 10, calculated_dim=4).shape == (10, 4, 2)
    # fewer nodes than dim -> zero-pad the component axis (ref :95-97)
    enc = svd_encodings(rng.randint(0, 3, size=(4, 2)), 3, calculated_dim=8)
    assert enc.shape == (3, 8, 2)
    np.testing.assert_array_equal(enc[:, 3:, :], 0.0)


# ---------------------------------------------------------------------------
# Floyd–Warshall + structural features (structural_dataset.py:9-47)
# ---------------------------------------------------------------------------

def _fw_oracle(adj):
    # Independent textbook transcription of the scalar triple loop with
    # the reference's init (0 diag, 1 edge, 510 otherwise).
    n = adj.shape[0]
    d = np.zeros((n, n), np.int16)
    for i in range(n):
        for j in range(n):
            if i == j:
                continue
            d[i, j] = 1 if adj[i, j] else 510
    for k in range(n):
        for i in range(n):
            for j in range(n):
                if d[i, k] + d[k, j] < d[i, j]:
                    d[i, j] = d[i, k] + d[k, j]
    return d


@pytest.mark.parametrize("seed,n,p", [(0, 6, 0.3), (1, 9, 0.15), (2, 12, 0.5)])
def test_floyd_warshall_matches_scalar_oracle(seed, n, p):
    rng = np.random.RandomState(seed)
    adj = (rng.rand(n, n) < p).astype(np.int16)
    got = floyd_warshall(adj)
    np.testing.assert_array_equal(got, _fw_oracle(adj))
    assert got.dtype == np.int16


def test_floyd_warshall_unreachable_capped():
    # two isolated components stay at the 510 cap
    adj = np.zeros((4, 4), np.int16)
    adj[0, 1] = adj[2, 3] = 1
    d = floyd_warshall(adj)
    assert d[0, 1] == 1 and d[0, 2] == 510 and d[1, 0] == 510
    np.testing.assert_array_equal(np.diag(d), 0)


def test_structural_features_offsets_and_dense_matrices():
    nf = np.array([[2, 5], [7, 0], [1, 3]], np.int16)
    ef = np.array([[1, 2], [3, 4]], np.int16)
    edges = np.array([[0, 1], [0, 1]], np.int16)  # duplicate: last wins
    out_nf, dist, out_ef = structural_features(3, edges, nf, ef)
    # column c shifts by 1 + c*stride (structural_dataset.py:34-37)
    np.testing.assert_array_equal(
        out_nf, nf + [1, 1 + NODE_FEATURES_OFFSET]
    )
    np.testing.assert_array_equal(
        out_ef[0, 1], ef[1] + [1, 1 + EDGE_FEATURES_OFFSET]
    )
    np.testing.assert_array_equal(out_ef[1, 0], 0)
    assert dist[0, 1] == 1 and dist[1, 0] == 510 and dist[2, 0] == 510


# ---------------------------------------------------------------------------
# Padded stacking / collation (stack_with_pad.py, graph_dataset.py:85-93)
# ---------------------------------------------------------------------------

def test_stack_with_pad_ranks():
    a, b = np.ones((2, 3), np.int16), np.ones((4, 1), np.int16)
    out = stack_with_pad([a, b])
    assert out.shape == (2, 4, 3)
    np.testing.assert_array_equal(out[0, :2, :3], 1)
    np.testing.assert_array_equal(out[0, 2:, :], 0)
    assert stack_with_pad([np.float32(1), np.float32(2)]).shape == (2,)
    assert stack_with_pad([np.ones(3), np.ones(5)]).shape == (2, 5)
    with pytest.raises(ValueError, match="4D"):
        stack_with_pad([np.ones((1, 1, 1, 1, 1))])


def test_collate_graphs_dynamic_vs_static_bucket():
    rng = np.random.RandomState(3)
    ds = OGBGraphDataset(
        records=[_random_graph(rng, 5, 8), _random_graph(rng, 9, 14)],
        svd=True, structural=True, split="validation",
    )
    batch = [ds[0], ds[1]]
    dyn = collate_graphs(batch)
    assert dyn["node_features"].shape == (2, 9, 3)
    assert dyn["distance_matrix"].shape == (2, 9, 9)
    # static bucket: every node axis lands on pad_nodes (XLA one-shape)
    stat = collate_graphs(batch, pad_nodes=16)
    assert stat["node_features"].shape == (2, 16, 3)
    assert stat["distance_matrix"].shape == (2, 16, 16)
    assert stat["feature_matrix"].shape == (2, 16, 16, 2)
    assert stat["svd_encodings"].shape == (2, 16, 16)
    assert stat["node_mask"].shape == (2, 16)
    assert stat["node_mask"].sum() == 5 + 9
    assert stat["target"].shape == (2,)
    # the padded region is zeros; the real region matches the dynamic one
    np.testing.assert_array_equal(
        stat["distance_matrix"][:, :9, :9], dyn["distance_matrix"]
    )
    np.testing.assert_array_equal(stat["distance_matrix"][:, 9:, :], 0)
    with pytest.raises(ValueError, match="pad_nodes"):
        collate_graphs(batch, pad_nodes=8)


def test_collate_preserves_edge_axis():
    # 'edges' leading axis counts EDGES, never padded to pad_nodes
    rng = np.random.RandomState(4)
    batch = [_random_graph(rng, 4, 6), _random_graph(rng, 4, 10)]
    out = collate_graphs(batch, pad_nodes=8)
    assert out["edges"].shape == (2, 10, 2)


# ---------------------------------------------------------------------------
# The dataset end-to-end (mixin-zoo semantics) on injected records
# ---------------------------------------------------------------------------

def test_dataset_transform_order_and_keys():
    rng = np.random.RandomState(5)
    recs = [_random_graph(rng, 6, 9), _random_graph(rng, 11, 20)]
    ds = OGBGraphDataset(records=recs, svd=True, structural=True,
                         split="validation")
    item = ds[1]
    # structural popped the raw keys (structural_dataset.py:63-65)
    assert "edges" not in item and "edge_features" not in item
    assert set(item) == {
        "num_nodes", "target", "node_mask", "svd_encodings",
        "node_features", "distance_matrix", "feature_matrix",
    }
    assert item["svd_encodings"].shape == (11, 16)
    assert item["distance_matrix"].shape == (11, 11)
    assert ds.max_nodes == 11 and len(ds) == 2
    # plain GraphDataset variant keeps the raw keys
    plain = OGBGraphDataset(records=recs, split="validation")
    assert "edges" in plain[0] and "svd_encodings" not in plain[0]
    mb = ds.max_batch(3)
    assert mb["node_features"].shape == (3, 11, 3)


def test_svd_sign_flips_only_on_training_split():
    rng = np.random.RandomState(6)
    recs = [_random_graph(rng, 8, 12)]
    val = OGBGraphDataset(records=recs, svd=True, split="validation")
    np.testing.assert_array_equal(val[0]["svd_encodings"],
                                  val[0]["svd_encodings"])
    train = OGBGraphDataset(records=recs, svd=True, split="training",
                            rng=np.random.RandomState(7))
    a, b = train[0]["svd_encodings"], train[0]["svd_encodings"]
    assert not np.array_equal(a, b)  # fresh flips per access (ref :43-45)
    # flips touch signs only: magnitudes match the deterministic val pass
    np.testing.assert_allclose(np.abs(a), np.abs(val[0]["svd_encodings"]),
                               rtol=1e-6)
    # a whole (u, vh) component pair flips together: columns 2c, 2c+1
    flip = np.sign(a[0] / val[0]["svd_encodings"][0])
    np.testing.assert_array_equal(flip[0::2], flip[1::2])


def test_svd_output_dim_truncation_and_validation():
    rng = np.random.RandomState(8)
    recs = [_random_graph(rng, 9, 15)]
    ds = OGBGraphDataset(records=recs, svd=True, split="validation",
                         calculated_dim=8, output_dim=4)
    full = OGBGraphDataset(records=recs, svd=True, split="validation",
                           calculated_dim=8, output_dim=8)
    item = ds[0]
    assert item["svd_encodings"].shape == (9, 8)
    # truncation keeps the LEADING components (ref :40-41)
    np.testing.assert_allclose(
        item["svd_encodings"],
        full[0]["svd_encodings"].reshape(9, 8, 2)[:, :4, :].reshape(9, 8),
    )
    with pytest.raises(ValueError, match="output_dim"):
        OGBGraphDataset(records=recs, svd=True, calculated_dim=4,
                        output_dim=8)


def test_record_cache_loads_without_ogb(tmp_path):
    """dataset_base.py:62-94 cache semantics: a pre-existing record
    cache satisfies construction with NO raw reader (and hence no ogb)
    — the workflow where records were cached on a machine that has the
    deps and shipped to one that doesn't."""
    import pickle

    rng = np.random.RandomState(9)
    recs = [_random_graph(rng, 5, 7)]
    d = tmp_path / "molhiv" / "training"
    d.mkdir(parents=True)
    with open(d / "records.pkl", "wb") as f:
        pickle.dump(recs, f)
    ds = OGBGraphDataset(name="molhiv", split="training", svd=True,
                         cache_dir=str(tmp_path),
                         rng=np.random.RandomState(10))
    assert len(ds) == 1 and ds[0]["svd_encodings"].shape == (5, 16)
    # absent cache still gates on ogb
    with pytest.raises(ImportError, match="ogb"):
        OGBGraphDataset(name="molhiv", split="validation",
                        cache_dir=str(tmp_path))


def test_ogb_reader_gates_are_explicit():
    with pytest.raises(ImportError, match="ogb"):
        read_ogb_records("molhiv", "/nonexistent", "training")
    with pytest.raises(ImportError, match="ogb"):
        OGBGraphDataset(name="pcqm4mv2", dataset_path="/nonexistent")
    with pytest.raises(KeyError, match="unknown OGB"):
        read_ogb_records("nope", "/nonexistent", "training")
