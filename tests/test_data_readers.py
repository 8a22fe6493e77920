"""Dataset reader tests against generated fixture files."""
import os

import numpy as np
import pytest

from lpformer_tpu.data.synthetic import random_edges


def _write_planetoid(tmp_path, name="tinyds", n=60, seed=0):
    rng = np.random.default_rng(seed)
    d = tmp_path / name
    d.mkdir(parents=True)
    tr = random_edges(rng, n, 150)
    va = random_edges(rng, n, 30)
    te = random_edges(rng, n, 30)
    vn = random_edges(rng, n, 30)
    tn = random_edges(rng, n, 30)
    # ensure all node ids appear in pos splits so num_nodes == n
    ids = np.arange(n)
    ring = np.stack([ids, (ids + 1) % n], 1)
    tr = np.concatenate([tr, ring])
    for split, arr in (
        ("train_pos", tr), ("valid_pos", va), ("test_pos", te),
        ("valid_neg", vn), ("test_neg", tn),
    ):
        with open(d / f"{split}.txt", "w") as f:
            for a, b in arr:
                f.write(f"{a}\t{b}\n")
    import torch

    feats = torch.randn(n, 12)
    torch.save({"entity_embedding": feats}, d / "gnn_feature")
    return str(tmp_path), name, n, tr, va


def test_planetoid_reader(tmp_path):
    from lpformer_tpu.data.planetoid import read_data_planetoid

    data_dir, name, n, tr, va = _write_planetoid(tmp_path)
    ds = read_data_planetoid(
        name, data_dir=data_dir, eps=1e-3,
        cache_dir=str(tmp_path / "pprcache"),
    )
    assert ds.num_nodes == n
    assert ds.graph.x.shape == (n, 12)
    # self loops skipped, adjacency symmetric support of train edges
    assert len(ds.valid_pos) == len(va)
    assert len(ds.train_pos_val) == len(va)
    # adjacency rows reflect symmetrized train pos
    import jax.numpy as jnp

    nbrs0 = np.asarray(ds.graph.adj_rows.nbrs[0])
    want0 = set(
        tr[tr[:, 0] == 0, 1].tolist() + tr[tr[:, 1] == 0, 0].tolist()
    )
    assert set(nbrs0[nbrs0 < n].tolist()) == want0


def test_planetoid_heart_negatives(tmp_path):
    from lpformer_tpu.data.planetoid import read_data_planetoid

    data_dir, name, n, _, va = _write_planetoid(tmp_path, seed=1)
    hd = tmp_path / "heart" / name
    hd.mkdir(parents=True)
    rng = np.random.default_rng(2)
    vneg = random_edges(rng, n, len(va) * 5).reshape(len(va), 5, 2)
    tneg = random_edges(rng, n, 30 * 5).reshape(30, 5, 2)
    np.save(hd / "heart_valid_samples.npy", vneg)
    np.save(hd / "heart_test_samples.npy", tneg)
    ds = read_data_planetoid(
        name, data_dir=data_dir, heart_dir=str(tmp_path / "heart"),
        eps=1e-3, heart=True, cache_dir=str(tmp_path / "pprcache"),
    )
    assert ds.valid_neg.shape == (len(va), 5, 2)
    assert ds.heart


def test_ogb_npz_roundtrip(tmp_path):
    """npz fallback path of the OGB reader (collab-like, with year
    filter + weights + use_val_in_test)."""
    from lpformer_tpu.data.ogb import read_data_ogb

    rng = np.random.default_rng(3)
    n = 80
    tr = random_edges(rng, n, 240)
    years = rng.integers(2000, 2015, len(tr))
    weights = rng.integers(1, 4, len(tr)).astype(np.float32)
    kept = tr[years >= 2007]
    src = np.concatenate([kept[:, 0], kept[:, 1]])
    dst = np.concatenate([kept[:, 1], kept[:, 0]])
    np.savez_compressed(
        tmp_path / "ogbl-collab.npz",
        num_nodes=n,
        train_pos=tr,
        train_year=years,
        train_weight=weights,
        valid_pos=random_edges(rng, n, 30),
        valid_neg=random_edges(rng, n, 30),
        test_pos=random_edges(rng, n, 30),
        test_neg=random_edges(rng, n, 30),
        edge_index=np.stack([src, dst]),
        edge_weight=np.ones(len(src), np.float32),
        x=rng.standard_normal((n, 8)).astype(np.float32),
    )
    ds = read_data_ogb(
        "ogbl-collab", data_dir=str(tmp_path), eps=1e-3,
        use_val_in_test=True, cache_dir=str(tmp_path / "pprcache"),
    )
    assert ds.metric == "Hits@50"
    # year filter applied
    assert len(ds.train_pos) == (years >= 2007).sum()
    # test graph includes validation edges
    assert ds.graph_test is not ds.graph
    assert ds.graph_test.num_edges >= ds.graph.num_edges


def test_analysis_cn_bins():
    from lpformer_tpu.data.synthetic import synthetic_dataset
    from lpformer_tpu.evalx.analysis import compute_edge_cn, test_by_cn_bins
    from lpformer_tpu.models import LPFormerConfig, init_lpformer
    import jax

    ds = synthetic_dataset(
        seed=5, num_nodes=80, num_train=300, num_eval=30, feat_dim=8
    )
    cn = compute_edge_cn(ds, np.asarray(ds.test_pos))
    assert cn.shape == (30,)
    cfg = LPFormerConfig(
        dim=16, gnn_layers=1, budget_cn=16, budget_onehop=32,
        budget_non1hop=32,
    )
    params = init_lpformer(jax.random.PRNGKey(0), cfg, in_dim=8)
    out = test_by_cn_bins(params, cfg, ds, batch_size=64, k=10)
    assert sum(v["n"] for v in out.values()) == 30


def test_ogb_npz_citation2_layout(tmp_path):
    """citation2-style npz: directed edge_index, [P, K] target-neg arrays."""
    from lpformer_tpu.data.ogb import read_data_ogb

    rng = np.random.default_rng(7)
    n = 70
    tr = random_edges(rng, n, 200)
    np.savez_compressed(
        tmp_path / "ogbl-citation2.npz",
        num_nodes=n,
        train_pos=tr,
        valid_pos=random_edges(rng, n, 20),
        valid_neg=rng.integers(0, n, (20, 9)),
        test_pos=random_edges(rng, n, 20),
        test_neg=rng.integers(0, n, (20, 9)),
        edge_index=np.stack([tr[:, 0], tr[:, 1]]),  # directed
        x=rng.standard_normal((n, 8)).astype(np.float32),
    )
    ds = read_data_ogb(
        "ogbl-citation2", data_dir=str(tmp_path), eps=1e-3,
        cache_dir=str(tmp_path / "pprcache"),
    )
    assert ds.metric == "MRR"
    assert ds.valid_neg.shape == (20, 9)
    # adjacency symmetrized from the directed edge_index
    import numpy as _np
    nb = _np.asarray(ds.graph.adj_rows.nbrs)
    u, v = int(tr[0, 0]), int(tr[0, 1])
    assert v in nb[u][nb[u] < n] and u in nb[v][nb[v] < n]

    # end-to-end citation2 eval runs on this dataset
    import jax
    from lpformer_tpu.evalx import harness
    from lpformer_tpu.models import LPFormerConfig, init_lpformer

    cfg = LPFormerConfig(dim=16, gnn_layers=1, budget_cn=16,
                         budget_onehop=32, budget_non1hop=32)
    params = init_lpformer(jax.random.PRNGKey(0), cfg, in_dim=8)
    r = harness.test_citation2(params, cfg, ds, batch_size=64)
    assert "MRR" in r
