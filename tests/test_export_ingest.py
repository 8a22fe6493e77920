"""Contract test: scripts/export_datasets.py's npz output is exactly
what data/ogb.py's npz fallback reads.

The export script runs in an ogb-enabled environment we don't have, so
this test fakes the tiny slice of the ogb API it touches (torch IS in
this image) and round-trips: fake ogb -> export_one -> read_data_ogb
-> one forward pass. A format drift between the two sides would
otherwise only surface at the real-data milestone."""
import importlib.util
import os
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_export_module():
    spec = importlib.util.spec_from_file_location(
        "export_datasets", os.path.join(REPO, "scripts/export_datasets.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class _FakeData:
    def __init__(self, num_nodes, edge_index, edge_weight=None, x=None):
        self.num_nodes = num_nodes
        self.edge_index = edge_index
        self.edge_weight = edge_weight
        self.x = x


class _FakeDataset:
    def __init__(self, data, split):
        self._data, self._split = data, split

    def __getitem__(self, i):
        return self._data

    def get_edge_split(self):
        return self._split


def _install_fake_ogb(monkeypatch, factory):
    ogb = types.ModuleType("ogb")
    lpp = types.ModuleType("ogb.linkproppred")
    lpp.PygLinkPropPredDataset = factory
    ogb.linkproppred = lpp
    monkeypatch.setitem(sys.modules, "ogb", ogb)
    monkeypatch.setitem(sys.modules, "ogb.linkproppred", lpp)


def _rand_edges(rng, n, m):
    e = rng.integers(0, n, (m, 2))
    e = e[e[:, 0] != e[:, 1]]
    return torch.as_tensor(e, dtype=torch.int64)


def _fake_collab(rng, n=60):
    train = _rand_edges(rng, n, 220)
    t = len(train)
    ei = torch.cat([train.T, train.flip(1).T], dim=1)
    data = _FakeData(
        n, ei,
        edge_weight=torch.ones(ei.shape[1], 1),
        x=torch.randn(n, 16),
    )
    split = {
        "train": {
            "edge": train,
            "year": torch.randint(2004, 2012, (t,)),
            "weight": torch.randint(1, 4, (t,)),
        },
        "valid": {"edge": _rand_edges(rng, n, 30),
                  "edge_neg": _rand_edges(rng, n, 30)},
        "test": {"edge": _rand_edges(rng, n, 30),
                 "edge_neg": _rand_edges(rng, n, 30)},
    }
    return _FakeDataset(data, split)


def _fake_citation2(rng, n=60):
    train = _rand_edges(rng, n, 220)
    ei = train.T
    data = _FakeData(n, ei, x=torch.randn(n, 16))

    def st(m):
        e = _rand_edges(rng, n, m)
        return {"source_node": e[:, 0], "target_node": e[:, 1]}

    split = {
        "train": st(200),
        "valid": dict(st(25),
                      target_node_neg=torch.as_tensor(
                          rng.integers(0, n, (25, 10)))),
        "test": dict(st(25),
                     target_node_neg=torch.as_tensor(
                         rng.integers(0, n, (25, 10)))),
    }
    # valid/test source/target sizes must match their negs
    for k in ("valid", "test"):
        split[k]["source_node"] = split[k]["source_node"][:25]
        split[k]["target_node"] = split[k]["target_node"][:25]
    return _FakeDataset(data, split)


@pytest.mark.parametrize("name,maker", [
    ("ogbl-collab", _fake_collab),
    ("ogbl-citation2", _fake_citation2),
])
def test_export_then_ingest_roundtrip(tmp_path, monkeypatch, name, maker):
    rng = np.random.default_rng(0)
    fake = maker(rng)
    _install_fake_ogb(monkeypatch, lambda name, root: fake)

    mod = _load_export_module()
    path = mod.export_one(name, str(tmp_path), str(tmp_path))
    assert os.path.exists(path)

    from lpformer_tpu.data.ogb import read_data_ogb
    from lpformer_tpu.models import LPFormerConfig, forward, init_lpformer

    ds = read_data_ogb(
        name, data_dir=str(tmp_path), eps=1e-3,
        cache_dir=str(tmp_path / "ppr"),
    )
    assert ds.num_nodes == 60
    assert len(ds.valid_pos) > 0 and len(ds.test_pos) > 0
    if name == "ogbl-collab":
        # the >=2007 year filter ran at load time
        assert len(ds.train_pos) < 220
        assert ds.graph.edge_w.max() >= 1.0
        assert ds.valid_neg.shape[1] == 2
    else:
        assert ds.valid_neg.shape == (25, 10)  # per-positive target negs

    cfg = LPFormerConfig(dim=16, gnn_layers=1, budget_cn=16,
                         budget_onehop=32, budget_non1hop=32)
    params = init_lpformer(jax.random.PRNGKey(0), cfg, in_dim=16)
    src = jnp.asarray(np.asarray(ds.valid_pos)[:8, 0])
    tgt = jnp.asarray(np.asarray(ds.valid_pos)[:8, 1])
    h = forward(params, cfg, ds.graph, src, tgt, train=False)
    assert bool(jnp.all(jnp.isfinite(h)))
