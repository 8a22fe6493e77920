#!/usr/bin/env python
"""Generate a synthetic ogbl-collab-scale npz in the exact
scripts/export_datasets.py schema, for the real-data dress rehearsal.

No real OGB data can enter this image (no ogb package, no egress —
DATA_REQUEST.md), so this writes a statistically collab-like file at
ogbl-collab's exact scale and schema:

  * 235,868 nodes, ~1.18M train collaborations with YEAR (1995-2019) and
    WEIGHT fields, including repeated (u, v) pairs across years — the
    duplicate-multiplicity case the batch-masking semantics depend on
    (reference read_datasets.py:34-36 applies the >=2007 filter at load)
  * degree-skewed (Zipf-ish) endpoints, like collaboration networks
  * valid/test splits at collab's sizes (60,084 / 46,329 positives,
    100,000 shared negatives each)
  * x: [N, 128] float32 features

Running the ACTUAL replication command against it certifies every line
of the real-data path — reader, year filter, PPR cache, budget audit,
train, eval, best-checkpoint, logger — except the file contents
(reference flow: src/run.py:90-148).

Usage: python scripts/make_rehearsal_npz.py --out /tmp/rehearsal
       python -m lpformer_tpu.cli.run --data_name ogbl-collab \
           --data-dir /tmp/rehearsal ... (replicate_existing.sh:18)
"""
from __future__ import annotations

import argparse
import os

import numpy as np

N_NODES = 235_868
N_TRAIN = 1_179_052
N_VALID = 60_084
N_TEST = 46_329
N_NEG = 100_000


def _zipf_pairs(rng, n_nodes, count, s=0.35):
    """Degree-skewed endpoint pairs (no self loops): endpoints drawn
    from a rank^-s power-law node distribution (s=0.35 gives a
    collab-like degree profile at this scale — mean ~10, max a few
    hundred — rather than one super-hub)."""
    w = np.arange(1, n_nodes + 1, dtype=np.float64) ** -s
    cdf = np.cumsum(w / w.sum())
    perm = rng.permutation(n_nodes)
    u = np.searchsorted(cdf, rng.random(count * 2))
    ids = perm[np.minimum(u, n_nodes - 1)].reshape(2, count)
    keep = ids[0] != ids[1]
    return ids[:, keep]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", type=str, default="/tmp/rehearsal")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--scale", type=float, default=1.0,
                    help="shrink factor for a faster rehearsal "
                         "(1.0 = full ogbl-collab scale)")
    args = ap.parse_args()
    rng = np.random.default_rng(args.seed)

    s = args.scale
    n_nodes = max(int(N_NODES * s), 1000)
    n_train = int(N_TRAIN * s)
    n_valid, n_test, n_neg = int(N_VALID * s), int(N_TEST * s), int(N_NEG * s)

    pairs = _zipf_pairs(rng, n_nodes, int(n_train * 1.35))
    need = n_train + n_valid + n_test
    while pairs.shape[1] < need:
        pairs = np.concatenate(
            [pairs, _zipf_pairs(rng, n_nodes, need)], axis=1)
    # valid/test positives must be distinct pairs outside train
    key = pairs[0].astype(np.int64) * n_nodes + pairs[1]
    _, first = np.unique(key, return_index=True)
    uniq_mask = np.zeros(pairs.shape[1], bool)
    uniq_mask[first] = True
    uniq_idx = np.flatnonzero(uniq_mask)
    rng.shuffle(uniq_idx)
    va = pairs[:, uniq_idx[:n_valid]].T
    te = pairs[:, uniq_idx[n_valid:n_valid + n_test]].T
    rest = np.setdiff1d(np.arange(pairs.shape[1]),
                        uniq_idx[:n_valid + n_test], assume_unique=False)
    tr = pairs[:, rest[:n_train]].T
    # collab repeats (u, v) across years (~3% of rows): overwrite the
    # tail with copies of earlier rows so duplicate-multiplicity masking
    # (reference train_model.py:38-45) is exercised by the rehearsal
    n_dup = n_train // 32
    tr[-n_dup:] = tr[rng.integers(0, n_train - n_dup, n_dup)]
    assert len(tr) == n_train, (len(tr), n_train)

    years = rng.choice(
        np.arange(1995, 2020),
        p=np.linspace(1, 4, 25) / np.linspace(1, 4, 25).sum(),
        size=n_train,
    ).astype(np.int64)
    weights = (1 + rng.geometric(0.55, n_train)).astype(np.int64)

    ei = np.concatenate([tr.T, tr.T[::-1]], axis=1).astype(np.int64)
    ew = np.concatenate([weights, weights]).astype(np.float32)

    out = {
        "num_nodes": n_nodes,
        "edge_index": ei,
        "edge_weight": ew,
        "x": rng.standard_normal((n_nodes, 128)).astype(np.float32),
        "train_pos": tr.astype(np.int64),
        "train_year": years,
        "train_weight": weights,
        "valid_pos": va.astype(np.int64),
        "valid_neg": rng.integers(
            0, n_nodes, (n_neg, 2)).astype(np.int64),
        "test_pos": te.astype(np.int64),
        "test_neg": rng.integers(
            0, n_nodes, (n_neg, 2)).astype(np.int64),
    }
    os.makedirs(args.out, exist_ok=True)
    path = os.path.join(args.out, "ogbl-collab.npz")
    np.savez_compressed(path, **out)
    deg = np.bincount(ei[0], minlength=n_nodes)
    tr_key = tr[:, 0].astype(np.int64) * n_nodes + tr[:, 1]
    print(f"wrote {path}: n={n_nodes} train={len(tr)} "
          f"(dup rows: {len(tr) - len(np.unique(tr_key))}) "
          f"valid={len(va)} test={len(te)} negs={n_neg} "
          f"deg mean={deg.mean():.1f} max={deg.max()}")


if __name__ == "__main__":
    main()
