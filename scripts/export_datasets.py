#!/usr/bin/env python
"""Export OGB link-prediction datasets to the npz layout lpformer_tpu reads.

Run this in ANY environment that has `ogb` + `torch` installed (they are
not available in TPU images without egress); copy the resulting
`<out>/<name>.npz` files into the training environment's `--data-dir`.
lpformer_tpu's reader (lpformer_tpu/data/ogb.py:82-110) then loads them
with identical semantics to a live ogb install.

This file is deliberately standalone — no lpformer_tpu (or jax) import —
so it runs in a bare ogb environment:

    pip install ogb torch
    python scripts/export_datasets.py --data ogbl-collab --out dataset/
    python scripts/export_datasets.py --all --out dataset/

npz keys (all optional ones omitted when absent):
    num_nodes     int
    edge_index    [2, E] int64      raw directed edge list
    edge_weight   [E] float32       (collab only)
    x             [N, F] float32    (absent for featureless ddi/ppa)
    train_pos     [T, 2]            (citation2: stacked source/target)
    valid_pos / test_pos  [P, 2]
    valid_neg / test_neg  [P, 2] shared negatives, or [P, K] target-node
                          negatives for citation2
    train_year / train_weight  [T]  (collab only; the >=2007 filter is
                          applied at LOAD time by the reader, mirroring
                          reference src/util/read_datasets.py:34-36)

HeaRT files (heart_{valid,test}_samples.npy, *_samples_index.pt and the
planetoid fixed splits) come from the HeaRT benchmark release and are
read directly by the framework — place them under <data-dir>/heart/<name>/
per lpformer_tpu/data/ogb.py:157-166,222-226.
"""
import argparse
import os

import numpy as np

DATASETS = ("ogbl-collab", "ogbl-ddi", "ogbl-ppa", "ogbl-citation2")


def export_one(data_name: str, root: str, out_dir: str) -> str:
    from ogb.linkproppred import PygLinkPropPredDataset

    dataset = PygLinkPropPredDataset(name=data_name, root=root)
    data = dataset[0]
    split_edge = dataset.get_edge_split()
    out = {"num_nodes": int(data.num_nodes)}
    out["edge_index"] = data.edge_index.numpy()
    if getattr(data, "edge_weight", None) is not None:
        out["edge_weight"] = (
            data.edge_weight.view(-1).numpy().astype(np.float32)
        )
    if getattr(data, "x", None) is not None:
        out["x"] = data.x.numpy().astype(np.float32)

    if data_name != "ogbl-citation2":
        out["train_pos"] = split_edge["train"]["edge"].numpy()
        out["valid_pos"] = split_edge["valid"]["edge"].numpy()
        out["valid_neg"] = split_edge["valid"]["edge_neg"].numpy()
        out["test_pos"] = split_edge["test"]["edge"].numpy()
        out["test_neg"] = split_edge["test"]["edge_neg"].numpy()
        if "collab" in data_name:
            out["train_year"] = split_edge["train"]["year"].numpy()
            out["train_weight"] = split_edge["train"]["weight"].numpy()
    else:
        for split, tag in (("train", "train_pos"), ("valid", "valid_pos"),
                           ("test", "test_pos")):
            s = split_edge[split]["source_node"].numpy()
            t = split_edge[split]["target_node"].numpy()
            out[tag] = np.stack([s, t], axis=1)
        out["valid_neg"] = split_edge["valid"]["target_node_neg"].numpy()
        out["test_neg"] = split_edge["test"]["target_node_neg"].numpy()

    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"{data_name}.npz")
    np.savez_compressed(path, **out)
    sizes = {k: getattr(v, "shape", v) for k, v in out.items()}
    print(f"wrote {path}: {sizes}")
    return path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", type=str, default=None, choices=DATASETS)
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--root", type=str, default="dataset",
                    help="ogb download root")
    ap.add_argument("--out", type=str, default="dataset",
                    help="npz output dir (the framework's --data-dir)")
    args = ap.parse_args()
    names = DATASETS if args.all else [args.data]
    if not names[0]:
        ap.error("pass --data <name> or --all")
    for name in names:
        export_one(name, args.root, args.out)


if __name__ == "__main__":
    main()
