#!/usr/bin/env python
"""Convert a trained reference LPFormer ``.pt`` checkpoint into this
framework's ``.ckpt`` format for ``--checkpoint`` evaluation.

The reference saves ``{"model": state_dict, "score_func": state_dict,
"optimizer": ...}`` per seed (reference: src/util/utils.py:21-35, file
name ``checkpoints/{data}/{name}[_seed-k].pt``). This script maps the
tensors through ``lpformer_tpu.utils.interop.import_reference_state``
and writes ``checkpoints/{data}/{out}[_seed-k].ckpt`` so

    python -m lpformer_tpu.cli.run --data_name ogbl-collab \
        --checkpoint <out> --runs K ...

evaluates the pretrained weights here — real-dataset paper parity with
no retraining. Requires torch (CPU is fine) only to deserialize the
``.pt`` file; the converted checkpoint is torch-free.

Usage:
  python scripts/import_reference_checkpoint.py IN.pt --data ogbl-collab \
      --out imported [--seeds K]
With --seeds K, reads IN_seed-1.pt .. IN_seed-K.pt (IN given without
the .pt extension in that case, matching the reference's multi-seed
naming).
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def convert_one(pt_path: str, ckpt_path: str) -> None:
    import torch

    from lpformer_tpu.utils.checkpoint import save_checkpoint
    from lpformer_tpu.utils.interop import import_reference_state

    state = torch.load(pt_path, map_location="cpu")
    params = import_reference_state(
        {"model": state["model"], "score_func": state["score_func"]}
    )
    n = sum(v.size for v in _leaves(params))
    save_checkpoint(ckpt_path, {"params": params, "step": 0, "epoch": 0})
    print(f"{pt_path} -> {ckpt_path} ({n:,} params)")


def _leaves(tree):
    import jax

    return [x for x in jax.tree_util.tree_leaves(tree)]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("pt", help=".pt file (or basename when --seeds > 1)")
    ap.add_argument("--data", required=True, help="dataset name (output dir)")
    ap.add_argument("--out", default="imported",
                    help="output checkpoint name for --checkpoint")
    ap.add_argument("--seeds", type=int, default=1)
    ap.add_argument("--outdir", default="checkpoints")
    args = ap.parse_args()

    outdir = os.path.join(args.outdir, args.data)
    if args.seeds > 1:
        for k in range(1, args.seeds + 1):
            convert_one(f"{args.pt}_seed-{k}.pt",
                        os.path.join(outdir, f"{args.out}_seed-{k}.ckpt"))
    else:
        convert_one(args.pt, os.path.join(outdir, f"{args.out}.ckpt"))


if __name__ == "__main__":
    main()
