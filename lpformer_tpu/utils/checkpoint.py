"""Checkpointing with true resume.

The reference saves {model, score_func, optimizer} state dicts on
best-valid improvement and reloads only for eval
(reference: src/util/utils.py:21-51 — no mid-training resume). Here a
checkpoint carries params + optimizer state + step + PRNG key + epoch so
training can genuinely resume. Format: a pickle of (treedef, numpy
leaves) — same-codebase loads only; not stable across JAX versions the
way key-path npz / orbax checkpoints would be.
"""
from __future__ import annotations

import os
import pickle
from typing import Any, Dict, Optional

import jax
import numpy as np


def save_checkpoint(path: str, state: Dict[str, Any]) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    leaves, treedef = jax.tree_util.tree_flatten(state)
    np_leaves = [np.asarray(x) for x in leaves]
    with open(path, "wb") as f:
        pickle.dump(
            {"treedef": treedef, "leaves": np_leaves},
            f,
            protocol=pickle.HIGHEST_PROTOCOL,
        )


def load_checkpoint(path: str) -> Optional[Dict[str, Any]]:
    if not os.path.exists(path):
        return None
    with open(path, "rb") as f:
        blob = pickle.load(f)
    return jax.tree_util.tree_unflatten(blob["treedef"], blob["leaves"])
