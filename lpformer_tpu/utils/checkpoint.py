"""Versioned, pickle-free checkpointing with true resume.

The reference saves {model, score_func, optimizer} torch state dicts on
best-valid improvement and reloads only for eval
(reference: src/util/utils.py:21-51 — no mid-training resume). Here a
checkpoint carries params + optimizer state + step + epoch + seed so
training can genuinely resume.

Format (version 1): a single ``.npz`` zip holding one array per pytree
leaf under machine names (``leaf_00000`` ...), plus a ``__manifest__``
JSON blob mapping each leaf to its structural key path (dict key /
sequence index / namedtuple attr). No pickled objects anywhere — loads
are safe on untrusted files and stable across JAX/optax versions:

  * ``load_checkpoint(path)`` rebuilds a generic nested dict/list tree —
    enough for every eval path (``state["params"]`` has the exact
    init_lpformer shape).
  * ``load_checkpoint(path, target=...)`` restores INTO the structure of
    ``target`` (leaves matched by key path, validated both ways) — this
    is how resume rebuilds the optax optimizer state, whose namedtuple
    classes cannot (and should not) be reconstructed from a file.

Writes are atomic (temp file + ``os.replace``) so a crash mid-save never
corrupts the previous crash-recovery checkpoint.

Legacy: files written by the round-2 pickle format are detected by
magic but are NOT loaded by default — pickle can execute arbitrary
code, so reading one requires an explicit
``load_checkpoint(path, allow_legacy_pickle=True)`` opt-in from the
caller (the ``target`` argument is ignored for them). The pickle
writer is gone; re-save any old checkpoint to migrate.

Dtype safety: ``np.savez`` silently degrades non-native dtypes (an
ml_dtypes bfloat16 leaf would round-trip as a raw ``|V2`` void array).
Saves therefore verify every leaf dtype survives the npz descr
round-trip; leaves that don't are stored as float32 with the original
dtype recorded in the manifest and cast back on load.
"""
from __future__ import annotations

import json
import os
import zipfile
from typing import Any, Dict, List, Optional, Tuple

import jax
import numpy as np

FORMAT_NAME = "lpformer-tpu-ckpt"
FORMAT_VERSION = 1

_KEY_TYPES = None


def _key_types():
    global _KEY_TYPES
    if _KEY_TYPES is None:
        tu = jax.tree_util
        _KEY_TYPES = (
            (tu.DictKey, "d", lambda k: k.key),
            (tu.SequenceKey, "s", lambda k: k.idx),
            (tu.GetAttrKey, "a", lambda k: k.name),
            (tu.FlattenedIndexKey, "i", lambda k: k.key),
        )
    return _KEY_TYPES


def _path_components(path) -> List[Tuple[str, Any]]:
    comps: List[Tuple[str, Any]] = []
    for k in path:
        for cls, tag, get in _key_types():
            if isinstance(k, cls):
                comps.append((tag, get(k)))
                break
        else:
            raise TypeError(f"unsupported pytree key {k!r} in checkpoint")
    return comps


def _canon(comps) -> str:
    return "/".join(f"{t}:{v}" for t, v in comps)


def _npz_safe_dtype(dt: np.dtype) -> bool:
    """True iff np.lib.format preserves this dtype exactly (ml_dtypes
    extension dtypes like bfloat16 serialize as raw void and lose their
    identity silently)."""
    try:
        return np.lib.format.descr_to_dtype(
            np.lib.format.dtype_to_descr(dt)
        ) == dt
    except Exception:
        return False


def save_checkpoint(path: str, state: Dict[str, Any]) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    flat, _ = jax.tree_util.tree_flatten_with_path(state)
    arrays: Dict[str, np.ndarray] = {}
    entries = []
    for i, (p, leaf) in enumerate(flat):
        name = f"leaf_{i:05d}"
        arr = np.asarray(leaf)
        entry = {"name": name, "path": _path_components(p)}
        if not _npz_safe_dtype(arr.dtype):
            # store as f32, remember the true dtype for the load-side cast
            entry["dtype"] = str(arr.dtype)
            arr = arr.astype(np.float32)
        arrays[name] = arr
        entries.append(entry)
    manifest = {
        "format": FORMAT_NAME,
        "version": FORMAT_VERSION,
        "paths": entries,
    }
    arrays["__manifest__"] = np.frombuffer(
        json.dumps(manifest).encode("utf-8"), dtype=np.uint8
    ).copy()
    tmp = path + ".tmp.npz"
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    os.replace(tmp, path)


def _reconstruct(entries: List[Tuple[List[Tuple[str, Any]], np.ndarray]]):
    """Generic nested structure from (path components, leaf) pairs:
    dict keys / attr names / flat-index keys become dict entries;
    sequence indices become lists."""
    if len(entries) == 1 and not entries[0][0]:
        return entries[0][1]  # the whole state is a single leaf
    root: Dict[Tuple[str, Any], Any] = {}
    for comps, arr in entries:
        cur = root
        for ci, (t, v) in enumerate(comps):
            key = (t, v)
            if ci == len(comps) - 1:
                cur[key] = arr
            else:
                cur = cur.setdefault(key, {})

    def finalize(node):
        if not isinstance(node, dict):
            return node
        if node and all(t == "s" for t, _ in node):
            idxs = sorted(v for _, v in node)
            assert idxs == list(range(len(idxs))), (
                f"non-contiguous sequence indices in checkpoint: {idxs}"
            )
            return [finalize(node[("s", i)]) for i in idxs]
        return {v: finalize(child) for (t, v), child in node.items()}

    return finalize(root)


def _load_npz(path: str, target: Optional[Any]):
    with np.load(path, allow_pickle=False) as z:
        manifest = json.loads(bytes(z["__manifest__"].tobytes()).decode())
        if manifest.get("format") != FORMAT_NAME:
            raise ValueError(f"{path}: not a {FORMAT_NAME} file")
        if manifest.get("version", 0) > FORMAT_VERSION:
            raise ValueError(
                f"{path}: checkpoint version {manifest['version']} is newer "
                f"than this build supports ({FORMAT_VERSION})"
            )
        def _leaf(e):
            arr = z[e["name"]]
            if "dtype" in e:  # stored upcast to f32; restore true dtype
                import ml_dtypes  # noqa: F401  (registers the dtypes)

                arr = arr.astype(np.dtype(e["dtype"]))
            return arr

        entries = [
            ([tuple(c) for c in e["path"]], _leaf(e))
            for e in manifest["paths"]
        ]
    if target is None:
        return _reconstruct(entries)
    by_canon = {_canon(comps): arr for comps, arr in entries}
    flat, treedef = jax.tree_util.tree_flatten_with_path(target)
    want = [_canon(_path_components(p)) for p, _ in flat]
    missing = [c for c in want if c not in by_canon]
    extra = sorted(set(by_canon) - set(want))
    if missing or extra:
        raise ValueError(
            f"{path}: checkpoint does not match the target structure.\n"
            f"  missing from file: {missing[:5]}{'...' if len(missing) > 5 else ''}\n"
            f"  not in target:     {extra[:5]}{'...' if len(extra) > 5 else ''}"
        )
    return jax.tree_util.tree_unflatten(
        treedef, [by_canon[c] for c in want]
    )


def _load_legacy_pickle(path: str):
    # round-2 format: pickle of {"treedef", "leaves"} — same-codebase
    # loads only; kept readable for one round so old checkpoints migrate
    import pickle

    with open(path, "rb") as f:
        blob = pickle.load(f)
    return jax.tree_util.tree_unflatten(blob["treedef"], blob["leaves"])


_PICKLE_MAGIC = b"\x80"  # pickle protocol-2+ opcode PROTO


def load_checkpoint(
    path: str,
    target: Optional[Any] = None,
    allow_legacy_pickle: bool = False,
) -> Optional[Dict[str, Any]]:
    """Load a checkpoint. ``target``: an arbitrary pytree whose structure
    the leaves are restored into (required to rebuild optimizer-state
    namedtuples; ignored for legacy pickle files). Returns None if the
    file does not exist.

    Legacy round-2 pickle files are refused unless the caller passes
    ``allow_legacy_pickle=True`` — unpickling executes arbitrary code,
    so it must be an explicit per-call decision on a trusted file, never
    a silent fallback.
    """
    if not os.path.exists(path):
        return None
    if zipfile.is_zipfile(path):
        return _load_npz(path, target)
    with open(path, "rb") as f:
        head = f.read(1)
    if head == _PICKLE_MAGIC:
        if not allow_legacy_pickle:
            raise ValueError(
                f"{path}: legacy round-2 pickle checkpoint. Loading it "
                f"executes pickle (arbitrary code); if you trust this "
                f"file, pass allow_legacy_pickle=True and re-save it to "
                f"migrate to the npz format."
            )
        return _load_legacy_pickle(path)
    raise ValueError(f"{path}: not a {FORMAT_NAME} npz checkpoint")
