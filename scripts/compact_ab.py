"""A/B microbench: context-table compaction variants on the real chip.

The r4 step budget flags "context extraction" (10.5 ms of the 65 ms
collab step) as the one large category not at a hardware ceiling
(step_budget.json). Roughly half of it is the per-class budget
compaction in ops/context._compact: a 3-lane one-hot dot_general
(Precision.HIGHEST) per class. This bench compares, at the collab-like
shapes (B=4096; cn [B,64]->64, 1hop [B,128]->128, non1 [B,128]->128):

  onehot   the production _compact (prefix-sum + one-hot dot, 3 lanes)
  sortpack single-operand int32 sort of where(keep, i, i+I) (a stable
           partition: valid slot indices come out first, in order),
           then ONE row-gather of the stacked [B*I, 4] payload
           (ids+1, ps, pt, pad) by flat linear index
  sortflat same sort, then 3 separate flat 1D scalar takes

All variants produce identical tables (asserted on CPU first). The
timing chains a scalar carry through iterations so nothing is DCE'd or
overlapped across calls (same pattern as scripts/stage_profile3.py).

Usage: python scripts/compact_ab.py [--smoke]
"""
from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


from _benchutil import time_chained_ms as _time_chained  # noqa: E402


def make_tables(rng, b, i, n, occupancy):
    ids = np.sort(rng.integers(0, n, size=(b, i)), axis=1).astype(np.int32)
    ps = rng.random((b, i)).astype(np.float32)
    pt = rng.random((b, i)).astype(np.float32)
    keep = rng.random((b, i)) < occupancy
    return ids, ps, pt, keep


def onehot_compact(jnp, jax, ids, ps, pt, keep, budget, n):
    # mirrors ops/context._compact post-threshold (keep precomputed)
    b, i = keep.shape
    pos = jnp.cumsum(keep.astype(jnp.int32), axis=1) - 1
    pos = jnp.where(keep, pos, budget)
    oh = (
        pos[:, :, None] == jnp.arange(budget, dtype=jnp.int32)[None, None, :]
    ).astype(jnp.float32)
    stacked = jnp.stack(
        [ids.astype(jnp.float32) + 1.0, ps, pt], axis=-1
    )
    out = jax.lax.dot_general(
        oh, stacked, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    idsp1 = out[..., 0].astype(jnp.int32)
    v2 = idsp1 > 0
    ids2 = jnp.where(v2, idsp1 - 1, n)
    return ids2, out[..., 1], out[..., 2], v2


def sort_slots(jnp, keep, budget):
    b, i = keep.shape
    iota = jnp.arange(i, dtype=jnp.int32)[None, :]
    key = jnp.where(keep, iota, iota + i)       # stable partition key
    skey = jnp.sort(key, axis=1)[:, :budget]    # [B, O]
    v2 = skey < i
    slot = jnp.where(v2, skey, 0) % i           # %i only guards pads
    return slot, v2


def sortpack_compact(jnp, jax, ids, ps, pt, keep, budget, n):
    b, i = keep.shape
    slot, v2 = sort_slots(jnp, keep, budget)
    payload = jnp.stack(
        [ids.astype(jnp.float32) + 1.0, ps, pt,
         jnp.zeros(ids.shape, jnp.float32)], axis=-1
    ).reshape(b * i, 4)                          # [B*I, 4] rows
    flat = (jnp.arange(b, dtype=jnp.int32)[:, None] * i + slot).reshape(-1)
    rows = payload[flat].reshape(b, budget, 4)
    idsp1 = jnp.where(v2, rows[..., 0].astype(jnp.int32), 0)
    v3 = idsp1 > 0
    ids2 = jnp.where(v3, idsp1 - 1, n)
    z = jnp.where(v3, 1.0, 0.0)
    return ids2, rows[..., 1] * z, rows[..., 2] * z, v3


def sortflat_compact(jnp, jax, ids, ps, pt, keep, budget, n):
    b, i = keep.shape
    slot, v2 = sort_slots(jnp, keep, budget)
    flat = (jnp.arange(b, dtype=jnp.int32)[:, None] * i + slot).reshape(-1)
    ids2 = jnp.take(ids.reshape(-1), flat).reshape(b, budget)
    ps2 = jnp.take(ps.reshape(-1), flat).reshape(b, budget)
    pt2 = jnp.take(pt.reshape(-1), flat).reshape(b, budget)
    v3 = v2 & (ids2 >= 0)
    ids2 = jnp.where(v3, ids2, n)
    z = jnp.where(v3, 1.0, 0.0)
    return ids2, ps2 * z, pt2 * z, v3


def main():
    smoke = "--smoke" in sys.argv
    if smoke:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    import jax.numpy as jnp

    # collab-like bench shapes: adj_cap=96, ppr_cap=256, budgets 64/128/128
    # -> class inputs I = 96 (cn), 192 (1hop: src+tgt adj rows), 256 (non1)
    n = 50_000
    b = 512 if smoke else 4096
    classes = [("cn", 96, 64), ("1hop", 192, 128), ("non1", 256, 128)]
    rng = np.random.default_rng(0)
    data = {
        name: make_tables(rng, b, i, n, occ)
        for (name, i, _), occ in zip(classes, (0.08, 0.25, 0.30))
    }

    # correctness: variants agree (valid entries; invalid cols zeroed)
    for name, i, budget in classes:
        ids, ps, pt, keep = (jnp.asarray(x) for x in data[name])
        a = onehot_compact(jnp, jax, ids, ps, pt, keep, budget, n)
        for f in (sortpack_compact, sortflat_compact):
            c = f(jnp, jax, ids, ps, pt, keep, budget, n)
            for x, y in zip(a, c):
                np.testing.assert_allclose(
                    np.where(np.asarray(a[3]), np.asarray(x), 0),
                    np.where(np.asarray(c[3]), np.asarray(y), 0),
                )
        print(f"parity ok: {name}")

    results = {}
    for vname, f in (
        ("onehot", onehot_compact),
        ("sortpack", sortpack_compact),
        ("sortflat", sortflat_compact),
    ):
        def all_classes(c, *ops):
            # ops = 4 arrays per class, flattened
            k = 0
            acc = c
            for name, i, budget in classes:
                ids, ps, pt, keep = ops[k:k + 4]
                k += 4
                o = f(jnp, jax, ids, ps, pt, keep, budget, n)
                acc = acc + sum(jnp.sum(x.astype(jnp.float32)) for x in o)
            return acc * 1e-9

        flat_ops = []
        for name, _, _ in classes:
            flat_ops.extend(jnp.asarray(x) for x in data[name])
        ms, comp = _time_chained(jax, jnp, all_classes, flat_ops)
        results[vname] = {"ms": round(ms, 3), "compile_s": round(comp, 1)}
        print(vname, results[vname])

    print(json.dumps({"batch": b, "results": results}))


if __name__ == "__main__":
    main()
