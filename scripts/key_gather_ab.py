#!/usr/bin/env python
"""A/B: can the citation2 eval key gather beat the big-table rate?

score_budget.json: 46% of the 74.5 ms eval sweep batch is one
bf16[3.1M,64] row gather from the full [1M,64] X table at ~93 Mrows/s.
gather_details_citation2-like.json shows small tables gather 3-5x
faster (291 Mrows/s at 131k rows, 384 at 16k) and sorting ids does
NOT help — so the open question is whether the slow mode keys on the
table's ROW COUNT or its BYTE SIZE. Same 128 MB table, reshaped to
fewer, wider rows (k nodes per row), gathered at ids//k then
lane-selected by a one-hot dot: if the engine rate follows row count,
the reshape + select beats the flat take despite streaming k x the
gathered bytes.

Writes key_gather_ab.json. Usage: python scripts/key_gather_ab.py
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _benchutil import time_chained_ms  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    N, D = 1_000_000, 64
    B, C = 32_768, 96
    M = B * C                      # 3.145M gathered rows per batch
    rng = np.random.default_rng(0)
    table = jnp.asarray(
        rng.standard_normal((N, D)).astype(np.float32), jnp.bfloat16)

    # sweep-structure ids: ~half the slots are src-side candidates drawn
    # from 32 positives' small pools (repeated 1000x), half tgt-side
    # uniform, ~6% pad (spread over a cycling window like _gather_ids)
    pools = rng.integers(0, N, (32, 64))
    src_side = pools[
        np.repeat(np.arange(32), M // 64),
        rng.integers(0, 64, M // 2 * 2)[: M // 2]].astype(np.int32)
    tgt_side = rng.integers(0, N, M - M // 2, dtype=np.int32)
    ids_np = np.concatenate([src_side, tgt_side])
    pad = rng.random(M) < 0.06
    ids_np[pad] = (np.arange(M) % 4096)[pad]
    ids = jnp.asarray(ids_np)

    results = {}

    def dump():
        with open("key_gather_ab.json", "w") as f:
            json.dump({"table": f"bf16[{N},{D}]", "rows_gathered": M,
                       "id_structure": "sweep-like (32 pools x 1000 + "
                                       "uniform + 6% spread pad)",
                       "results": results}, f, indent=1)

    def run(name, fn, ops):
        try:
            ms, comp = time_chained_ms(jax, jnp, fn, ops,
                                       n_warmup=2, n_iter=8)
        except Exception as e:  # e.g. k=16's [M,16,64] intermediate OOMs
            results[name] = {"error": type(e).__name__}
            print(f"   FAILED ({type(e).__name__})  {name}", flush=True)
            dump()
            return
        results[name] = {"ms": round(ms, 2),
                         "mrows_per_s": round(M / ms / 1e3, 1),
                         "compile_s": round(comp, 1)}
        print(f"{ms:9.2f} ms {M/ms/1e3:7.1f} Mrows/s  {name}", flush=True)
        dump()

    def flat(c, t, i):
        g = t[i]
        return c + g.astype(jnp.float32).sum()

    run("flat_take_1Mx64", flat, (table, ids))

    for k in (2, 4, 8):
        wide = table.reshape(N // k, k * D)
        eye = jnp.eye(k, dtype=jnp.bfloat16)

        def sel(c, t, i, eye=eye, k=k):
            g = t[i // k].reshape(M, k, D)
            lane = eye[i % k]                      # [M, k] one-hot
            out = jnp.einsum("mkd,mk->md", g, lane,
                             preferred_element_type=jnp.float32)
            return c + out.sum()

        run(f"reshape_{N//k}x{k*D}_onehot_select", sel, (wide, ids))

    dump()
    print("[ab] wrote key_gather_ab.json")


if __name__ == "__main__":
    main()
