#!/usr/bin/env python
"""A/B the scatter-add VJP layouts on the real TPU at the step shape.

The r4 op profile showed the context-gather VJP's global sort (1.66 ms)
+ full-footprint cotangent permute (7.35 ms) + kernel (1.39 ms) at
m=1.31M rows — 29% of the whole train step across pos+neg. This
measures scatter_rows_add end-to-end (sort + permute + kernel) for a
sweep of seg_rows, bf16 cotangent, chained with state threading (the
only true sync on the axon tunnel is a host fetch).

Usage: python scripts/scatter_ab.py [--m 1310720] [--n 50000] [--d 128]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=1310720)
    ap.add_argument("--n", type=int, default=50000)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--segs", type=str,
                    default="2097152,131072,65536,32768")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from lpformer_tpu.ops.pallas.scatter import scatter_rows_add

    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, args.n, args.m).astype(np.int32))
    ct = jnp.asarray(
        rng.standard_normal((args.m, args.d)).astype(np.float32),
        jnp.bfloat16,
    )
    ref = None
    results = []
    for seg in (int(s) for s in args.segs.split(",")):
        fn = jax.jit(
            lambda i, c, s=seg: scatter_rows_add(
                i, c, args.n, seg_rows=s
            )
        )
        t0 = time.time()
        out = fn(ids, ct)
        s0 = float(out.sum())  # true sync
        print(f"[seg={seg}] compile+first {time.time()-t0:.1f}s sum={s0:.1f}",
              file=sys.stderr, flush=True)
        if ref is None:
            ref = np.asarray(out)
        else:
            np.testing.assert_allclose(
                np.asarray(out), ref, rtol=2e-2, atol=2e-1
            )
        # chain via the ids argument derived from the previous output so
        # the device can't overlap iterations
        t0 = time.perf_counter()
        acc = out
        for _ in range(args.iters):
            salt = (acc[0, 0] > 1e30).astype(jnp.int32)  # always 0
            acc = fn(ids + salt, ct)
        float(acc.sum())
        dt = (time.perf_counter() - t0) / args.iters * 1e3
        nseg = -(-args.m // max(seg, 1))
        print(f"[seg={seg}] {dt:.2f} ms/call  (nseg={nseg})", flush=True)
        results.append({"seg_rows": seg, "ms": round(dt, 3),
                        "nseg": nseg})
    print(json.dumps({
        "m": args.m, "n": args.n, "d": args.d, "dtype": "bfloat16",
        "results": results,
    }))


if __name__ == "__main__":
    main()
