#!/usr/bin/env python
"""A/B the src-block-partitioned SpMM hypothesis at the citation2 shape.

bench.py --gather measured gathers from a [1M, 64] table at 54 Mrows/s
vs 337 Mrows/s from a [131k, 64] table (6.3x). The citation2-like step
spends ~500-800 ms in exactly such gathers (3 GCN layers x fwd+bwd over
~10M ELL slots — the dominant cost per the op profile). This script
measures, on the REAL cached citation2-like graph:

  A  coo      : gather+segment_sum from the full table (spmm)
  B  bell     : the production degree-bucketed ELL sweep (spmm_bell)
  C  blocked  : host-partitioned (dst_block x src_block) COO tiles;
                per tile, gather from an optimization_barrier'd 16MB
                table slice + per-dst-block segment_sum
  D  narrowix : gather from the FULL table but with block-local indices
                (tests whether the win is index locality, in which case
                no slicing/copies are needed at all)

plus numeric parity of C vs A. Run on the TPU:
    python scripts/spmm_block_ab.py [--block 131072] [--dim 64]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_tiles(src, dst, w, n, bs, pad_to=1024):
    """Host: (dst_block x src_block) tile arrays, dst-sorted within each
    tile, padded to a multiple of ``pad_to`` (w=0, dst_local=bs dummy)."""
    kb = -(-n // bs)
    jb = dst // bs
    ib = src // bs
    order = np.lexsort((dst, ib, jb))
    s, d, ww = src[order], dst[order], w[order]
    key = jb[order] * kb + ib[order]
    bounds = np.searchsorted(key, np.arange(kb * kb + 1))
    tiles = []
    for jj in range(kb):
        row = []
        for ii in range(kb):
            lo, hi = bounds[jj * kb + ii], bounds[jj * kb + ii + 1]
            sl = (s[lo:hi] - ii * bs).astype(np.int32)
            dl = (d[lo:hi] - jj * bs).astype(np.int32)
            tw = ww[lo:hi].astype(np.float32)
            m = len(sl)
            p = (-m) % pad_to
            if p or m == 0:
                p = p if m else pad_to
                sl = np.concatenate([sl, np.zeros(p, np.int32)])
                dl = np.concatenate([dl, np.full(p, bs, np.int32)])
                tw = np.concatenate([tw, np.zeros(p, np.float32)])
            row.append((sl, dl, tw))
        tiles.append(row)
    return tiles, kb


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--block", type=int, default=131072)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--dtype", choices=("bf16", "f32"), default="bf16")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--nodes", type=int, default=1_000_000)
    ap.add_argument("--edges", type=int, default=5_000_000)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from lpformer_tpu.data.synthetic import synthetic_dataset
    from lpformer_tpu.ops.spmm import spmm, spmm_bell

    print(f"[ab] device={jax.devices()[0]}", file=sys.stderr)
    t0 = time.time()
    ds = synthetic_dataset(
        seed=0, num_nodes=args.nodes, num_train=args.edges, num_eval=1000,
        feat_dim=96, eps=5e-4, adj_cap=96, ppr_cap=256,
        ppr_cache_dir=".synth_cache",
    )
    g = ds.graph
    n, dim, bs = ds.num_nodes, args.dim, args.block
    print(f"[ab] dataset {time.time()-t0:.0f}s, "
          f"E={int(g.edge_src.shape[0])}", file=sys.stderr)

    src = np.asarray(g.edge_src)
    dst = np.asarray(g.edge_dst)
    w = np.asarray(g.w_norm)
    tiles_np, kb = build_tiles(src, dst, w, n, bs)
    pad_total = sum(len(t[0]) for row in tiles_np for t in row)
    print(f"[ab] kb={kb}, padded slots {pad_total} vs E {len(src)} "
          f"({pad_total/len(src):.3f}x)", file=sys.stderr)

    gdt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    x0 = jax.random.normal(jax.random.PRNGKey(0), (n, dim), jnp.float32)
    tiles = jax.tree_util.tree_map(jnp.asarray, tiles_np)
    flat_sl = jnp.asarray(np.concatenate(
        [t[0] + ii * bs for row in tiles_np
         for ii, t in enumerate(row)]).astype(np.int32))

    results = {}

    def timeit(name, fn, ops, rows=None):
        jfn = jax.jit(fn)
        c = jnp.zeros((), jnp.float32)
        for _ in range(2):
            c = jfn(c, ops)
        float(c)
        c = jnp.zeros((), jnp.float32)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            c = jfn(c, ops)
        float(c)
        dt = (time.perf_counter() - t0) / args.iters
        results[name] = {
            "ms": round(dt * 1e3, 2),
            **({"mrows_per_s": round(rows / dt / 1e6, 1)} if rows else {}),
        }
        print(json.dumps({name: results[name]}))
        return dt

    def dep(c):
        return jnp.minimum(c.astype(jnp.int32), 0)

    # A: COO gather + sorted segment_sum from the full table
    def coo(c, ops):
        es, ed, ew, x = ops
        x = x + jnp.tanh(c)
        y = spmm(es, ed, ew, x, n, diag=g.w_diag, gather_dtype=gdt)
        return jnp.tanh((jnp.sum(y[0]) + c * 0).astype(jnp.float32) * 1e-9)

    timeit("A_coo", coo, (g.edge_src, g.edge_dst, jnp.asarray(w), x0),
           rows=len(src))

    # B: production bucketed ELL
    def bell(c, ops):
        bell_, x = ops
        x = x + jnp.tanh(c)
        y = spmm_bell(bell_, None, x, diag=g.w_diag, gather_dtype=gdt)
        return jnp.tanh((jnp.sum(y[0]) + c * 0).astype(jnp.float32) * 1e-9)

    if g.ell is not None:
        timeit("B_bell", bell, (g.ell, x0), rows=len(src))

    # C: blocked tiles, barrier'd table slices
    def blocked(c, ops):
        tl, x = ops
        x = x + jnp.tanh(c)
        xg = x.astype(gdt)
        outs = []
        for jj in range(kb):
            acc = jnp.zeros((bs + 1, dim), jnp.float32)
            for ii in range(kb):
                sl, dl, tw = tl[jj][ii]
                lo = ii * bs
                xs = jax.lax.optimization_barrier(
                    jax.lax.dynamic_slice_in_dim(
                        xg, lo, min(bs, n - lo) if lo + bs > n else bs, 0)
                )
                if xs.shape[0] < bs:
                    xs = jnp.concatenate(
                        [xs, jnp.zeros((bs - xs.shape[0], dim), gdt)])
                gth = xs[sl].astype(jnp.float32) * tw[:, None]
                acc = acc + jax.ops.segment_sum(
                    gth, dl, num_segments=bs + 1, indices_are_sorted=True
                )
            outs.append(acc[:bs])
        y = jnp.concatenate(outs, axis=0)[:n]
        y = y + g.w_diag[:, None] * x
        return jnp.tanh((jnp.sum(y[0]) + c * 0).astype(jnp.float32) * 1e-9)

    timeit("C_blocked", blocked, (tiles, x0), rows=pad_total)

    # D: full-table gather with the SAME partitioned (narrow-range) ids
    def narrow(c, ops):
        ids, x = ops
        xg = x.astype(gdt)
        s_ = jnp.sum(xg[ids + dep(c)].astype(jnp.float32))
        return jnp.tanh(s_ * 1e-9)

    timeit("D_narrowix_fulltable", narrow, (flat_sl, x0), rows=pad_total)

    # parity C vs A
    ya = jax.jit(lambda x: spmm(
        g.edge_src, g.edge_dst, jnp.asarray(w), x, n, diag=g.w_diag
    ))(x0)

    def blocked_out(tl, x):
        outs = []
        for jj in range(kb):
            acc = jnp.zeros((bs + 1, dim), jnp.float32)
            for ii in range(kb):
                sl, dl, tw = tl[jj][ii]
                lo = ii * bs
                width = bs if lo + bs <= n else n - lo
                xs = jax.lax.dynamic_slice_in_dim(x, lo, width, 0)
                if width < bs:
                    xs = jnp.concatenate(
                        [xs, jnp.zeros((bs - width, dim), x.dtype)])
                gth = xs[sl] * tw[:, None]
                acc = acc + jax.ops.segment_sum(
                    gth, dl, num_segments=bs + 1, indices_are_sorted=True
                )
            outs.append(acc[:bs])
        y = jnp.concatenate(outs, axis=0)[:n]
        return y + g.w_diag[:, None] * x

    yc = jax.jit(blocked_out)(tiles, x0)
    err = float(jnp.max(jnp.abs(ya - yc)))
    print(json.dumps({"parity_max_abs_err_C_vs_A": err}))
    results["parity"] = err
    with open("/tmp/spmm_block_ab.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
