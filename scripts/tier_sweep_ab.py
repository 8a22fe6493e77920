#!/usr/bin/env python
"""A/B microbench: BlockedBELL tier-sweep variants at the ppa hot shape.

The r5 ppa profile shows the hub tiers' chunked sweeps (lax.scan in
ops/spmm._tier_sweep) at ~100 Mrows/s vs the measured 291 Mrows/s
slice-gather ceiling (one while.119: rows=10208, cap=390, kc=195,
39.5 ms over 2 iterations against a bf16[131072, 64] slice). Variants:

  scan_f32    the production form: gather -> astype(f32) -> einsum with
              f32 products (Precision.HIGHEST), lax.scan over chunks
  scan_bf16   keep the gathered rows (and weights) in bf16; dot with
              preferred_element_type=f32 — halves the [n, kc, d]
              transient and the convert
  unroll_f32  python-unrolled chunks instead of lax.scan
  onehot?     (not here — cap 390 too wide for an MXU one-hot)

Usage: python scripts/tier_sweep_ab.py [--smoke]
"""
from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from _benchutil import time_chained_ms  # noqa: E402


def main():
    smoke = "--smoke" in sys.argv
    if smoke:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    import jax.numpy as jnp

    rows, cap, nsrc, d = (256, 16, 4096, 64) if smoke else \
        (10208, 390, 131072, 64)
    kc = cap // 2
    rng = np.random.default_rng(0)
    nb = jnp.asarray(rng.integers(0, nsrc, (rows, cap)).astype(np.int32))
    ws = jnp.asarray(rng.standard_normal((rows, cap)).astype(np.float32))
    xs = jnp.asarray(
        rng.standard_normal((nsrc, d)).astype(np.float32)
    ).astype(jnp.bfloat16)

    def dep(c):
        return jnp.minimum(c.astype(jnp.int32), 0)

    def scan_f32(c, nb, ws, xs):
        def body(acc, z):
            nb_c, w_c = z
            g = xs[(nb_c + dep(c)).reshape(-1)].reshape(
                rows, kc, d).astype(jnp.float32)
            return acc + jnp.einsum(
                "nk,nkd->nd", w_c, g,
                precision=jax.lax.Precision.HIGHEST), None

        nsteps = cap // kc
        nb_s = jnp.moveaxis(nb.reshape(rows, nsteps, kc), 1, 0)
        ws_s = jnp.moveaxis(ws.reshape(rows, nsteps, kc), 1, 0)
        out, _ = jax.lax.scan(body, jnp.zeros((rows, d), jnp.float32),
                              (nb_s, ws_s))
        return jnp.tanh(jnp.sum(out) * 1e-9)

    def scan_bf16(c, nb, ws, xs):
        wsb = ws.astype(jnp.bfloat16)

        def body(acc, z):
            nb_c, w_c = z
            g = xs[(nb_c + dep(c)).reshape(-1)].reshape(rows, kc, d)
            return acc + jnp.einsum(
                "nk,nkd->nd", w_c, g,
                preferred_element_type=jnp.float32), None

        nsteps = cap // kc
        nb_s = jnp.moveaxis(nb.reshape(rows, nsteps, kc), 1, 0)
        ws_s = jnp.moveaxis(wsb.reshape(rows, nsteps, kc), 1, 0)
        out, _ = jax.lax.scan(body, jnp.zeros((rows, d), jnp.float32),
                              (nb_s, ws_s))
        return jnp.tanh(jnp.sum(out) * 1e-9)

    def unroll_f32(c, nb, ws, xs):
        acc = jnp.zeros((rows, d), jnp.float32)
        for s in range(cap // kc):
            nb_c = nb[:, s * kc:(s + 1) * kc]
            w_c = ws[:, s * kc:(s + 1) * kc]
            g = xs[(nb_c + dep(c)).reshape(-1)].reshape(
                rows, kc, d).astype(jnp.float32)
            acc = acc + jnp.einsum(
                "nk,nkd->nd", w_c, g, precision=jax.lax.Precision.HIGHEST)
        return jnp.tanh(jnp.sum(acc) * 1e-9)

    def unroll_bf16(c, nb, ws, xs):
        wsb = ws.astype(jnp.bfloat16)
        acc = jnp.zeros((rows, d), jnp.float32)
        for s in range(cap // kc):
            nb_c = nb[:, s * kc:(s + 1) * kc]
            w_c = wsb[:, s * kc:(s + 1) * kc]
            g = xs[(nb_c + dep(c)).reshape(-1)].reshape(rows, kc, d)
            acc = acc + jnp.einsum(
                "nk,nkd->nd", w_c, g, preferred_element_type=jnp.float32)
        return jnp.tanh(jnp.sum(acc) * 1e-9)

    results = {}
    mrows = rows * cap / 1e6
    for name, fn in (("scan_f32", scan_f32), ("scan_bf16", scan_bf16),
                     ("unroll_f32", unroll_f32),
                     ("unroll_bf16", unroll_bf16)):
        ms, comp = time_chained_ms(jax, jnp, fn, (nb, ws, xs), n_iter=10)
        results[name] = {"ms": round(ms, 3),
                         "mrows_per_s": round(mrows / ms * 1e3, 1),
                         "compile_s": round(comp, 1)}
        print(name, results[name], flush=True)
    print(json.dumps({"shape": [rows, cap, nsrc, d], "results": results}))


if __name__ == "__main__":
    main()
