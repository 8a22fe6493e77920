"""Shared micro-bench timing helper (advisor r4: keep the chained-carry
methodology in lockstep across compact_ab / extraction_bench /
stage_profile*).

The pattern: the timed fn takes a scalar carry first, returns a scalar
derived from its outputs, and the carry is threaded through every
iteration — forcing sequential device execution — with a single host
``float()`` fetch as the only sync (``jax.block_until_ready`` does NOT
reliably block through the axon tunnel backend).
"""
from __future__ import annotations

import time


def time_chained(jax, jnp, fn, ops, n_warmup=2, n_iter=20, donate=False):
    """Time ``fn(carry, *ops) -> carry`` jitted; returns
    ``(seconds_per_iter, compile_seconds)``."""
    jfn = jax.jit(fn, donate_argnums=(0,) if donate else ())
    c = jnp.zeros((), jnp.float32)
    t0 = time.time()
    for _ in range(n_warmup):
        c = jfn(c, *ops)
    float(c)
    compile_s = time.time() - t0
    c = jnp.zeros((), jnp.float32)
    t0 = time.perf_counter()
    for _ in range(n_iter):
        c = jfn(c, *ops)
    float(c)
    return (time.perf_counter() - t0) / n_iter, compile_s


def time_chained_ms(jax, jnp, fn, ops, n_warmup=2, n_iter=20):
    """Same, reporting ``(ms_per_iter, compile_seconds)``."""
    s, comp = time_chained(jax, jnp, fn, ops, n_warmup, n_iter)
    return s * 1e3, comp
