"""Profiling & observability.

The reference has no tracing at all (SURVEY §5: a stray perf_counter
import and epoch prints). Here:
  * ``trace(logdir)`` — jax.profiler trace context manager (view in
    TensorBoard / xprof);
  * ``StepTimer`` — wall-clock stage timer with EMA smoothing;
  * ``roofline_report`` — edges/s and bytes/edge estimates for the two
    hot kernels (SpMM, per-link attention) against chip peaks, the
    SURVEY's speed-of-light accounting.
"""
from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass
from typing import Dict


@contextlib.contextmanager
def trace(logdir: str = "/tmp/lpformer_tpu_trace"):
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """EMA wall-clock timer: timer.tick('stage') ... timer.tock('stage')."""

    def __init__(self, alpha: float = 0.1):
        self.alpha = alpha
        self._start: Dict[str, float] = {}
        self.ema: Dict[str, float] = {}

    def tick(self, name: str):
        self._start[name] = time.perf_counter()

    def tock(self, name: str) -> float:
        dt = time.perf_counter() - self._start[name]
        prev = self.ema.get(name)
        self.ema[name] = dt if prev is None else (
            self.alpha * dt + (1 - self.alpha) * prev
        )
        return dt

    def report(self) -> str:
        return " | ".join(
            f"{k}: {v * 1e3:.1f}ms" for k, v in sorted(self.ema.items())
        )


@dataclass
class RooflineEstimate:
    flops: float
    bytes: float
    seconds: float
    peak_flops: float = 197e12 / 2   # v5e bf16 ~197 TFLOPs; f32 ~half
    peak_bw: float = 819e9           # v5e HBM ~819 GB/s

    @property
    def achieved_flops(self) -> float:
        return self.flops / self.seconds

    @property
    def achieved_bw(self) -> float:
        return self.bytes / self.seconds

    @property
    def flops_util(self) -> float:
        return self.achieved_flops / self.peak_flops

    @property
    def bw_util(self) -> float:
        return self.achieved_bw / self.peak_bw

    @property
    def bound(self) -> str:
        return "compute" if (
            self.flops / self.peak_flops > self.bytes / self.peak_bw
        ) else "memory"


def spmm_roofline(
    num_edges: int, feat_dim: int, seconds: float, dtype_bytes: int = 4
) -> RooflineEstimate:
    """gather + multiply-add per edge per feature."""
    flops = 2.0 * num_edges * feat_dim
    bytes_ = num_edges * (feat_dim * 2 * dtype_bytes + 8)  # x row + out + idx
    return RooflineEstimate(flops=flops, bytes=bytes_, seconds=seconds)


def attention_roofline(
    batch: int,
    context: int,
    dim: int,
    heads: int,
    seconds: float,
    dtype_bytes: int = 4,
) -> RooflineEstimate:
    """lin_r (2d->H*d) + score + weighted sum per (link, context node)."""
    per_entry = 2 * (2 * dim) * (heads * dim) + 6 * heads * dim
    flops = float(batch) * context * per_entry
    bytes_ = float(batch) * context * (2 * dim) * dtype_bytes
    return RooflineEstimate(flops=flops, bytes=bytes_, seconds=seconds)


def context_roofline(
    batch: int, adj_cap: int, ppr_cap: int, seconds: float
) -> RooflineEstimate:
    """Compare-all membership lookups: per link, src rows vs tgt rows
    (dot_general over [capA, capB] compare tables) + row gathers."""
    flops = 2.0 * batch * (ppr_cap * ppr_cap + adj_cap * adj_cap)
    bytes_ = 2.0 * batch * (adj_cap * 4 + ppr_cap * 8)
    return RooflineEstimate(flops=flops, bytes=bytes_, seconds=seconds)


def train_step_roofline(
    batch: int,
    num_edges: int,
    num_nodes: int,
    dim: int,
    c_total: int,
    gnn_layers: int,
    seconds: float,
    fwd_passes: int = 2,
    bwd_mult: float = 3.0,
) -> RooflineEstimate:
    """Analytic FLOP/byte lower bound for one full training step:
    GCN (SpMM + dense), per-link attention, PPR-PE MLPs, head MLPs.
    fwd_passes=2 is the reference's pos+neg double forward;
    bwd_mult=3 counts fwd + dactivation + dweight passes."""
    spmm = 2.0 * num_edges * dim * gnn_layers
    gcn_dense = 2.0 * num_nodes * dim * dim * gnn_layers
    att = batch * c_total * (2 * (2 * dim) * dim + 8.0 * dim)
    pe = batch * c_total * 2 * 2.0 * (2 * dim + dim * dim)
    heads = batch * 3 * 2.0 * 2 * dim * dim
    flops = (spmm + gcn_dense + att + pe + heads) * fwd_passes * bwd_mult
    bytes_ = (
        num_edges * (dim * 2 * 4 + 8) * gnn_layers
        + num_nodes * dim * 4 * 2
        + batch * c_total * (2 * dim) * 4
    ) * fwd_passes * 2.0
    return RooflineEstimate(flops=flops, bytes=bytes_, seconds=seconds)


def roofline_report(est: RooflineEstimate, name: str) -> str:
    return (
        f"[{name}] {est.seconds*1e3:.2f}ms  "
        f"{est.achieved_flops/1e12:.2f} TFLOP/s ({est.flops_util:.1%})  "
        f"{est.achieved_bw/1e9:.1f} GB/s ({est.bw_util:.1%})  "
        f"{est.bound}-bound"
    )
