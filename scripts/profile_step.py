"""Op-level TPU profile of the bench training step.

jax.profiler.trace works through the axon tunnel (device pid events with
per-fusion durations). This traces a few steps of the exact bench-default
step (bf16, ELL) and prints the top HLO ops by total device time, so
optimization targets are chosen from measurement.

Usage: python scripts/profile_step.py [--f32] [--no-ell] [--steps N]
"""
from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--f32", action="store_true")
    ap.add_argument("--no-ell", action="store_true")
    ap.add_argument("--no-combined", action="store_true",
                    help="profile the classic per-class-block step")
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--out", type=str, default="/tmp/step_trace")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--preset", choices=("collab-like", "citation2-like",
                                         "ppa-like", "ddi-like"),
                    default="collab-like")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from lpformer_tpu.data.synthetic import synthetic_dataset
    from lpformer_tpu.models import LPFormerConfig, init_lpformer
    from lpformer_tpu.train import make_optimizer, make_train_step
    from lpformer_tpu.train.step import TrainState

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from bench import PRESETS

    p = PRESETS[args.preset]
    ds = synthetic_dataset(
        seed=0, num_nodes=p["nodes"], num_train=p["edges"], num_eval=1000,
        feat_dim=p["feat"], eps=5e-4, adj_cap=96, ppr_cap=256,
        ppr_cache_dir=".synth_cache",
    )
    if args.no_ell and ds.graph.ell is not None:
        import dataclasses

        ds.graph = dataclasses.replace(ds.graph, ell=None)
    cfg = LPFormerConfig(
        dim=p["dim"], gnn_layers=p["gnn_layers"],
        budget_cn=p["budgets"][0], budget_onehop=p["budgets"][1],
        budget_non1hop=p["budgets"][2],
        budget_combined=(None if args.no_combined
                         else p.get("combined")),
        matmul_dtype="float32" if args.f32 else "bfloat16",
    )
    params = init_lpformer(jax.random.PRNGKey(0), cfg, in_dim=p["feat"])
    opt = make_optimizer(1e-3, steps_per_epoch=100)
    state = TrainState(params, opt.init(params), jnp.asarray(0, jnp.int32))
    step = make_train_step(cfg, opt, grad_accum=p.get("accum", 1))

    batch = p["batch"]
    tp = np.asarray(ds.train_pos)
    reps = -(-batch // len(tp))
    tp2 = np.tile(tp, (reps, 1))[:batch]
    src = jnp.asarray(tp2[:, 0])
    tgt = jnp.asarray(tp2[:, 1])
    w = jnp.ones((batch,), jnp.float32)
    bin_w = (ds.graph.edge_w > 0).astype(jnp.float32)
    rng = jax.random.PRNGKey(1)

    sargs = (ds.graph, ds.mask_mult_device, bin_w, src, tgt, w, rng)
    t0 = time.time()
    for _ in range(2):
        state, loss = step(state, *sargs)
    float(loss)  # true sync (block_until_ready lies through the tunnel)
    print(f"[profile] warm ({time.time()-t0:.1f}s); tracing "
          f"{args.steps} steps", file=sys.stderr)

    with jax.profiler.trace(args.out):
        for _ in range(args.steps):
            state, loss = step(state, *sargs)
        float(loss)

    # -- parse the trace: device pid events, SELF time per op name --
    # (an event's self time = dur minus the dur of events nested inside
    # it on the same track; raw dur double-counts envelopes like the
    # per-step "0"/"1"/"2" program events and while-loop bodies)
    traces = sorted(glob.glob(args.out + "/**/*.trace.json.gz",
                              recursive=True))
    d = json.loads(gzip.open(traces[-1]).read())
    ev = d.get("traceEvents", [])
    dev_pids = {
        e["pid"] for e in ev
        if e.get("ph") == "M" and e.get("name") == "process_name"
        and "TPU" in str(e.get("args", {}).get("name", ""))
    }
    tracks = {}
    for e in ev:
        if e.get("ph") == "X" and e.get("pid") in dev_pids:
            tracks.setdefault((e["pid"], e.get("tid")), []).append(e)

    agg, meta, total = {}, {}, 0.0
    for evs in tracks.values():
        evs.sort(key=lambda e: (e["ts"], -e.get("dur", 0)))
        stack = []  # (end_ts, event, child_time_accum)
        for e in evs:
            ts, dur = e["ts"], e.get("dur", 0)
            while stack and stack[-1][0] <= ts + 1e-9:
                end, pe, child = stack.pop()
                self_us = max(pe.get("dur", 0) - child, 0.0)
                name = pe.get("name", "?")
                agg[name] = agg.get(name, 0.0) + self_us
                meta.setdefault(name, pe.get("args", {}))
                total += self_us
            if stack:
                stack[-1] = (stack[-1][0], stack[-1][1],
                             stack[-1][2] + dur)
            stack.append((ts + dur, e, 0.0))
        while stack:
            end, pe, child = stack.pop()
            self_us = max(pe.get("dur", 0) - child, 0.0)
            name = pe.get("name", "?")
            agg[name] = agg.get(name, 0.0) + self_us
            meta.setdefault(name, pe.get("args", {}))
            total += self_us

    rows = sorted(agg.items(), key=lambda kv: -kv[1])
    print(f"[profile] device self-time total {total/1e3/args.steps:.1f} "
          f"ms/step over {args.steps} steps, {len(rows)} distinct ops",
          file=sys.stderr)
    for name, dur in rows[: args.top]:
        a = meta.get(name, {})
        detail = str(a.get("long_name") or a.get("tf_op") or "")[:90]
        print(f"{dur/1e3/args.steps:9.2f} ms  {100*dur/max(total,1):5.1f}%"
              f"  {name[:60]}  {detail}")
    print(json.dumps({
        "metric": "profiled_device_ms_per_step",
        "value": round(total / 1e3 / args.steps, 2),
        "unit": "ms",
        "trace": traces[-1],
    }))


if __name__ == "__main__":
    main()
