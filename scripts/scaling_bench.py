"""Scaling-efficiency harness: links/s vs device count + collective volume.

Weak-scaling sweep of the sharded training step
(lpformer_tpu/parallel/sharded_step.py) over 1/2/4/8 virtual CPU devices:
per-device link batch is fixed, so perfect scaling doubles links/s with
the device count. Also parses the compiled HLO for the per-step
collective communication volume (all-gather / reduce-scatter / psum
bytes) — the quantity that rides ICI on real multi-chip hardware.

The north-star target (BASELINE.md) is >=80% edges/s scaling efficiency
at 2+ hosts. NOTE: on a CPU host with fewer cores than virtual devices,
compute oversubscription makes absolute efficiency numbers pessimistic —
and XLA:CPU's collective rendezvous aborts if a device's compute phase
exceeds its 40s watchdog, so the default shape is deliberately small —
the harness's value on CPU is (a) trend + regression tracking and
(b) exact collective-volume accounting; the same harness runs unchanged
on a real TPU mesh.

Usage:
  python scripts/scaling_bench.py                 # sweep 1,2,4,8
  python scripts/scaling_bench.py --devices 4     # child mode (internal)

Writes scaling_bench.json next to the repo root.
"""
from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys

_HLO_COLLECTIVES = (
    "all-gather(", "all-gather-start(", "all-reduce(", "all-reduce-start(",
    "reduce-scatter(", "all-to-all(", "collective-permute(",
)
_DTYPE_BYTES = {
    "f64": 8, "s64": 8, "u64": 8, "f32": 4, "s32": 4, "u32": 4,
    "bf16": 2, "f16": 2, "s16": 2, "u16": 2, "s8": 1, "u8": 1, "pred": 1,
}


def collective_bytes(hlo_text: str) -> dict:
    """Sum output bytes of collective ops in optimized HLO, by op kind."""
    out: dict = {}
    for line in hlo_text.splitlines():
        for marker in _HLO_COLLECTIVES:
            if " " + marker in line or "=" in line and marker in line:
                kind = marker.rstrip("(").replace("-start", "")
                # shapes appear before the op name: f32[128,64]{1,0}
                lhs = line.split(marker)[0]
                total = 0
                for m in re.finditer(r"(\w+)\[([\d,]*)\]", lhs):
                    dt, dims = m.group(1), m.group(2)
                    if dt not in _DTYPE_BYTES:
                        continue
                    n = 1
                    for d in dims.split(","):
                        if d:
                            n *= int(d)
                    total += n * _DTYPE_BYTES[dt]
                if total:
                    out[kind] = out.get(kind, 0) + total
                break
    return out


def run_child(n_devices: int, args) -> None:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={n_devices}"
    ).strip()
    import time

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from lpformer_tpu.data.synthetic import synthetic_dataset
    from lpformer_tpu.models import LPFormerConfig, init_lpformer
    from lpformer_tpu.parallel import (
        make_mesh, make_sharded_train_step, partition_graph,
        place_sharded_graph,
    )
    from lpformer_tpu.train import make_optimizer
    from lpformer_tpu.train.step import TrainState

    assert len(jax.devices()) >= n_devices
    g = 1
    for cand in (4, 2):
        if n_devices % cand == 0 and n_devices > cand:
            g = cand
            break
    d = n_devices // g
    mesh = make_mesh(data=d, graph=g, devices=jax.devices()[:n_devices])

    ds = synthetic_dataset(
        seed=0, num_nodes=args.nodes, num_train=args.edges,
        num_eval=64, feat_dim=args.feat, eps=1e-3,
    )
    cfg = LPFormerConfig(
        dim=args.dim, gnn_layers=2, budget_cn=24, budget_onehop=48,
        budget_non1hop=48,
    )
    params = init_lpformer(jax.random.PRNGKey(0), cfg, in_dim=args.feat)
    sg = place_sharded_graph(partition_graph(ds.graph, g=g, d=d), mesh)
    opt = make_optimizer(1e-3, steps_per_epoch=100)
    state = TrainState(params, opt.init(params), jnp.asarray(0, jnp.int32))
    step = make_sharded_train_step(
        cfg, opt, mesh, ds.num_nodes, sg.rows_per_shard, sg.ctx_rows_per_shard
    )

    batch = args.per_dev_batch * n_devices
    tp = np.asarray(ds.train_pos)
    reps = -(-batch // len(tp))
    tp2 = np.tile(tp, (reps, 1))[:batch]
    src = jnp.asarray(tp2[:, 0])
    tgt = jnp.asarray(tp2[:, 1])
    w = jnp.ones((batch,), jnp.float32)
    rng = jax.random.PRNGKey(0)

    # collective volume from the compiled HLO (static per step)
    lowered = step.lower(state, sg, ds.mask_mult_device, src, tgt, w, rng)
    comm = collective_bytes(lowered.compile().as_text())

    for _ in range(2):
        state, loss = step(state, sg, ds.mask_mult_device, src, tgt, w, rng)
    float(loss)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        state, loss = step(state, sg, ds.mask_mult_device, src, tgt, w, rng)
    float(loss)
    dt = (time.perf_counter() - t0) / args.iters

    print(json.dumps({
        "devices": n_devices, "mesh": {"data": d, "graph": g},
        "batch": batch, "step_ms": round(dt * 1e3, 2),
        "links_per_s": round(batch / dt, 1),
        "collective_bytes_per_step": comm,
        "collective_mb_per_step": round(sum(comm.values()) / 1e6, 3),
    }))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=0,
                    help="child mode: run one measurement at N devices")
    ap.add_argument("--sweep", type=str, default="1,2,4,8")
    ap.add_argument("--nodes", type=int, default=4_000)
    ap.add_argument("--edges", type=int, default=24_000)
    ap.add_argument("--feat", type=int, default=64)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--per-dev-batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--out", type=str, default="scaling_bench.json")
    args = ap.parse_args()

    if args.devices:
        run_child(args.devices, args)
        return

    rows = []
    for n in [int(x) for x in args.sweep.split(",")]:
        cmd = [sys.executable, os.path.abspath(__file__),
               "--devices", str(n),
               "--nodes", str(args.nodes), "--edges", str(args.edges),
               "--feat", str(args.feat), "--dim", str(args.dim),
               "--per-dev-batch", str(args.per_dev_batch),
               "--iters", str(args.iters)]
        repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        env = dict(os.environ)
        env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
        print(f"[scaling] running {n} device(s)...", file=sys.stderr)
        res = subprocess.run(cmd, capture_output=True, text=True, env=env,
                             cwd=repo_root)
        line = [ln for ln in res.stdout.splitlines()
                if ln.startswith("{")]
        if not line:
            print(res.stdout, file=sys.stderr)
            print(res.stderr[-3000:], file=sys.stderr)
            raise SystemExit(f"child at {n} devices produced no result")
        rows.append(json.loads(line[-1]))

    base = rows[0]["links_per_s"] / rows[0]["devices"]
    for r in rows:
        r["efficiency_vs_1dev"] = round(
            r["links_per_s"] / (base * r["devices"]), 3
        )
    print(f"{'dev':>4} {'mesh':>10} {'batch':>7} {'ms/step':>9} "
          f"{'links/s':>10} {'eff':>6} {'comm MB/step':>13}")
    for r in rows:
        mesh = f"{r['mesh']['data']}x{r['mesh']['graph']}"
        print(f"{r['devices']:>4} {mesh:>10} {r['batch']:>7} "
              f"{r['step_ms']:>9.1f} {r['links_per_s']:>10.0f} "
              f"{r['efficiency_vs_1dev']:>6.2f} "
              f"{r['collective_mb_per_step']:>13.2f}")
    with open(args.out, "w") as f:
        json.dump(rows, f, indent=1)
    print(f"[scaling] wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
