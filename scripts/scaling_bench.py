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


def collective_ops(hlo_text: str):
    """Detailed collective inventory from optimized HLO: one entry per
    op line — (kind, output bytes, group size). Group size comes from
    ``replica_groups={{0,1},...}`` (explicit) or
    ``replica_groups=[G,S]<=[T]`` (iota: G groups of size S)."""
    out = []
    for line in hlo_text.splitlines():
        for marker in _HLO_COLLECTIVES:
            if " " + marker in line or "=" in line and marker in line:
                kind = marker.rstrip("(").replace("-start", "")
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
                gsize = 1
                m = re.search(r"replica_groups=\[(\d+),(\d+)\]<=\[\d+\]",
                              line)
                if m:
                    gsize = int(m.group(2))
                else:
                    m = re.search(r"replica_groups=\{\{([^}]*)\}", line)
                    if m:
                        gsize = len(m.group(1).split(","))
                if total:
                    out.append(
                        {"kind": kind, "bytes": total, "group": gsize}
                    )
                break
    return out


# Per-chip ring-collective traffic as a multiple of the op's OUTPUT bytes
# for group size G (standard ring algorithm accounting; see the public
# scaling-book treatment of TPU collectives):
#   all-gather      out*(G-1)/G      (out = gathered full array)
#   reduce-scatter  out*(G-1)        (out = 1/G shard; input = out*G)
#   all-reduce      2*out*(G-1)/G    (= reduce-scatter + all-gather)
#   all-to-all      out*(G-1)/G
#   collective-permute  out
def _traffic_bytes(kind: str, nbytes: int, g: int) -> float:
    if g <= 1:
        return 0.0
    return {
        "all-gather": nbytes * (g - 1) / g,
        "reduce-scatter": nbytes * (g - 1),
        "all-reduce": 2.0 * nbytes * (g - 1) / g,
        "all-to-all": nbytes * (g - 1) / g,
        "collective-permute": float(nbytes),
    }.get(kind, float(nbytes))


# Public-spec approximations (per chip, aggregate over ICI links,
# one direction): v5e 2D torus 4x ~45 GB/s; v5p 3D torus 6x ~90 GB/s.
# HBM for scaling the measured v5e compute time to v5p (the step is
# memory/row-rate bound — STATUS r2 — so compute scales ~ with HBM BW;
# we use a CONSERVATIVE 2.0x for v5p, below the 3.4x BW ratio).
HW = {
    "v5e": {"ici_gbs": 180.0, "hbm_gbs": 819.0, "compute_scale": 1.0},
    "v5p": {"ici_gbs": 540.0, "hbm_gbs": 2765.0, "compute_scale": 0.5},
}


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


# Measured single-chip step times (ms) on real v5e — BENCH_r02 /
# STATUS r2 "Fused PE+attention Pallas kernel" preset sweep; the
# per-chip compute term of the weak-scaling prediction. Override with
# --step-ms after re-benching.
MEASURED_STEP_MS_V5E = {
    "collab-like": 90.5,       # B=4096
    "citation2-like": 1678.7,  # B=32768
    "ppa-like": 5807.8,        # B=32768
    "ddi-like": 269.6,         # B=4096 (monolithic)
}


def _fake_bundle(nodes, edges, feat, adj_cap=96, ppr_cap=256):
    """Shape-exact GraphBundle with fake values — the collective volume
    of the compiled program depends only on shapes (node count, padded
    row caps, edge count, feat/dim), so the minutes-long PPR push of a
    real preset build is unnecessary for lowering."""
    import numpy as np

    from lpformer_tpu.data.dataset import build_graph_bundle
    from lpformer_tpu.data.synthetic import random_edges
    from lpformer_tpu.graph.containers import CSRGraph
    from lpformer_tpu.ops import masking as mk

    rng = np.random.default_rng(0)
    e = random_edges(rng, nodes, edges)
    src, dst = e[:, 0].copy(), e[:, 1].copy()
    # force a hub so the padded adjacency width reaches its cap (real
    # power-law datasets always do)
    hub_deg = adj_cap + 32
    src = np.concatenate([src, np.zeros(hub_deg, np.int64)])
    dst = np.concatenate(
        [dst, rng.integers(1, nodes, hub_deg, dtype=np.int64)])

    # fake PPR: short random rows + one full-cap row -> table width = cap
    k = 8
    deg = np.full(nodes, k, np.int64)
    deg[0] = ppr_cap
    indptr = np.concatenate([[0], np.cumsum(deg)])
    total = int(indptr[-1])
    indices = rng.integers(0, nodes, total, dtype=np.int64)
    for i in (0, 1, nodes // 2):  # sorted rows (entry-key invariant)
        lo, hi = indptr[i], indptr[i + 1]
        row = np.unique(rng.choice(nodes, hi - lo, replace=False))
        indices[lo:lo + len(row)] = row
        indices[lo + len(row):hi] = row[-1] if len(row) else 0
    # sort every row (cheap way: sort within segments)
    order = np.argsort(
        np.repeat(np.arange(nodes), deg) * (nodes + 1) + indices,
        kind="stable")
    indices = indices[order]
    weights = rng.random(total).astype(np.float32) * 0.1
    ppr_csr = CSRGraph(indptr=indptr, indices=indices, weights=weights,
                       num_nodes=nodes)
    x = rng.standard_normal((nodes, feat)).astype(np.float32)
    uniq, _ = mk.train_edge_info(src, dst, nodes)
    return build_graph_bundle(
        x, src, dst, None, nodes, ppr_csr,
        adj_cap=adj_cap, ppr_cap=ppr_cap, mask_uniq_keys=uniq,
    ), uniq


def run_predict_child(args) -> None:
    """Lower + compile the sharded train step at TRUE preset shapes on a
    virtual CPU mesh and print the collective inventory (no execution)."""
    d, g = (int(x) for x in args.predict_mesh.split(","))
    n_devices = d * g
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={n_devices}"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    import bench as bench_mod
    from lpformer_tpu.models import LPFormerConfig, init_lpformer
    from lpformer_tpu.ops import masking as mk
    from lpformer_tpu.parallel import (
        make_mesh, make_sharded_train_step, partition_graph,
        place_sharded_graph,
    )
    from lpformer_tpu.train import make_optimizer
    from lpformer_tpu.train.step import TrainState

    p = bench_mod.PRESETS[args.preset]
    nodes, feat, dim = p["nodes"], p["feat"], p["dim"]
    per_chip_batch = p["batch"]
    budgets, gnn_layers = p["budgets"], p["gnn_layers"]

    graph, uniq = _fake_bundle(nodes, p["edges"], feat)
    # multiplicities are values, not shapes; ones of the right length
    mult = jnp.ones((len(uniq),), jnp.int32)

    cfg = LPFormerConfig(
        dim=dim, gnn_layers=gnn_layers, budget_cn=budgets[0],
        budget_onehop=budgets[1], budget_non1hop=budgets[2],
        matmul_dtype="bfloat16",
        use_pallas_attention=False,  # CPU lowering; the kernel swap does
                                     # not change the collective pattern
    )
    mesh = make_mesh(data=d, graph=g, devices=jax.devices()[:n_devices])
    sg = place_sharded_graph(partition_graph(graph, g=g, d=d), mesh)
    params = init_lpformer(jax.random.PRNGKey(0), cfg, in_dim=feat)
    opt = make_optimizer(1e-3, steps_per_epoch=100)
    state = TrainState(params, opt.init(params), jnp.asarray(0, jnp.int32))
    step = make_sharded_train_step(
        cfg, opt, mesh, nodes, sg.rows_per_shard, sg.ctx_rows_per_shard
    )
    bsz = per_chip_batch * n_devices  # weak scaling: per-chip batch fixed
    rng = np.random.default_rng(1)
    src = jnp.asarray(rng.integers(0, nodes, bsz, dtype=np.int32))
    tgt = jnp.asarray(rng.integers(0, nodes, bsz, dtype=np.int32))
    w = jnp.ones((bsz,), jnp.float32)
    key = jax.random.PRNGKey(0)

    import time
    t0 = time.time()
    lowered = step.lower(state, sg, mult, src, tgt, w, key)
    hlo = lowered.compile().as_text()
    ops = collective_ops(hlo)
    by_kind: dict = {}
    for o in ops:
        k = o["kind"]
        by_kind.setdefault(k, {"bytes": 0, "traffic": 0.0})
        by_kind[k]["bytes"] += o["bytes"]
        by_kind[k]["traffic"] += _traffic_bytes(
            o["kind"], o["bytes"], o["group"])
    print(json.dumps({
        "preset": args.preset, "mesh": {"data": d, "graph": g},
        "devices": n_devices, "per_chip_batch": per_chip_batch,
        "global_batch": bsz, "compile_s": round(time.time() - t0, 1),
        "by_kind": by_kind,
        "total_traffic_mb": round(
            sum(v["traffic"] for v in by_kind.values()) / 1e6, 3),
    }))


def predict_main(args) -> None:
    """Analytic multi-chip efficiency prediction (VERDICT r2 #3):
    HLO-exact per-step collective traffic at TRUE preset shapes x public
    ICI bandwidth constants x the measured single-chip step time ->
    predicted weak-scaling efficiency per (preset, mesh, chip type).
    Raw virtual-CPU step timings never enter this math."""
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rows = []
    for preset in args.predict.split(";"):
        for mesh_spec in args.predict_meshes.split(";"):
            cmd = [sys.executable, os.path.abspath(__file__),
                   "--predict-child", "--preset", preset,
                   "--predict-mesh", mesh_spec]
            env = dict(os.environ)
            env["PYTHONPATH"] = (
                repo_root + os.pathsep + env.get("PYTHONPATH", ""))
            print(f"[predict] {preset} mesh={mesh_spec} "
                  f"(lower+compile at true shapes)...", file=sys.stderr)
            res = subprocess.run(cmd, capture_output=True, text=True,
                                 env=env, cwd=repo_root)
            line = [ln for ln in res.stdout.splitlines()
                    if ln.startswith("{")]
            if not line:
                print(res.stdout, file=sys.stderr)
                print(res.stderr[-3000:], file=sys.stderr)
                raise SystemExit(
                    f"predict child failed: {preset} {mesh_spec}")
            rows.append(json.loads(line[-1]))

    step_ms_v5e = dict(MEASURED_STEP_MS_V5E)
    if args.step_ms:
        for kv in args.step_ms.split(";"):
            k, v = kv.split("=")
            step_ms_v5e[k] = float(v)

    out = []
    for r in rows:
        preset = r["preset"]
        compute_v5e = step_ms_v5e.get(preset)
        entry = dict(r)
        entry["predictions"] = {}
        for hw_name, hw in HW.items():
            comm_ms = sum(
                v["traffic"] for v in r["by_kind"].values()
            ) / (hw["ici_gbs"] * 1e9) * 1e3
            dom = max(
                r["by_kind"].items(), key=lambda kv: kv[1]["traffic"]
            )[0] if r["by_kind"] else None
            pred = {
                "comm_ms_per_step": round(comm_ms, 3),
                "dominant_collective": dom,
            }
            if compute_v5e is not None:
                compute = compute_v5e * hw["compute_scale"]
                pred["compute_ms_per_step"] = round(compute, 1)
                pred["efficiency_no_overlap"] = round(
                    compute / (compute + comm_ms), 4)
                pred["efficiency_full_overlap"] = round(
                    min(1.0, compute / max(compute, comm_ms)), 4)
                pred["meets_80pct_target"] = (
                    compute / (compute + comm_ms) >= 0.80)
            entry["predictions"][hw_name] = pred
        out.append(entry)

    artifact = {
        "method": (
            "weak-scaling prediction: per-step collective traffic parsed "
            "from the compiled HLO of the sharded train step at TRUE "
            "preset shapes (virtual CPU mesh, compile only — no timing), "
            "ring-collective per-chip traffic factors, public ICI "
            "bandwidth constants (v5e ~180 GB/s/chip, v5p ~540 GB/s/chip),"
            " and the MEASURED single-chip v5e step time as the compute "
            "term (v5p compute scaled conservatively by 0.5x; the step is"
            " row-rate/memory bound). efficiency = compute/(compute+comm)"
            " [no overlap] and compute/max(compute, comm) [full overlap]."
        ),
        "caveats": [
            "virtual-CPU step timings (scaling_bench.json) are 4-core "
            "oversubscription artifacts; they are NOT used here",
            "ICI constants are public-spec approximations",
            "assumes one slice (all traffic on ICI, none on DCN)",
        ],
        "measured_step_ms_v5e": step_ms_v5e,
        "rows": out,
    }
    with open(args.out_predict, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"{'preset':>16} {'mesh':>6} {'hw':>5} {'comm ms':>9} "
          f"{'eff(no-ovl)':>12} {'eff(ovl)':>9}  dominant")
    for e in out:
        mesh = f"{e['mesh']['data']}x{e['mesh']['graph']}"
        for hw_name, p in e["predictions"].items():
            print(f"{e['preset']:>16} {mesh:>6} {hw_name:>5} "
                  f"{p['comm_ms_per_step']:>9.2f} "
                  f"{p.get('efficiency_no_overlap', float('nan')):>12} "
                  f"{p.get('efficiency_full_overlap', float('nan')):>9} "
                  f" {p['dominant_collective']}")
    print(f"[predict] wrote {args.out_predict}", file=sys.stderr)


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
    ap.add_argument("--predict", type=str, default=None,
                    help="';'-separated presets: analytic ICI efficiency "
                         "prediction at true shapes (no timing runs)")
    ap.add_argument("--predict-meshes", type=str, default="2,4;4,4",
                    help="';'-separated d,g mesh shapes for --predict")
    ap.add_argument("--predict-child", action="store_true")
    ap.add_argument("--predict-mesh", type=str, default="2,4")
    ap.add_argument("--preset", type=str, default="collab-like")
    ap.add_argument("--step-ms", type=str, default=None,
                    help="override measured v5e step ms: 'preset=ms;...'")
    ap.add_argument("--out-predict", type=str,
                    default="scaling_predictions.json")
    args = ap.parse_args()

    if args.predict_child:
        run_predict_child(args)
        return
    if args.predict:
        predict_main(args)
        return
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
        # honesty-in-artifact (VERDICT r2 missing #3): these timings come
        # from N virtual devices oversubscribed onto a 4-core CPU host —
        # absolute efficiency is an artifact of that, not of the design
        r["caveat"] = (
            "virtual-CPU timing; core oversubscription dominates "
            "absolute efficiency. For the ICI-based prediction at real "
            "preset shapes see scaling_predictions.json "
            "(scripts/scaling_bench.py --predict)."
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
