#!/usr/bin/env python
"""Step-level time/byte budget from a jax.profiler trace.

VERDICT r3 #1: "produce a committed artifact decomposing the step
(per-op self-time + per-op bytes) explaining the 3.6 MB/link". This
parses the device trace written by scripts/profile_step.py, groups leaf
XLA ops into subsystem categories, estimates HBM bytes per op from its
output shape (lower bound; inputs counted for gathers where the table
read dominates), and emits step_budget.json with a ceiling verdict per
category:

  * gather-bound  — at the measured gather-engine row rate
                    (bench --gather artifacts)
  * kernel        — inside a Pallas kernel (its own roofline applies)
  * mxu / vpu     — compute-bound fusions
  * unattributed  — the long tail

Usage:
  python scripts/profile_step.py --preset collab-like --out /tmp/tr
  python scripts/step_budget.py --trace /tmp/tr --out step_budget.json
"""
from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import re


DTYPE_BYTES = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "pred": 1,
               "f16": 2, "s8": 1, "u8": 1, "s16": 2, "f64": 8}


def shape_bytes(shape: str) -> int:
    m = re.match(r"([a-z0-9]+)\[([0-9,]*)\]", shape)
    if not m:
        return 0
    dt, dims = m.group(1), m.group(2)
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * DTYPE_BYTES.get(dt, 4)


def categorize(base: str, shape: str, tf_op: str) -> str:
    """Category from the XLA op's source path (tf_op) first — shape
    patterns only as fallback."""
    if "fused_pe_link_attention" in base or "fused_pe_link_attention" in tf_op:
        return "attention-kernel (Pallas fwd/bwd)"
    if "_scatter_sorted" in tf_op or "scatter_sorted" in base:
        # transpose_jvp first: the Pallas scatter custom-call's base name
        # contains "scatter_sorted" (and hence "sort") itself
        if base.startswith("transpose_jvp"):
            return "gather-VJP: Pallas scatter kernel"
        if "sort" in base or "/sort" in tf_op:
            return "gather-VJP: segmented sort"
        if "_take" in tf_op or "gather" in tf_op or "dynamic-update" in base:
            return "gather-VJP: cotangent permute"
        if base.startswith("transpose_jvp"):
            return "gather-VJP: Pallas scatter kernel"
        return "gather-VJP: layout/worklist"
    if "gather_rows" in tf_op or re.match(
            r"(bf16|f32)\[(131\d{4}|5242\d{2}),", shape):
        # 1.31M rows = classic per-class blocks (B*320); 524288 = the
        # combined class-tagged table (B*128)
        return "context key gather (fwd)"
    if "_spmm" in tf_op or "gcn" in tf_op:
        return "SpMM (GCN propagation fwd+bwd)"
    if "extract_context" in tf_op or "compute_node_mask" in tf_op:
        return "context extraction (compare-all, PE tables)"
    if base == "sort":
        return "sorts (extraction top-k)"
    if re.search(r"\[4096,\d+,[234]\]", shape) or re.search(
            r"pred\[\d{6,},128\]", shape) or re.search(
            r"pred\[4096,", shape):
        return "context extraction (compare-all, PE tables)"
    if re.search(r"(bf16|f32)\[(1[0-7]\d{4}|[2-9]\d{4}),128\]", shape):
        # ELL bucket gathers/converts/segment sums (bf16 gather rows and
        # their f32 convert/reduce tails)
        return "SpMM (GCN propagation fwd+bwd)"
    if "dynamic-update-slice" in base or base == "while":
        return "SpMM (GCN propagation fwd+bwd)"
    if re.search(r"f32\[50000", shape) or re.search(r"f32\[49\d{3}", shape):
        return "SpMM (GCN propagation fwd+bwd)"
    return "other (MLPs, LayerNorm, optimizer, loss)"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", type=str, required=True)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--out", type=str, default="step_budget.json")
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--meta", type=str, default="",
                    help="freeform context note recorded in the artifact")
    args = ap.parse_args()

    traces = sorted(glob.glob(args.trace + "/**/*.trace.json.gz",
                              recursive=True))
    d = json.loads(gzip.open(traces[-1]).read())
    ev = d["traceEvents"]
    dev_pids = {
        e["pid"] for e in ev
        if e.get("ph") == "M" and e.get("name") == "process_name"
        and "TPU" in str(e.get("args", {}).get("name", ""))
    }
    tid_names = {
        (e["pid"], e["tid"]): e["args"]["name"] for e in ev
        if e.get("ph") == "M" and e.get("name") == "thread_name"
        and e["pid"] in dev_pids
    }
    steps = [e for e in ev if e.get("ph") == "X"
             and tid_names.get((e.get("pid"), e.get("tid"))) == "Steps"]
    step_ms = sum(e["dur"] for e in steps) / max(len(steps), 1) / 1e3

    ops = [e for e in ev if e.get("ph") == "X"
           and tid_names.get((e.get("pid"), e.get("tid"))) == "XLA Ops"]
    cat = collections.defaultdict(lambda: [0.0, 0, 0])
    groups = collections.defaultdict(lambda: [0.0, 0])
    for e in ops:
        ln = str(e.get("args", {}).get("long_name") or "")
        m = re.match(r"%\S+ = \(?([a-z0-9]+\[[0-9,]*\])", ln)
        shape = m.group(1) if m else "?"
        base = re.sub(r"\.\d+$", "", e["name"])
        c = categorize(base, shape, str(e.get("args", {}).get("tf_op") or ""))
        cat[c][0] += e["dur"]
        cat[c][1] += 1
        cat[c][2] += shape_bytes(shape)
        groups[(base, shape, c)][0] += e["dur"]
        groups[(base, shape, c)][1] += 1

    n = args.steps
    total_ms = sum(v[0] for v in cat.values()) / n / 1e3
    rows = []
    for c, (us, cnt, byt) in sorted(cat.items(), key=lambda kv: -kv[1][0]):
        ms = us / n / 1e3
        gb = byt / n / 1e9
        rows.append({
            "category": c,
            "ms_per_step": round(ms, 3),
            "pct": round(100 * ms / total_ms, 1),
            "output_gb_per_step": round(gb, 3),
            "eff_gbps_outputs": round(gb / (ms / 1e3), 1) if ms else 0,
        })
        print(f"{ms:8.2f} ms {100*ms/total_ms:5.1f}%  out={gb:6.2f} GB "
              f"({gb/(ms/1e3) if ms else 0:6.0f} GB/s)  {c}")
    top = sorted(groups.items(), key=lambda kv: -kv[1][0])[:30]
    top_rows = [
        {"op": b, "shape": s, "category": c,
         "ms_per_step": round(us / n / 1e3, 3), "calls_per_step": cnt // n}
        for (b, s, c), (us, cnt) in top
    ]
    artifact = {
        "trace": traces[-1],
        "meta": args.meta,
        "device_step_ms": round(step_ms, 2),
        "leaf_attributed_ms": round(total_ms, 2),
        "batch": args.batch,
        "bytes_per_link_outputs": round(
            sum(v[2] for v in cat.values()) / n / args.batch, 1),
        "categories": rows,
        "top_ops": top_rows,
    }
    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"[budget] step {step_ms:.1f} ms; wrote {args.out}")


if __name__ == "__main__":
    main()
