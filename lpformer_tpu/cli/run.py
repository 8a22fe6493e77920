"""CLI runner, flag-compatible with the reference.

Mirrors reference src/run.py:150-211 (same flag names and defaults where
they exist), plus TPU-specific knobs (context budgets, platform, mesh).

Usage:
  python -m lpformer_tpu.cli.run --data_name cora --lr 5e-3 ...
  python -m lpformer_tpu.cli.run --data_name synthetic --epochs 3   # smoke
"""
from __future__ import annotations

import argparse
import os

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser()
    p.add_argument("--config", type=str, default=None,
                   help="JSON config: a path, or a name under configs/ "
                        "(e.g. 'ogbl-collab-existing'). Explicit CLI flags "
                        "override config values.")
    p.add_argument("--matmul-dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"],
                   help="bfloat16: bf16 MXU matmuls + bf16 key tables "
                        "and gathers, f32 softmax/accumulation")
    # (reference run.py:151-202)
    p.add_argument("--data_name", type=str, default="ogbl-collab")
    p.add_argument("--runs", type=int, default=1)
    p.add_argument("--mask-input", action="store_true", default=False)
    p.add_argument("--non-verbose", action="store_true", default=False)

    p.add_argument("--dim", type=int, default=256)
    p.add_argument("--tlayers", type=int, default=1)
    p.add_argument("--num-heads", type=int, default=1)
    p.add_argument("--gnn-layers", type=int, default=2)
    p.add_argument("--pred-layers", type=int, default=2)
    p.add_argument("--dropout", type=float, default=0.2)
    p.add_argument("--gnn-drop", type=float, default=0.2)
    p.add_argument("--att-drop", type=float, default=0.1)
    p.add_argument("--pred-drop", type=float, default=0)
    p.add_argument("--feat-drop", type=float, default=0)
    p.add_argument("--residual", action="store_true", default=False)
    p.add_argument("--no-layer-norm", action="store_true", default=False)
    p.add_argument("--no-relu", action="store_true", default=False)

    p.add_argument("--epochs", type=int, default=150)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--decay", type=float, default=1.0)
    p.add_argument("--batch-size", type=int, default=1024)
    p.add_argument("--test-batch-size", type=int, default=32768)
    p.add_argument("--num-negative", type=int, default=1)
    p.add_argument("--eval_steps", type=int, default=5)
    p.add_argument("--kill_cnt", dest="kill_cnt", default=100, type=int)
    p.add_argument("--l2", type=float, default=0.0)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--use-val-in-test", action="store_true", default=False)
    p.add_argument("--heart", action="store_true", default=False)
    p.add_argument("--save-as", type=str, default=None)
    p.add_argument("--metric", type=str, default=None,
                   help="eval metric for model selection (default: the "
                        "reference's per-dataset choice, run.py:102-120; "
                        "an explicit value wins)")
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--checkpoint-dir", type=str, default="checkpoints",
                   help="root directory for checkpoint save/load "
                        "(reference hard-codes 'checkpoints/', "
                        "utils.py:25)")
    p.add_argument("--eps", type=float, default=1e-4)
    p.add_argument("--thresh-cn", type=float, default=0)
    p.add_argument("--thresh-1hop", type=float, default=1e-2)
    p.add_argument("--thresh-non1hop", type=float, default=1e-2)

    # TPU-native additions
    p.add_argument("--data-dir", type=str, default="dataset")
    p.add_argument("--platform", type=str, default=None,
                   help="jax platform override (cpu for local runs)")
    p.add_argument("--jax-cache-dir", type=str,
                   default=os.environ.get(
                       "JAX_COMPILATION_CACHE_DIR",
                       os.path.join("~", ".cache", "lpformer_tpu",
                                    "jax_cache")),
                   help="persistent XLA compile cache dir (empty string "
                        "disables); repeat runs then skip the multi-"
                        "minute TPU-tunnel compile of unchanged programs")
    p.add_argument("--budget-cn", type=int, default=None)
    p.add_argument("--budget-onehop", type=int, default=None)
    p.add_argument("--budget-non1hop", type=int, default=None)
    p.add_argument("--budget-combined", type=str, default=None,
                   help="combined (class-tagged) context table: one "
                        "cross-class budget replacing the per-class "
                        "blocks — class-count tails don't stack, so it "
                        "typically runs the same context sets in far "
                        "fewer static slots (key gather + attention "
                        "kernel + scatter VJP all scale with it). An "
                        "int, or 'auto' = p99.9 of the measured TOTAL "
                        "per-link count. Default: off (per-class "
                        "blocks)")
    p.add_argument("--adj-cap", type=int, default=None)
    p.add_argument("--ppr-cap", type=int, default=None)
    p.add_argument("--single-propagate", action="store_true", default=False,
                   help="share one GCN propagation across pos/neg halves "
                        "(the default whenever --mask-input is off)")
    p.add_argument("--double-propagate", action="store_true", default=False,
                   help="force two full propagations per step (bit-exact "
                        "reference emulation; ~17%% slower)")
    p.add_argument("--save-every", type=int, default=0,
                   help="also checkpoint every N epochs (crash recovery)")
    p.add_argument("--resume", type=str, default=None,
                   help="checkpoint path to resume training from")
    p.add_argument("--pallas-attention", dest="pallas_attention",
                   action="store_true", default=None,
                   help="force the fused Pallas PE+attention kernel "
                        "(default: auto — on when running on TPU)")
    p.add_argument("--no-pallas-attention", dest="pallas_attention",
                   action="store_false",
                   help="force the XLA dense-masked attention path")
    p.add_argument("--context-parallel", action="store_true",
                   help="with --mesh: shard each link's context set over "
                        "the 'graph' axis (merged two-pass softmax) — for "
                        "budgets exceeding one chip")
    p.add_argument("--mesh", type=str, default=None,
                   help="'D,G' (data x graph) or 'auto': train + eval over "
                        "a device mesh with row-sharded context state")
    # multi-host bring-up (parallel/distributed.py; one command per
    # host — the mesh then spans every host's chips)
    p.add_argument("--coordinator", type=str, default=None,
                   help="multi-host: coordinator address host:port "
                        "(same value on every host)")
    p.add_argument("--num-processes", type=int, default=None,
                   help="multi-host: total number of processes")
    p.add_argument("--process-id", type=int, default=None,
                   help="multi-host: this process's id (0-based; 0 owns "
                        "checkpoint writes and logging)")
    p.add_argument("--distributed", type=str, default=None,
                   choices=["auto"],
                   help="'auto': JAX cluster auto-detection (Cloud TPU "
                        "pod metadata) instead of explicit coordinator "
                        "flags")
    p.add_argument("--grad-accum", type=int, default=1,
                   help="micro-batches per optimizer step (memory cap)")
    p.add_argument("--steps-per-call", type=int, default=1,
                   help="optimizer steps fused into one jitted device "
                        "loop (amortizes per-launch dispatch overhead)")
    p.add_argument("--dump-att", action="store_true", default=False,
                   help="after training, dump attention weights over the "
                        "test positives to attention_weights.npz")
    # synthetic-dataset knobs (smoke tests / benches)
    p.add_argument("--syn-nodes", type=int, default=2000)
    p.add_argument("--syn-edges", type=int, default=10000)
    p.add_argument("--syn-feat", type=int, default=64)
    # accepted for drop-in compatibility with the reference CLI; these
    # are parsed but never read in the reference either
    # (reference: src/run.py:181-196 — no other occurrence), and
    # --device selects a CUDA index (N/A here; use --platform/--mesh)
    for flag in ("--output_dir", "--bymetric"):
        p.add_argument(flag, type=str, default=None, help=argparse.SUPPRESS)
    p.add_argument("--percentile", type=float, default=75,
                   help=argparse.SUPPRESS)
    p.add_argument("--log_steps", type=int, default=1,
                   help=argparse.SUPPRESS)
    p.add_argument("--device", type=int, default=0, help=argparse.SUPPRESS)
    p.add_argument("--remove-pos-edges", action="store_true",
                   default=False, help=argparse.SUPPRESS)
    return p


def load_dataset(args):
    name = args.data_name.lower()
    if name == "synthetic":
        from lpformer_tpu.data.synthetic import synthetic_dataset

        return synthetic_dataset(
            seed=args.seed,
            num_nodes=args.syn_nodes,
            num_train=args.syn_edges,
            num_eval=max(args.syn_edges // 20, 10),
            feat_dim=args.syn_feat,
            eps=args.eps,
            heart=args.heart,
            mask_input=args.mask_input,
            # Uncapped rows on a dense synthetic PPR (cap ~ N) make the
            # [B, A, P] extraction compares quadratic in N — at the
            # default test batch that is a multi-100GB buffer.
            adj_cap=args.adj_cap if args.adj_cap is not None else 96,
            ppr_cap=args.ppr_cap if args.ppr_cap is not None else 256,
        )
    if name in ("cora", "citeseer", "pubmed", "chameleon", "squirrel"):
        from lpformer_tpu.data.planetoid import read_data_planetoid

        return read_data_planetoid(
            args.data_name, data_dir=args.data_dir, eps=args.eps,
            heart=args.heart, seed=args.seed,
            adj_cap=args.adj_cap, ppr_cap=args.ppr_cap,
            mask_input=args.mask_input,
        )
    from lpformer_tpu.data.ogb import read_data_ogb

    return read_data_ogb(
        args.data_name, data_dir=args.data_dir, eps=args.eps,
        heart=args.heart, use_val_in_test=args.use_val_in_test,
        dim_for_featureless=args.dim, seed=args.seed,
        adj_cap=args.adj_cap, ppr_cap=args.ppr_cap,
        mask_input=args.mask_input,
    )


def default_metric(args) -> str:
    # (reference run.py:102-120)
    if args.heart:
        return "MRR"
    return {
        "ogbl-collab": "Hits@50",
        "ogbl-ddi": "Hits@20",
        "ogbl-ppa": "Hits@100",
        "ogbl-citation2": "MRR",
    }.get(args.data_name, "MRR")


def build_config(args, ds):
    from lpformer_tpu.models import LPFormerConfig

    adj_cap = ds.graph.adj_rows.cap
    ppr_cap = ds.graph.ppr_rows.cap
    budgets = (args.budget_cn, args.budget_onehop, args.budget_non1hop)
    if any(b is None for b in budgets):
        # measure instead of guessing: p99.9 of exact per-class context
        # counts over sampled train links (scripts/audit_budgets.py
        # logic, applied by default so a real-data run can't silently
        # truncate). Explicit --budget-* flags always win per class.
        from lpformer_tpu.utils.budgets import derive_budgets

        derived = derive_budgets(
            ds, args.thresh_cn, args.thresh_1hop, args.thresh_non1hop
        )
        if derived is not None:
            budgets = tuple(
                b if b is not None else d for b, d in zip(budgets, derived)
            )
            if not args.non_verbose:
                print(
                    f"[budgets] measured for {ds.name}: "
                    f"cn={budgets[0]} onehop={budgets[1]} "
                    f"non1hop={budgets[2]} (p99.9 of sampled exact "
                    f"counts; override with --budget-*)",
                    flush=True,
                )
        else:
            # no CPU backend: fall back to the row-cap heuristics
            budgets = (
                budgets[0] or adj_cap,
                budgets[1] or 2 * adj_cap,
                budgets[2] or ppr_cap,
            )
    bc = getattr(args, "budget_combined", None)
    if bc == "auto":
        from lpformer_tpu.utils.budgets import derive_budgets

        d4 = derive_budgets(
            ds, args.thresh_cn, args.thresh_1hop, args.thresh_non1hop,
            include_combined=True,
        )
        bc = d4[3] if d4 is not None else None
        if bc is not None and not args.non_verbose:
            print(f"[budgets] measured combined budget: {bc} "
                  f"(p99.9 of total per-link count)", flush=True)
    elif bc is not None:
        bc = int(bc)
    return LPFormerConfig(
        dim=args.dim,
        num_heads=args.num_heads,
        gnn_layers=args.gnn_layers,
        trans_layers=args.tlayers,
        pred_layers=args.pred_layers,
        thresh_cn=args.thresh_cn,
        thresh_1hop=args.thresh_1hop,
        thresh_non1hop=args.thresh_non1hop,
        residual=args.residual,
        layer_norm=not args.no_layer_norm,
        relu=not args.no_relu,
        dropout=args.dropout,
        gnn_drop=args.gnn_drop,
        att_drop=args.att_drop,
        feat_drop=args.feat_drop,
        pred_drop=args.pred_drop,
        budget_cn=budgets[0],
        budget_onehop=budgets[1],
        budget_non1hop=budgets[2],
        budget_combined=bc,
        use_pallas_attention=args.pallas_attention,
        matmul_dtype=args.matmul_dtype,
    )


def apply_config(parser: argparse.ArgumentParser, argv):
    """Two-phase parse: read --config first, load its JSON as parser
    defaults (explicit CLI flags still win), then parse fully. A bare
    name resolves under the repo's configs/ directory."""
    pre, _ = parser.parse_known_args(argv)
    if pre.config is None:
        return parser.parse_args(argv)
    import json

    path = pre.config
    if not os.path.exists(path):
        cand = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))),
            "configs", path + ".json",
        )
        if os.path.exists(cand):
            path = cand
        else:
            raise FileNotFoundError(
                f"--config {pre.config!r}: no such file, and no "
                f"configs/{pre.config}.json"
            )
    with open(path) as f:
        cfg = json.load(f)
    known = {a.dest for a in parser._actions}
    unknown = set(cfg) - known
    if unknown:
        raise ValueError(f"unknown config keys in {path}: {sorted(unknown)}")
    parser.set_defaults(**cfg)
    return parser.parse_args(argv)


def main(argv=None):
    args = apply_config(build_parser(), argv)
    if args.platform:
        os.environ["JAX_PLATFORMS"] = args.platform
        import jax

        jax.config.update("jax_platforms", args.platform)
    if args.jax_cache_dir:
        # persistent compile cache — TPU-tunnel compiles cost minutes
        # per new program. NOTE: this jax build ignores the
        # JAX_COMPILATION_CACHE_DIR env var; the config API is the
        # only route that engages the cache (see bench.py).
        import jax

        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser(args.jax_cache_dir))

    # multi-host bring-up MUST precede any backend-touching jax call
    from lpformer_tpu.parallel import distributed as dist

    dist.initialize(
        coordinator=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
        auto=args.distributed == "auto",
    )

    from lpformer_tpu.utils.seed import init_seed

    init_seed(args.seed)  # reference init_seed (utils.py:11-17)

    ds = load_dataset(args)
    if args.metric is None:  # explicit --metric (or config) wins
        args.metric = default_metric(args)
    cfg = build_config(args, ds)

    from lpformer_tpu.train.trainer import TrainArgs, train_data

    targs = TrainArgs(
        epochs=args.epochs,
        lr=args.lr,
        decay=args.decay,
        l2=args.l2,
        batch_size=args.batch_size,
        test_batch_size=args.test_batch_size,
        num_negative=args.num_negative,
        eval_steps=args.eval_steps,
        kill_cnt=args.kill_cnt,
        runs=args.runs,
        seed=args.seed,
        metric=args.metric,
        heart=args.heart,
        mask_input=args.mask_input,
        save_as=args.save_as,
        checkpoint_dir=args.checkpoint_dir,
        verbose=not args.non_verbose,
        data_name=args.data_name,
        double_propagate=(True if args.double_propagate
                          else False if args.single_propagate else None),
        resume=args.resume,
        save_every=args.save_every,
        grad_accum=args.grad_accum,
        mesh=args.mesh,
        context_parallel=args.context_parallel,
        steps_per_call=args.steps_per_call,
    )

    if args.checkpoint is not None:
        return eval_checkpoint(args, cfg, ds)
    result = train_data(targs, cfg, ds)
    if args.dump_att and args.save_as:
        _dump_attention(args, cfg, ds)
    return result


def _dump_attention(args, cfg, ds):
    """--dump-att: attention weights of the best checkpoint over test
    positives (reference run.py:193, layers.py:69-75)."""
    from lpformer_tpu.evalx.analysis import attention_weights
    from lpformer_tpu.utils import checkpoint as ckpt

    path = os.path.join(
        args.checkpoint_dir, args.data_name,
        args.save_as + ("_seed-1" if args.runs > 1 else "") + ".ckpt",
    )
    state = ckpt.load_checkpoint(path)
    if state is None:
        print(f"--dump-att: no checkpoint at {path}")
        return
    edges = np.asarray(ds.test_pos)[: args.test_batch_size]
    ids, valid, alpha = attention_weights(
        state["params"], cfg, ds, edges, test_set=True
    )
    np.savez_compressed(
        "attention_weights.npz", edges=edges, ids=ids, valid=valid,
        alpha=alpha,
    )
    print(f"--dump-att: wrote attention_weights.npz for {len(edges)} edges")


def eval_checkpoint(args, cfg, ds):
    """Checkpoint-only evaluation (reference run.py:17-87).

    Honors ``--mesh`` / ``--context-parallel``: citation2-scale
    checkpoint evaluation (the imported-reference-checkpoint story) runs
    through the same row-sharded mesh scorer as training, so it is not
    limited to what fits one chip."""
    from lpformer_tpu.train.trainer import run_eval, TrainArgs, parse_mesh
    from lpformer_tpu.utils import checkpoint as ckpt

    targs = TrainArgs(
        test_batch_size=args.test_batch_size, metric=args.metric,
        heart=args.heart, data_name=args.data_name,
        checkpoint_dir=args.checkpoint_dir,
    )
    eval_ctx = None
    if args.mesh:
        import jax

        from lpformer_tpu.parallel import make_mesh
        from lpformer_tpu.parallel.eval import ShardedEvalContext

        d, g = parse_mesh(args.mesh)
        link_dev = d if args.context_parallel else d * g
        assert args.test_batch_size % link_dev == 0, (
            f"test_batch_size {args.test_batch_size} must divide over "
            f"{link_dev} link-sharding devices"
        )
        mesh = make_mesh(data=d, graph=g, devices=jax.devices()[: d * g])
        eval_ctx = ShardedEvalContext(
            cfg, mesh, ds, context_parallel=args.context_parallel
        )
    results = []
    for run in range(1, args.runs + 1):
        suffix = f"_seed-{run}" if args.runs > 1 else ""
        path = os.path.join(
            args.checkpoint_dir, args.data_name,
            args.checkpoint + suffix + ".ckpt",
        )
        state = ckpt.load_checkpoint(path)
        if state is None:
            raise FileNotFoundError(path)
        r = run_eval(state["params"], cfg, ds, targs, sharded=eval_ctx)
        print(f">>> Seed={run}")
        for k, v in r.items():
            print(f"  {k} = {v}")
        results.append(r[args.metric][-1])
    print("\nMean Performance:")
    print(f"    {args.metric} -->", float(np.mean(results)))
    return results


if __name__ == "__main__":
    main()
