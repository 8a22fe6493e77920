"""Training driver: epochs, eval schedule, early stopping, multi-seed runs.

Mirrors the reference training layer (reference:
src/train/train_model.py:23-182): per-epoch shuffled fixed-size batches,
eval every ``eval_steps`` with test-at-best-valid checkpointing, early
stop via ``kill_cnt``, and a multi-seed outer loop reporting mean +- std.

TPU-native differences: the whole optimization step (masking, negative
sampling, two forwards, loss, clipped Adam update) is ONE jitted program;
the ragged last batch is padded with zero-weight entries instead of
recompiling; checkpoints carry optimizer state + PRNG for true resume.
"""
from __future__ import annotations

import dataclasses
import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from lpformer_tpu.data.dataset import LinkPredDataset
from lpformer_tpu.evalx import harness
from lpformer_tpu.models import config as cfg_mod
from lpformer_tpu.models import link_transformer as lt
from lpformer_tpu.train import optim, step as step_mod
from lpformer_tpu.utils import checkpoint as ckpt
from lpformer_tpu.utils.logger import ResultsLogger


@dataclasses.dataclass
class TrainArgs:
    """Training-relevant CLI flags (reference run.py:151-202 defaults)."""

    epochs: int = 150
    lr: float = 1e-3
    decay: float = 1.0
    l2: float = 0.0
    batch_size: int = 1024
    test_batch_size: int = 32768
    num_negative: int = 1
    eval_steps: int = 5
    kill_cnt: int = 100
    runs: int = 1
    seed: int = 42
    metric: str = "MRR"
    heart: bool = False
    mask_input: bool = False
    save_as: Optional[str] = None
    checkpoint_dir: str = "checkpoints"
    verbose: bool = True
    data_name: str = "dataset"
    double_propagate: Optional[bool] = None  # None = auto (two propagations
                                   # only when mask_input requires them)
    resume: Optional[str] = None   # checkpoint path to resume training from
    save_every: int = 0            # also checkpoint every N epochs (crash
                                   # recovery; 0 = only at best-valid)
    grad_accum: int = 1            # micro-batches per optimizer step
    mesh: Optional[str] = None     # "D,G" (data x graph) — train over a mesh
    context_parallel: bool = False  # shard the context axis over 'graph'
    steps_per_call: int = 1        # optimizer steps fused into one jitted
                                   # device loop (amortizes dispatch)
    audit_budgets: bool = True     # one-shot start-of-training overflow
                                   # audit; warns when budgets silently
                                   # truncate context sets (the SURVEY §7
                                   # hard-part #1 failure mode)


def overflow_audit(ds, cfg, sample: int = 2048):
    """One-shot budget-overflow audit on a sampled link batch, run on the
    host CPU backend (cheap; never pays a tunnel compile). Returns
    (link_overflow_rate, entry_overflow_rate): the fraction of links
    whose context sets were truncated by the static budgets, and the
    fraction of context entries dropped — or ``None`` when no CPU
    backend exists (e.g. jax_platforms pinned to tpu), in which case the
    audit is skipped rather than paying an accelerator compile.
    ``ContextTables.overflow`` (ops/context.py) supplies the per-link
    counts; the reference has no budgets, so nonzero overflow is a
    framework-only approximation that must be surfaced, not silent
    (SURVEY §7 hard-part #1)."""
    from lpformer_tpu.ops.context import extract_context

    tp = np.asarray(ds.train_pos)
    take = min(sample, len(tp))
    idx = np.random.default_rng(0).choice(len(tp), take, replace=False)
    try:
        cpu0 = jax.devices("cpu")[0]
    except RuntimeError:
        print(
            "[budgets] no CPU backend available — skipping the "
            "start-of-training overflow audit (run "
            "scripts/audit_budgets.py separately)",
            flush=True,
        )
        return None
    with jax.default_device(cpu0):
        ctx = jax.jit(
            lambda a, p, s, t: extract_context(a, p, s, t, cfg.context)
        )(
            jax.device_put(ds.graph.adj_rows, cpu0),
            jax.device_put(ds.graph.ppr_rows, cpu0),
            jax.device_put(jnp.asarray(tp[idx, 0], jnp.int32), cpu0),
            jax.device_put(jnp.asarray(tp[idx, 1], jnp.int32), cpu0),
        )
    over = np.asarray(ctx.overflow)
    kept = int(np.asarray(ctx.valid).sum())
    dropped = int(over.sum())
    link_rate = float((over > 0).mean())
    entry_rate = dropped / max(kept + dropped, 1)
    return link_rate, entry_rate


def _iter_batches(rng: np.random.Generator, n: int, batch_size: int):
    """Shuffled fixed-size batches; last batch padded (weight 0)."""
    perm = rng.permutation(n)
    for lo in range(0, n, batch_size):
        hi = min(lo + batch_size, n)
        idx = perm[lo:hi]
        w = np.ones(batch_size, np.float32)
        if hi - lo < batch_size:
            pad = np.zeros(batch_size - (hi - lo), dtype=idx.dtype)
            idx = np.concatenate([idx, pad])
            w[hi - lo:] = 0.0
        yield idx, w


def _iter_step_groups(
    rng: np.random.Generator, train_pos: np.ndarray, batch_size: int, k: int
):
    """Stack batches into groups of ``k`` for the multi-step device loop;
    the last group is padded with dead (live=0) steps."""
    srcs, tgts, ws = [], [], []
    for idx, w in _iter_batches(rng, len(train_pos), batch_size):
        srcs.append(train_pos[idx, 0])
        tgts.append(train_pos[idx, 1])
        ws.append(w)
        if len(srcs) == k:
            yield (np.stack(srcs), np.stack(tgts), np.stack(ws),
                   np.ones(k, np.float32))
            srcs, tgts, ws = [], [], []
    if srcs:
        live = np.zeros(k, np.float32)
        live[: len(srcs)] = 1.0
        while len(srcs) < k:
            srcs.append(np.zeros_like(srcs[0]))
            tgts.append(np.zeros_like(tgts[0]))
            ws.append(np.zeros_like(ws[0]))
        yield np.stack(srcs), np.stack(tgts), np.stack(ws), live


def run_eval(
    params, cfg: cfg_mod.LPFormerConfig, ds: LinkPredDataset,
    args: TrainArgs, sharded=None,
) -> Dict[str, tuple]:
    """Dispatch to the right harness (reference train_model.py:114-117).
    ``sharded``: optional ShardedEvalContext — scores over the mesh."""
    if "citation" in ds.name.lower() and not ds.heart:
        return harness.test_citation2(
            params, cfg, ds, batch_size=args.test_batch_size,
            sharded=sharded,
        )
    return harness.test_standard(
        params, cfg, ds,
        batch_size=args.test_batch_size,
        k_list=(20, 50, 100),
        heart=ds.heart,
        sharded=sharded,
    )


def parse_mesh(spec: str):
    """'D,G' -> (d, g); 'auto' -> all devices on the data axis."""
    if spec == "auto":
        return len(jax.devices()), 1
    parts = spec.split(",")
    assert len(parts) == 2, f"--mesh expects 'D,G' or 'auto', got {spec!r}"
    return int(parts[0]), int(parts[1])


def train_loop(
    args: TrainArgs,
    cfg: cfg_mod.LPFormerConfig,
    ds: LinkPredDataset,
    loggers: Dict[str, ResultsLogger],
    seed: int,
    model_save_name: Optional[str] = None,
    rng_seed: Optional[int] = None,
) -> float:
    """One run's training (reference train_model.py:87-140). ``seed`` is
    the logger/run index; ``rng_seed`` (default: same) seeds the RNGs."""
    from lpformer_tpu.parallel import distributed as dist

    # multi-host: host-side side effects (prints, checkpoint writes, the
    # CPU overflow audit) belong to process 0; the device math is
    # identical on every process by construction (seeded batches)
    main_process = dist.is_coordinator()
    if not main_process:
        args = dataclasses.replace(args, verbose=False)
    if rng_seed is None:
        rng_seed = seed
    audit = (
        overflow_audit(ds, cfg)
        if args.audit_budgets and seed == 0 and main_process
        else None
    )
    if audit is not None:
        link_rate, entry_rate = audit
        if args.verbose or link_rate > 0.005:
            print(
                f"[budgets] context overflow: {link_rate:.2%} of links "
                f"truncated, {entry_rate:.2%} of entries dropped "
                f"(budgets cn={cfg.budget_cn} onehop={cfg.budget_onehop} "
                f"non1hop={cfg.budget_non1hop})",
                flush=True,
            )
        if link_rate > 0.005:
            print(
                "[budgets] WARNING: >0.5% of links exceed the static "
                "context budgets — compaction keeps the top-by-PPR "
                "entries, but metrics may degrade. Raise the budgets or "
                "re-run scripts/audit_budgets.py for this dataset.",
                flush=True,
            )
    key = jax.random.PRNGKey(rng_seed)
    params = lt.init_lpformer(key, cfg, in_dim=int(ds.graph.x.shape[1]))
    steps_per_epoch = max(
        1, (len(ds.train_pos) + args.batch_size - 1) // args.batch_size
    )
    optimizer = optim.make_optimizer(
        args.lr, args.l2, args.decay, steps_per_epoch, clip_norm=1.0
    )
    state = step_mod.TrainState(
        params=params,
        opt_state=optimizer.init(params),
        step=jnp.asarray(0, jnp.int32),
    )
    start_epoch = 1
    if args.resume:
        # restore INTO the freshly-initialized structure: the npz format
        # stores leaves by key path and rebuilds the optax state
        # namedtuples from this skeleton (utils/checkpoint.py)
        skeleton = {
            "params": state.params,
            "opt_state": state.opt_state,
            "step": state.step,
            "epoch": 0,
            "seed": 0,
        }
        blob = ckpt.load_checkpoint(args.resume, target=skeleton)
        if blob is None:
            raise FileNotFoundError(
                f"--resume checkpoint not found: {args.resume}"
            )
        if int(blob.get("seed", seed)) != seed:
            print(
                f"WARNING: resuming run {seed} from a checkpoint saved "
                f"for seed {blob.get('seed')}",
                flush=True,
            )
        state = step_mod.TrainState(
            params=blob["params"],
            opt_state=blob["opt_state"],
            step=jnp.asarray(blob["step"]),
        )
        start_epoch = int(blob["epoch"]) + 1
        if args.verbose:
            print(f"resumed from {args.resume} at epoch {start_epoch}")
    mult = ds.mask_mult_device
    data_rng = np.random.default_rng(rng_seed)
    step_key = jax.random.fold_in(key, 1234)

    eval_ctx = None
    if args.mesh:
        # First-class mesh training: context state row-sharded over the
        # full mesh, link batches sharded over both axes, eval scored
        # through the same mesh (SURVEY §2.4; the reference has no
        # parallelism of any kind).
        from lpformer_tpu.parallel import (
            make_mesh, make_sharded_train_step, partition_graph,
            place_sharded_graph,
        )
        from lpformer_tpu.parallel.eval import ShardedEvalContext

        if args.grad_accum > 1:
            raise ValueError("--grad-accum is not supported with --mesh")
        d, g = parse_mesh(args.mesh)
        ndev = d * g
        link_dev = d if args.context_parallel else ndev
        assert args.batch_size % link_dev == 0, (
            f"batch_size {args.batch_size} must divide over {link_dev} "
            f"link-sharding devices"
        )
        assert args.test_batch_size % link_dev == 0, (
            f"test_batch_size {args.test_batch_size} must divide over "
            f"{link_dev} link-sharding devices"
        )
        mesh = make_mesh(data=d, graph=g, devices=jax.devices()[:ndev])
        sg = place_sharded_graph(
            partition_graph(ds.graph, g=g, d=d, mask_input=args.mask_input),
            mesh,
        )
        eval_ctx = ShardedEvalContext(
            cfg, mesh, ds, sg_train=sg,
            context_parallel=args.context_parallel,
        )
        sharded_step = make_sharded_train_step(
            cfg, optimizer, mesh, ds.num_nodes, sg.rows_per_shard,
            sg.ctx_rows_per_shard, num_negative=args.num_negative,
            context_parallel=args.context_parallel,
            steps_per_call=args.steps_per_call,
            mask_input=args.mask_input,
        )

        if args.steps_per_call > 1:
            def group_call(state, srcs, tgts, ws, live):
                return sharded_step(
                    state, sg, mult, srcs, tgts, ws, live, step_key
                )
        else:
            def step_call(state, src, tgt, w):
                return sharded_step(state, sg, mult, src, tgt, w, step_key)
    else:
        train_step = step_mod.make_train_step(
            cfg, optimizer,
            num_negative=args.num_negative,
            mask_input=args.mask_input,
            double_propagate=args.double_propagate,
            grad_accum=args.grad_accum,
            steps_per_call=args.steps_per_call,
        )
        bin_w = (ds.graph.edge_w > 0).astype(jnp.float32)

        if args.steps_per_call > 1:
            def group_call(state, srcs, tgts, ws, live):
                return train_step(
                    state, ds.graph, mult, bin_w, srcs, tgts, ws, live,
                    step_key,
                )
        else:
            def step_call(state, src, tgt, w):
                return train_step(
                    state, ds.graph, mult, bin_w, src, tgt, w, step_key
                )

    best_valid, kill_cnt = 0.0, 0
    train_pos = np.asarray(ds.train_pos)
    for epoch in range(start_epoch, args.epochs + 1):
        t0 = time.time()
        # Device-side loss accumulator: a per-step float(loss) host fetch
        # would serialize host<->device every batch (the fetch is the only
        # true sync on the axon transport); accumulate on device and fetch
        # ONE scalar at the epoch boundary.
        total_loss = jnp.zeros((), jnp.float32)
        total_examples = 0.0
        if args.steps_per_call > 1:
            # K optimizer steps per executable launch (lax.scan device
            # loop): same math, 1/K the dispatch overhead
            for srcs, tgts, ws, live in _iter_step_groups(
                data_rng, train_pos, args.batch_size, args.steps_per_call
            ):
                state, losses = group_call(
                    state, jnp.asarray(srcs), jnp.asarray(tgts),
                    jnp.asarray(ws), jnp.asarray(live),
                )
                total_loss = total_loss + jnp.sum(
                    losses * jnp.asarray(ws.sum(axis=1))
                )
                total_examples += float(ws.sum())
        else:
            for idx, w in _iter_batches(
                data_rng, len(train_pos), args.batch_size
            ):
                src = jnp.asarray(train_pos[idx, 0])
                tgt = jnp.asarray(train_pos[idx, 1])
                state, loss = step_call(state, src, tgt, jnp.asarray(w))
                n_real = float(w.sum())
                total_loss = total_loss + loss * n_real
                total_examples += n_real
        if args.verbose:
            print(
                f"Epoch {epoch} Loss: {float(total_loss) / total_examples:.4f} "
                f"({time.time() - t0:.1f}s)",
                flush=True,
            )

        if (args.save_every and model_save_name is not None
                and main_process and epoch % args.save_every == 0):
            # periodic crash-recovery checkpoint (reference has none —
            # SURVEY §5 failure handling; pairs with --resume)
            ckpt.save_checkpoint(
                model_save_name + ".latest.ckpt",
                {
                    "params": state.params,
                    "opt_state": state.opt_state,
                    "step": state.step,
                    "epoch": epoch,
                    "seed": seed,
                },
            )

        if epoch % args.eval_steps == 0:
            results = run_eval(state.params, cfg, ds, args, sharded=eval_ctx)
            for key_name, result in results.items():
                if key_name in loggers:
                    loggers[key_name].add_result(seed, result)
                if args.verbose and key_name == args.metric:
                    print(f"  {key_name} = {result}", flush=True)
            current = loggers[args.metric].best_valid(seed)
            if current > best_valid:
                kill_cnt = 0
                best_valid = current
                if model_save_name is not None and main_process:
                    ckpt.save_checkpoint(
                        model_save_name + ".ckpt",
                        {
                            "params": state.params,
                            "opt_state": state.opt_state,
                            "step": state.step,
                            "epoch": epoch,
                            "seed": seed,
                        },
                    )
            else:
                kill_cnt += 1
                if kill_cnt > args.kill_cnt:
                    break
    return best_valid


def train_data(
    args: TrainArgs, cfg: cfg_mod.LPFormerConfig, ds: LinkPredDataset
):
    """Multi-seed driver (reference train_model.py:143-182)."""
    model_save_name = None
    if args.save_as is not None:
        model_save_name = os.path.join(
            args.checkpoint_dir, args.data_name, args.save_as
        )

    loggers = {
        "Hits@20": ResultsLogger(args.runs),
        "Hits@50": ResultsLogger(args.runs),
        "Hits@100": ResultsLogger(args.runs),
    }
    if args.metric == "MRR" or ds.heart or "citation" in ds.name.lower():
        loggers["MRR"] = ResultsLogger(args.runs)

    for run in range(args.runs):
        # reference semantics (train_model.py:147,165-167): single runs
        # use init_seed(args.seed); multi-run sweeps re-seed with the run
        # index. Loggers are always indexed by run.
        rng_seed = args.seed if args.runs == 1 else run
        run_name = model_save_name
        if model_save_name is not None and args.runs > 1:
            run_name = model_save_name + f"_seed-{run + 1}"
        train_loop(args, cfg, ds, loggers, run, run_name, rng_seed=rng_seed)

    from lpformer_tpu.parallel import distributed as dist

    if dist.is_coordinator():
        print(args.metric + "\n" + "-" * len(args.metric))
    best_mean, best_var = loggers[args.metric].print_statistics(
        verbose=dist.is_coordinator()
    )
    return (
        best_mean[1],
        f"{best_mean[1]} ± {best_var[1]}",
        f"{best_mean[2]} ± {best_var[2]}",
    )
