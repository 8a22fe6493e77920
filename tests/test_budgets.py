"""Automatic budget derivation (utils/budgets.py) — VERDICT r3 item #6.

When --budget-* are unset, budgets must come from measured p99.9 class
counts (the audit_budgets.py logic), not row-cap heuristics, so a real
dataset can't silently truncate context sets."""
import numpy as np

from lpformer_tpu.cli.run import build_parser, build_config, apply_config
from lpformer_tpu.data.synthetic import synthetic_dataset
from lpformer_tpu.utils.budgets import derive_budgets


def _ds():
    return synthetic_dataset(
        seed=0, num_nodes=200, num_train=800, num_eval=40, feat_dim=8,
        adj_cap=64, ppr_cap=128,
    )


def test_derive_budgets_covers_measured_counts():
    import jax
    import jax.numpy as jnp

    from lpformer_tpu.ops.context import ContextConfig, extract_context

    ds = _ds()
    got = derive_budgets(ds, 0.0, 1e-4, 1e-4, sample=512)
    assert got is not None
    b_cn, b_oh, b_n1 = got
    # fused-kernel tiling: every class budget a multiple of 32
    assert b_cn % 32 == 0 and b_oh % 32 == 0 and b_n1 % 32 == 0
    # p99.9 coverage: measure exact counts and check the budgets hold
    cfg = ContextConfig.from_thresholds(
        0.0, 1e-4, 1e-4, budget_cn=16, budget_onehop=16, budget_non1hop=16
    )
    tp = np.asarray(ds.train_pos)
    idx = np.random.default_rng(0).choice(len(tp), 512, replace=False)
    ctx = jax.jit(
        lambda s, t: extract_context(
            ds.graph.adj_rows, ds.graph.ppr_rows, s, t, cfg
        )
    )(jnp.asarray(tp[idx, 0], jnp.int32), jnp.asarray(tp[idx, 1], jnp.int32))
    counts = np.asarray(ctx.counts)
    for col, b, hi in ((0, b_cn, 64), (1, b_oh, 128), (2, b_n1, 128)):
        covered = float((counts[:, col] <= b).mean())
        assert covered >= 0.995 or b == hi, (col, b, covered)


def test_build_config_uses_measured_budgets():
    ds = _ds()
    argv = ["--data_name", "synthetic", "--adj-cap", "64",
            "--ppr-cap", "128", "--non-verbose"]
    args = apply_config(build_parser(), argv)
    cfg = build_config(args, ds)
    want = derive_budgets(ds, args.thresh_cn, args.thresh_1hop,
                          args.thresh_non1hop)
    assert (cfg.budget_cn, cfg.budget_onehop, cfg.budget_non1hop) == want

    # explicit per-class flags win over the measurement
    args2 = apply_config(build_parser(), argv + ["--budget-cn", "48"])
    cfg2 = build_config(args2, ds)
    assert cfg2.budget_cn == 48
    assert cfg2.budget_onehop == want[1]


def test_derive_budgets_include_combined():
    ds = _ds()
    got = derive_budgets(ds, 0.0, 1e-4, 1e-4, sample=512,
                         include_combined=True)
    assert got is not None and len(got) == 4
    b_cn, b_oh, b_n1, b_all = got
    assert b_all % 32 == 0
    # the combined budget never exceeds the stacked per-class budgets
    # and never exceeds what the rows can physically supply
    assert b_all <= b_cn + b_oh + b_n1
    assert b_all <= 2 * 64 + 128
