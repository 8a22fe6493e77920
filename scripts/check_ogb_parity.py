#!/usr/bin/env python
"""Cross-check lpformer_tpu's metrics against the official OGB Evaluator.

This image has no `ogb` package (and no egress), so the framework's
Hits@K / MRR implementations (lpformer_tpu/evalx/metrics.py) are
oracle-tested against numpy re-derivations only. Run THIS script in any
environment that has both jax (CPU is fine) and ogb to certify exact
parity with `ogb.linkproppred.Evaluator`:

    pip install "jax[cpu]" ogb
    python scripts/check_ogb_parity.py

Expected output: one PASS line per case and a final ALL PARITY CHECKS
PASSED. Covers random score vectors, heavy-tie vectors (the optimistic/
pessimistic rank averaging of reference src/train/evaluation.py:33-37),
all-equal scores, and K > #negatives.
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np  # noqa: E402


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from lpformer_tpu.evalx import metrics

    try:
        from ogb.linkproppred import Evaluator
    except ImportError:
        print("ogb is not installed — run this in an ogb-enabled env.")
        sys.exit(2)

    rng = np.random.default_rng(0)
    failures = 0

    def check(name, got, want, tol=1e-9):
        nonlocal failures
        ok = abs(got - want) <= tol
        print(f"{'PASS' if ok else 'FAIL'} {name}: got={got!r} want={want!r}")
        failures += 0 if ok else 1

    # ---- Hits@K vs ogbl-collab evaluator (eval_hits) ----
    ev = Evaluator(name="ogbl-collab")   # hits-type evaluator
    cases = {
        "random": (rng.normal(size=5000).astype(np.float32),
                   rng.normal(size=20000).astype(np.float32)),
        "heavy-ties": (
            rng.integers(0, 5, 5000).astype(np.float32),
            rng.integers(0, 5, 20000).astype(np.float32),
        ),
        "all-equal": (np.full(100, 0.5, np.float32),
                      np.full(400, 0.5, np.float32)),
        "few-negs": (rng.normal(size=100).astype(np.float32),
                     rng.normal(size=10).astype(np.float32)),
    }
    for cname, (pos, neg) in cases.items():
        for k in (20, 50, 100):
            ev.K = k
            want = ev.eval(
                {"y_pred_pos": pos, "y_pred_neg": neg}
            )[f"hits@{k}"]
            got = float(metrics.evaluate_hits_single(
                jnp.asarray(pos), jnp.asarray(neg), k
            ))
            check(f"Hits@{k} [{cname}]", got, float(want), tol=1e-6)

    # ---- MRR vs ogbl-citation2 evaluator (per-positive negatives) ----
    ev2 = Evaluator(name="ogbl-citation2")
    for cname, (p, kneg) in {
        "random": (1000, 100), "small": (17, 9),
    }.items():
        pos = rng.normal(size=p).astype(np.float32)
        neg = rng.normal(size=(p, kneg)).astype(np.float32)
        want = float(
            ev2.eval({"y_pred_pos": pos, "y_pred_neg": neg})["mrr_list"]
            .mean()
        )
        got = float(np.mean(1.0 / np.asarray(
            metrics.mrr_ranks(jnp.asarray(pos), jnp.asarray(neg))
        )))
        check(f"MRR [{cname}]", got, want, tol=1e-6)

    # tie-heavy MRR
    pos = rng.integers(0, 3, 500).astype(np.float32)
    neg = rng.integers(0, 3, (500, 50)).astype(np.float32)
    want = float(
        ev2.eval({"y_pred_pos": pos, "y_pred_neg": neg})["mrr_list"].mean()
    )
    got = float(np.mean(1.0 / np.asarray(
        metrics.mrr_ranks(jnp.asarray(pos), jnp.asarray(neg))
    )))
    check("MRR [heavy-ties]", got, want, tol=1e-6)

    if failures:
        print(f"\n{failures} PARITY CHECK(S) FAILED")
        sys.exit(1)
    print("\nALL PARITY CHECKS PASSED")


if __name__ == "__main__":
    main()
