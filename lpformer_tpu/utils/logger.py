"""Run-results logger with reference semantics.

Mirrors reference Logger (reference: src/util/utils.py:80-152): per-seed
lists of (train, valid, test) tuples per eval, best-epoch selection by
valid, test-at-best-valid reporting, mean +- std over seeds (x100).
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np


class ResultsLogger:
    def __init__(self, runs: int, info: Optional[str] = None):
        self.info = info
        self.results: List[List[Tuple[float, float, float]]] = [
            [] for _ in range(runs)
        ]

    def add_result(self, run: int, result: Tuple[float, float, float]):
        assert len(result) == 3
        assert 0 <= run < len(self.results)
        self.results[run].append(tuple(float(x) for x in result))

    def best_valid(self, run: int) -> float:
        r = np.asarray(self.results[run])
        return float(r[:, 1].max()) if len(r) else 0.0

    def get_best_epochs(self, eval_steps: int) -> List[int]:
        out = []
        for r in self.results:
            r = np.asarray(r)
            out.append(int(eval_steps * (r[:, 1].argmax() + 1)))
        return out

    def print_statistics(self, run=None, verbose=True):
        """Returns (mean_list, var_list) for (train@best, best_valid,
        test@best) x100, exactly like the reference (:103-152).
        ``verbose=False`` computes without printing (multi-host
        non-coordinator processes)."""
        import builtins
        print = builtins.print if verbose else (lambda *a, **k: None)
        if run is not None:
            result = 100 * np.asarray(self.results[run])
            argmax = int(result[:, 1].argmax())
            print(f"Run {run + 1:02d}:")
            print(f"Highest Train: {result[:, 0].max():.2f}")
            print(f"Highest Valid: {result[:, 1].max():.2f}")
            print(f"  Final Train: {result[argmax, 0]:.2f}")
            print(f"   Final Test: {result[argmax, 2]:.2f}")
            return None
        best_results = []
        for r in self.results:
            if not r:
                continue
            r = 100 * np.asarray(r)
            train1 = r[:, 0].max()
            valid = r[:, 1].max()
            train2 = r[r[:, 1].argmax(), 0]
            test = r[r[:, 1].argmax(), 2]
            best_results.append((train1, valid, train2, test))
        if not best_results:
            # no eval ever ran (epochs < eval_steps)
            print("No eval results recorded.")
            return [0.0, 0.0, 0.0], [0.0, 0.0, 0.0]
        best = np.asarray(best_results)
        # ddof=1 to match torch.std default (the reference uses torch)
        std = lambda a: float(np.std(a, ddof=1)) if len(a) > 1 else 0.0  # noqa
        print(f"Highest Valid: {best[:, 1].mean():.2f} ± {std(best[:, 1]):.2f}")
        print(f"   Final Test: {best[:, 3].mean():.2f} ± {std(best[:, 3]):.2f}")
        mean_list = [
            round(float(best[:, 0].mean()), 2),
            round(float(best[:, 1].mean()), 2),
            round(float(best[:, 3].mean()), 2),
        ]
        var_list = [
            round(std(best[:, 0]), 2),
            round(std(best[:, 1]), 2),
            round(std(best[:, 3]), 2),
        ]
        return mean_list, var_list
