"""Process-wide seeding.

Mirrors the reference's ``init_seed`` (reference: src/util/utils.py:11-17),
which seeds python ``random``, numpy, and torch (with cudnn determinism
flags). JAX model randomness is carried explicitly by PRNG keys, so this
only needs to pin the *host-side* generators that shape data order:
python ``random``, numpy's legacy global RNG, and — when torch is present
(it is an optional test dependency here, never a runtime one) — torch's
CPU generator, for reproducibility of any torch-based comparison code.
"""
from __future__ import annotations

import random

import numpy as np


def init_seed(seed: int) -> None:
    random.seed(seed)
    np.random.seed(seed)
    try:  # torch is optional; only parity tests use it
        import torch

        torch.manual_seed(seed)
        torch.use_deterministic_algorithms(True, warn_only=True)
    except ImportError:
        pass
