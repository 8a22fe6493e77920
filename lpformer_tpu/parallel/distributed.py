"""Multi-host runtime: process bring-up for meshes that span hosts.

The reference is strictly single-process / single-device (SURVEY §2.4 —
no torch.distributed, no NCCL/MPI anywhere); this layer is new. The
design keeps multi-host a pure *bring-up* concern: after
:func:`initialize` connects the processes, ``jax.devices()`` returns the
GLOBAL device list and everything downstream already speaks global
arrays, so no other module changes behavior:

  * ``make_mesh`` lays the (data, graph) mesh over the global devices
    unchanged (parallel/mesh.py);
  * ``place_sharded_graph`` device_puts full host arrays against
    NamedShardings — in a multiprocess runtime each process transfers
    only its addressable shards (partition.py:219-247);
  * per-batch src/tgt inputs are identical host arrays on every process
    (the batch permutation is seeded, trainer.py), which is exactly the
    replicated-input contract jit requires;
  * losses / eval scores come out of shard_map with replicated
    out_specs, so every process may fetch them (sharded_step.py).

What DOES need gating is host-side side effects — checkpoint writes and
log prints — which :func:`is_coordinator` scopes to process 0.

Launch recipe (one command per host; see docs/MULTIHOST.md):

  host0$ python -m lpformer_tpu.cli.run --mesh 2,4 \
             --coordinator host0:8476 --num-processes 2 --process-id 0 ...
  host1$ python -m lpformer_tpu.cli.run --mesh 2,4 \
             --coordinator host0:8476 --num-processes 2 --process-id 1 ...

On Cloud TPU pods, ``--distributed auto`` uses JAX's own cluster
auto-detection (``jax.distributed.initialize()`` with no arguments).
Environment-variable equivalents (for launchers that template env, not
argv): LPFORMER_COORDINATOR, LPFORMER_NUM_PROCESSES, LPFORMER_PROCESS_ID.
"""
from __future__ import annotations

import os
from typing import Optional

_INITIALIZED = False


def initialize(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    auto: bool = False,
) -> bool:
    """Connect this process to the multi-host runtime.

    Must run before any other jax API touches the backend (backends are
    created lazily on first use; initializing afterwards is an error in
    jax). Returns True if distributed mode was initialized, False if the
    call was a no-op single-process run (no flags, no env).

    ``auto=True`` delegates entirely to JAX's cluster auto-detection
    (Cloud TPU pod metadata, SLURM, etc.).
    """
    global _INITIALIZED
    if _INITIALIZED:
        return True
    coordinator = coordinator or os.environ.get("LPFORMER_COORDINATOR")
    if num_processes is None and "LPFORMER_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["LPFORMER_NUM_PROCESSES"])
    if process_id is None and "LPFORMER_PROCESS_ID" in os.environ:
        process_id = int(os.environ["LPFORMER_PROCESS_ID"])

    import jax

    if auto:
        jax.distributed.initialize()
        _INITIALIZED = True
        return True
    if coordinator is None and num_processes is None and process_id is None:
        return False
    if coordinator is None or num_processes is None or process_id is None:
        raise ValueError(
            "multi-host bring-up needs all three of --coordinator, "
            "--num-processes, --process-id (or '--distributed auto' on "
            f"a Cloud TPU pod); got coordinator={coordinator!r}, "
            f"num_processes={num_processes!r}, process_id={process_id!r}"
        )
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    _INITIALIZED = True
    return True


def is_coordinator() -> bool:
    """True on the process that owns host-side side effects (checkpoint
    writes, log prints). Safe to call in single-process runs."""
    import jax

    return jax.process_index() == 0


def process_count() -> int:
    import jax

    return jax.process_count()
