"""Multi-host runtime regression: the sharded train step across 2 REAL
processes (jax.distributed + gloo CPU collectives) must match the same
step run single-process.

The reference has no distributed anything (SURVEY §2.4); this certifies
the one SURVEY plan line that can't be tested on a virtual in-process
mesh: process bring-up (parallel/distributed.py), cross-process
device_put of the sharded graph, replicated host batch inputs, and
cross-process psum/all_gather/psum_scatter in the step itself.
"""
import os
import re
import socket
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CHILD = os.path.join(REPO, "tests", "multihost_child.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _single_process_losses():
    """The identical two steps on a (2,2) mesh inside this process."""
    from lpformer_tpu.data.synthetic import synthetic_dataset
    from lpformer_tpu.models import LPFormerConfig, init_lpformer
    from lpformer_tpu.parallel import (
        make_mesh, make_sharded_train_step, partition_graph,
        place_sharded_graph,
    )
    from lpformer_tpu.train import make_optimizer
    from lpformer_tpu.train.step import TrainState

    ds = synthetic_dataset(
        seed=0, num_nodes=96, num_train=320, num_eval=32, feat_dim=12
    )
    cfg = LPFormerConfig(
        dim=16, gnn_layers=2, budget_cn=24, budget_onehop=48,
        budget_non1hop=48, dropout=0.0, gnn_drop=0.0, att_drop=0.0,
        feat_drop=0.0, pred_drop=0.0,
    )
    params = init_lpformer(jax.random.PRNGKey(3), cfg, in_dim=12)
    mesh = make_mesh(data=2, graph=2, devices=jax.devices()[:4])
    sg = place_sharded_graph(partition_graph(ds.graph, g=2, d=2), mesh)
    opt = make_optimizer(1e-3, steps_per_epoch=10)
    step = make_sharded_train_step(
        cfg, opt, mesh, ds.num_nodes, sg.rows_per_shard,
        sg.ctx_rows_per_shard,
    )
    state = TrainState(params, opt.init(params), jnp.asarray(0, jnp.int32))
    batch = 32
    src = jnp.asarray(ds.train_pos[:batch, 0])
    tgt = jnp.asarray(ds.train_pos[:batch, 1])
    w = jnp.ones((batch,), jnp.float32)
    rng = jax.random.PRNGKey(7)
    state, l1 = step(state, sg, ds.mask_mult_device, src, tgt, w, rng)
    state, l2 = step(state, sg, ds.mask_mult_device, src, tgt, w, rng)
    return float(l1), float(l2)


def test_two_process_step_matches_single_process():
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # children set their own JAX_PLATFORMS / XLA_FLAGS (2 devices each)
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, CHILD, str(i), "2", str(port)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"child {i} failed:\n{out[-3000:]}"
    losses = {}
    for out in outs:
        m = re.search(
            r"MULTIHOST_LOSS (\d+) ([\d.eE+-]+) ([\d.eE+-]+)", out
        )
        assert m, f"no loss line in child output:\n{out[-3000:]}"
        losses[int(m.group(1))] = (float(m.group(2)), float(m.group(3)))
    assert set(losses) == {0, 1}
    # replicated outputs: both processes fetched identical losses
    assert losses[0] == losses[1]

    # and the 2-process mesh computes the same math as one process
    ref = _single_process_losses()
    np.testing.assert_allclose(losses[0], ref, rtol=2e-5, atol=1e-6)


def test_partial_distributed_flags_error():
    """Incomplete coordinator flags must fail loudly before any backend
    work, naming the missing pieces."""
    import pytest

    from lpformer_tpu.parallel import distributed as dist

    with pytest.raises(ValueError, match="all three"):
        dist.initialize(coordinator="localhost:9999")


def test_no_flags_is_noop_single_process():
    from lpformer_tpu.parallel import distributed as dist

    assert dist.initialize() is False
    assert dist.is_coordinator()
    assert dist.process_count() == 1
