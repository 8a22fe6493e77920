"""Child process for the multi-host regression test.

Usage: python multihost_child.py <process_id> <num_processes> <port>

Each process contributes 2 virtual CPU devices; the (data=2, graph=2)
mesh spans both processes, so every collective in the sharded step
(all_gather / psum_scatter row exchange, psum'd loss and grads) crosses
a real process boundary via the gloo backend. Prints the two step
losses; the parent compares them across processes and against a
single-process run of the identical step.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=2"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

from lpformer_tpu.parallel import distributed as dist  # noqa: E402

assert dist.initialize(
    coordinator=f"localhost:{port}", num_processes=nproc, process_id=pid
)
assert jax.process_count() == nproc
assert dist.is_coordinator() == (pid == 0)

import jax.numpy as jnp  # noqa: E402

from lpformer_tpu.data.synthetic import synthetic_dataset  # noqa: E402
from lpformer_tpu.models import LPFormerConfig, init_lpformer  # noqa: E402
from lpformer_tpu.parallel import (  # noqa: E402
    make_mesh,
    make_sharded_train_step,
    partition_graph,
    place_sharded_graph,
)
from lpformer_tpu.train import make_optimizer  # noqa: E402
from lpformer_tpu.train.step import TrainState  # noqa: E402

# identical on every process: the dataset build and batch are seeded
ds = synthetic_dataset(
    seed=0, num_nodes=96, num_train=320, num_eval=32, feat_dim=12
)
cfg = LPFormerConfig(
    dim=16, gnn_layers=2, budget_cn=24, budget_onehop=48,
    budget_non1hop=48, dropout=0.0, gnn_drop=0.0, att_drop=0.0,
    feat_drop=0.0, pred_drop=0.0,
)
params = init_lpformer(jax.random.PRNGKey(3), cfg, in_dim=12)

devs = jax.devices()
assert len(devs) == 2 * nproc, f"expected {2 * nproc} global devices"
mesh = make_mesh(data=2, graph=len(devs) // 2, devices=devs)
sg = place_sharded_graph(
    partition_graph(ds.graph, g=mesh.shape["graph"], d=2), mesh
)
opt = make_optimizer(1e-3, steps_per_epoch=10)
step = make_sharded_train_step(
    cfg, opt, mesh, ds.num_nodes, sg.rows_per_shard, sg.ctx_rows_per_shard
)
state = TrainState(params, opt.init(params), jnp.asarray(0, jnp.int32))

batch = 32
src = jnp.asarray(ds.train_pos[:batch, 0])
tgt = jnp.asarray(ds.train_pos[:batch, 1])
w = jnp.ones((batch,), jnp.float32)
rng = jax.random.PRNGKey(7)
mult = ds.mask_mult_device

state, loss1 = step(state, sg, mult, src, tgt, w, rng)
state, loss2 = step(state, sg, mult, src, tgt, w, rng)
print(f"MULTIHOST_LOSS {pid} {float(loss1):.10f} {float(loss2):.10f}",
      flush=True)
