"""Gradient accumulation: same update as the monolithic step.

With all dropout off, the accumulated step must reproduce the monolithic
step's loss and parameter update to float tolerance — negatives are
drawn from the full batch BEFORE the micro split, and every micro-batch
normalizes by the full batch's weight sums, so a padded ragged tail
(zero-weight entries) is weighted identically in both paths.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lpformer_tpu.data.synthetic import synthetic_dataset
from lpformer_tpu.models import LPFormerConfig, init_lpformer
from lpformer_tpu.train import make_optimizer
from lpformer_tpu.train.step import TrainState, make_train_step


def _setup():
    ds = synthetic_dataset(
        seed=0, num_nodes=100, num_train=320, num_eval=24, feat_dim=8
    )
    cfg = LPFormerConfig(
        dim=16, gnn_layers=1, budget_cn=16, budget_onehop=32,
        budget_non1hop=32, dropout=0.0, gnn_drop=0.0, att_drop=0.0,
        feat_drop=0.0, pred_drop=0.0,
    )
    params = init_lpformer(jax.random.PRNGKey(0), cfg, in_dim=8)
    opt = make_optimizer(1e-2, steps_per_epoch=1)
    return ds, cfg, params, opt


@pytest.mark.parametrize("live", [64, 40])  # full batch / padded ragged tail
def test_grad_accum_matches_monolithic(live):
    ds, cfg, params, opt = _setup()
    B = 64
    src = jnp.asarray(ds.train_pos[:B, 0])
    tgt = jnp.asarray(ds.train_pos[:B, 1])
    w = jnp.asarray((np.arange(B) < live).astype(np.float32))
    bw = (ds.graph.edge_w > 0).astype(jnp.float32)
    rng = jax.random.PRNGKey(3)

    def run(ga):
        state = TrainState(params, opt.init(params), jnp.asarray(0, jnp.int32))
        step = make_train_step(cfg, opt, grad_accum=ga, donate=False)
        st, loss = step(state, ds.graph, ds.mask_mult_device, bw, src, tgt, w, rng)
        return st, float(loss)

    st1, l1 = run(1)
    st4, l4 = run(4)
    assert np.isfinite(l1) and np.isfinite(l4)
    # loss and the updated params match the monolithic step (dropout off:
    # the only divergence is float reassociation across micro-batches)
    assert abs(l1 - l4) < 1e-5, (l1, l4)
    for a, b in zip(
        jax.tree_util.tree_leaves(st1.params),
        jax.tree_util.tree_leaves(st4.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        )
    # re-running the accumulated step is deterministic
    st4b, l4b = run(4)
    assert l4 == l4b
    for a, b in zip(
        jax.tree_util.tree_leaves(st4.params),
        jax.tree_util.tree_leaves(st4b.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
