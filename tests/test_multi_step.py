"""Multi-step device loop (steps_per_call > 1): the lax.scan loop must
reproduce K sequential single steps bit-for-bit, and dead (live=0)
padded steps must leave the state untouched."""
import jax
import jax.numpy as jnp
import numpy as np

from lpformer_tpu.data.synthetic import synthetic_dataset
from lpformer_tpu.models import LPFormerConfig, init_lpformer
from lpformer_tpu.train import make_optimizer
from lpformer_tpu.train.step import TrainState, make_train_step
from lpformer_tpu.train.trainer import _iter_step_groups


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
    state = TrainState(params, opt.init(params), jnp.asarray(0, jnp.int32))
    bw = (ds.graph.edge_w > 0).astype(jnp.float32)
    return ds, cfg, opt, state, bw


def _tree_equal(a, b, exact=True):
    for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)):
        if exact:
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
        else:
            np.testing.assert_allclose(
                np.asarray(x, np.float64), np.asarray(y, np.float64),
                rtol=1e-5, atol=1e-7,
            )


def test_multi_step_matches_sequential():
    ds, cfg, opt, state0, bw = _setup()
    rng = jax.random.PRNGKey(3)
    k, b = 4, 32
    srcs = jnp.asarray(ds.train_pos[: k * b, 0]).reshape(k, b)
    tgts = jnp.asarray(ds.train_pos[: k * b, 1]).reshape(k, b)
    ws = jnp.ones((k, b), jnp.float32)
    live = jnp.ones((k,), jnp.float32)

    single = make_train_step(cfg, opt, donate=False)
    st_seq = state0
    seq_losses = []
    for i in range(k):
        st_seq, loss = single(
            st_seq, ds.graph, ds.mask_mult_device, bw,
            srcs[i], tgts[i], ws[i], rng,
        )
        seq_losses.append(float(loss))

    multi = make_train_step(cfg, opt, steps_per_call=k, donate=False)
    st_multi, losses = multi(
        state0, ds.graph, ds.mask_mult_device, bw, srcs, tgts, ws, live, rng
    )
    # same math per step (rng folds on state.step); the scan body
    # compiles with different fusions than the standalone jit, so allow
    # float-rounding-level differences only
    np.testing.assert_allclose(
        np.asarray(losses), np.asarray(seq_losses), rtol=1e-5
    )
    _tree_equal(st_multi.params, st_seq.params, exact=False)
    _tree_equal(st_multi.opt_state, st_seq.opt_state, exact=False)
    assert int(st_multi.step) == k


def test_dead_steps_leave_state_untouched():
    ds, cfg, opt, state0, bw = _setup()
    rng = jax.random.PRNGKey(3)
    k, b = 4, 32
    srcs = jnp.asarray(ds.train_pos[: k * b, 0]).reshape(k, b)
    tgts = jnp.asarray(ds.train_pos[: k * b, 1]).reshape(k, b)
    ws = jnp.ones((k, b), jnp.float32)

    multi = make_train_step(cfg, opt, steps_per_call=k, donate=False)
    # only the first 2 steps live; the dead tail carries garbage batches
    live = jnp.asarray([1.0, 1.0, 0.0, 0.0])
    ws_dead = ws.at[2:].set(0.0)
    st_a, losses_a = multi(
        state0, ds.graph, ds.mask_mult_device, bw, srcs, tgts, ws_dead,
        live, rng,
    )

    live2 = jnp.ones((2,), jnp.float32)
    multi2 = make_train_step(cfg, opt, steps_per_call=2, donate=False)
    st_b, losses_b = multi2(
        state0, ds.graph, ds.mask_mult_device, bw, srcs[:2], tgts[:2],
        ws[:2], live2, rng,
    )
    _tree_equal(st_a.params, st_b.params)
    _tree_equal(st_a.opt_state, st_b.opt_state)
    assert int(st_a.step) == 2  # dead steps don't advance the counter
    np.testing.assert_array_equal(np.asarray(losses_a[:2]),
                                  np.asarray(losses_b))
    np.testing.assert_array_equal(np.asarray(losses_a[2:]),
                                  np.zeros(2, np.float32))


def test_iter_step_groups_padding():
    rng = np.random.default_rng(0)
    train_pos = rng.integers(0, 50, size=(70, 2))
    groups = list(_iter_step_groups(rng, train_pos, batch_size=16, k=3))
    # 70 links -> 5 batches of 16 (last padded) -> groups of 3: [3, 2+pad]
    assert len(groups) == 2
    srcs, tgts, ws, live = groups[1]
    assert srcs.shape == (3, 16) and live.tolist() == [1.0, 1.0, 0.0]
    assert ws[1].sum() == 70 - 64  # ragged last real batch
    assert ws[2].sum() == 0.0
    total = sum(g[2].sum() for g in groups)
    assert total == 70
