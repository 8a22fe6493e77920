"""Fused flat-vector optimizer: must match the reference-shaped optax
chain (partitioned clip -> torch-Adam -> LambdaLR schedule) to float
tolerance over a multi-step trajectory, including the clip partition
boundary and the epoch-decay schedule."""
import jax
import jax.numpy as jnp
import numpy as np

from lpformer_tpu.train.optim import make_optimizer


def _params(key):
    k = jax.random.split(key, 6)
    return {
        "gcn": {"w": jax.random.normal(k[0], (8, 8)),
                "b": jax.random.normal(k[1], (8,))},
        "att_layers": [{"w": jax.random.normal(k[2], (8, 4))}],
        "score": {"lin": {"w": jax.random.normal(k[3], (4, 1)) * 3,
                          "b": jax.random.normal(k[4], (1,))}},
    }


def _run(opt, params, grads_seq):
    state = opt.init(params)
    out = []
    for g in grads_seq:
        upd, state = opt.update(g, state, params)
        params = jax.tree_util.tree_map(jnp.add, params, upd)
        out.append(params)
    return out


def test_fused_matches_chain():
    key = jax.random.PRNGKey(0)
    params = _params(key)
    # gradient sequence with one step far above the clip norm
    grads_seq = []
    for i in range(7):
        k = jax.random.fold_in(key, 100 + i)
        scale = 50.0 if i == 2 else 0.5
        grads_seq.append(jax.tree_util.tree_map(
            lambda x: jax.random.normal(
                jax.random.fold_in(k, x.size), x.shape) * scale,
            params,
        ))

    for wd in (0.0, 1e-4):
        ref = make_optimizer(1e-2, wd, decay=0.9, steps_per_epoch=2,
                             fused=False)
        fus = make_optimizer(1e-2, wd, decay=0.9, steps_per_epoch=2,
                             fused=True)
        traj_ref = _run(ref, params, grads_seq)
        traj_fus = _run(fus, params, grads_seq)
        for pr, pf in zip(traj_ref, traj_fus):
            for a, b in zip(jax.tree_util.tree_leaves(pr),
                            jax.tree_util.tree_leaves(pf)):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-7
                )


def test_fused_no_clip():
    key = jax.random.PRNGKey(1)
    params = _params(key)
    g = jax.tree_util.tree_map(lambda x: jnp.ones_like(x) * 0.1, params)
    ref = make_optimizer(1e-3, clip_norm=None, fused=False)
    fus = make_optimizer(1e-3, clip_norm=None, fused=True)
    (pr,), (pf,) = _run(ref, params, [g]), _run(fus, params, [g])
    for a, b in zip(jax.tree_util.tree_leaves(pr),
                    jax.tree_util.tree_leaves(pf)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
