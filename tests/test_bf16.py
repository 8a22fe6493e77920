"""bfloat16 matmul mode: runs end-to-end and stays close to float32."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from lpformer_tpu.data.synthetic import synthetic_dataset
from lpformer_tpu.models import LPFormerConfig, forward, init_lpformer, score_links


def test_bf16_close_to_f32():
    ds = synthetic_dataset(
        seed=0, num_nodes=90, num_train=300, num_eval=24, feat_dim=10
    )
    cfg = LPFormerConfig(
        dim=32, gnn_layers=2, budget_cn=32, budget_onehop=64,
        budget_non1hop=64,
    )
    cfg16 = dataclasses.replace(cfg, matmul_dtype="bfloat16")
    params = init_lpformer(jax.random.PRNGKey(0), cfg, in_dim=10)
    src = jnp.asarray(ds.valid_pos[:16, 0])
    tgt = jnp.asarray(ds.valid_pos[:16, 1])
    h32 = forward(params, cfg, ds.graph, src, tgt, train=False)
    h16 = forward(params, cfg16, ds.graph, src, tgt, train=False)
    s32 = np.asarray(score_links(params, cfg, h32))
    s16 = np.asarray(score_links(params, cfg16, h16))
    assert np.isfinite(np.asarray(h16)).all()
    # scores are probabilities; bf16 rounding through LN+attention stays
    # within a small absolute band
    assert np.abs(s32 - s16).max() < 0.05, np.abs(s32 - s16).max()


def test_bf16_key_table_grads_flow():
    """matmul_dtype=bfloat16 makes the key table bf16; grads must still
    flow (f32-accumulated scatter in gather_rows' VJP, cast once)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from lpformer_tpu.data.synthetic import synthetic_dataset
    from lpformer_tpu.models import (
        LPFormerConfig, forward, init_lpformer, score_links,
    )

    ds = synthetic_dataset(
        seed=0, num_nodes=100, num_train=300, num_eval=20, feat_dim=8
    )
    cfg = LPFormerConfig(
        dim=16, gnn_layers=1, budget_cn=8, budget_onehop=16,
        budget_non1hop=16, matmul_dtype="bfloat16",
    )
    params = init_lpformer(jax.random.PRNGKey(0), cfg, in_dim=8)
    src = jnp.asarray(ds.train_pos[:8, 0])
    tgt = jnp.asarray(ds.train_pos[:8, 1])

    def loss(p):
        h = forward(p, cfg, ds.graph, src, tgt, train=False)
        return -jnp.sum(jnp.log(score_links(p, cfg, h) + 1e-6))

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(bool(jnp.all(jnp.isfinite(x))) for x in leaves)
    # the attention/key-path params must receive nonzero gradient
    att_g = jax.tree_util.tree_leaves(g["att_layers"])
    assert any(float(jnp.abs(x).max()) > 0 for x in att_g)
    ppr_g = jax.tree_util.tree_leaves(g["ppr_encoder_cn"])
    assert any(float(jnp.abs(x).max()) > 0 for x in ppr_g)
