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
