"""Pallas fused attention vs the XLA composition (interpret mode on CPU)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from lpformer_tpu.data.synthetic import synthetic_dataset
from lpformer_tpu.models import LPFormerConfig, forward, init_lpformer
from lpformer_tpu.ops.pallas import fused_link_attention


def test_kernel_matches_xla_composition():
    rng = np.random.default_rng(0)
    b, c, dk, ho, h = 32, 24, 16, 8, 1
    keys = jnp.asarray(rng.standard_normal((b, c, dk)).astype(np.float32))
    q = jnp.asarray(rng.standard_normal((b, ho)).astype(np.float32))
    valid = jnp.asarray(rng.random((b, c)) > 0.3)
    w_r = jnp.asarray(rng.standard_normal((dk, ho)).astype(np.float32) / 4)
    r_bias = jnp.asarray(rng.standard_normal(ho).astype(np.float32) / 10)
    att = jnp.asarray(rng.standard_normal((h, ho // h)).astype(np.float32) / 4)
    bias = jnp.asarray(rng.standard_normal(ho).astype(np.float32) / 10)

    got = fused_link_attention(
        keys, q, valid, w_r, r_bias, att, bias, heads=h, interpret=True
    )

    # XLA reference composition
    xj = (keys @ w_r + r_bias).reshape(b, c, h, ho // h)
    qq = q.reshape(b, 1, h, ho // h)
    z = jax.nn.leaky_relu(xj * qq, negative_slope=0.2)
    logits = jnp.sum(z * att[None, None], axis=-1)
    masked = jnp.where(valid[:, :, None], logits, -1e30)
    m = jnp.maximum(jnp.max(masked, axis=1, keepdims=True), -5e29)
    e = jnp.exp(masked - m) * valid[:, :, None]
    alpha = e / jnp.maximum(e.sum(axis=1, keepdims=True), 1e-16)
    want = jnp.sum(alpha[..., None] * xj, axis=1).reshape(b, ho) + bias

    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-6
    )


def test_model_forward_with_pallas_flag():
    ds = synthetic_dataset(
        seed=0, num_nodes=90, num_train=300, num_eval=24, feat_dim=10
    )
    cfg = LPFormerConfig(
        dim=16, gnn_layers=1, budget_cn=16, budget_onehop=32,
        budget_non1hop=32,
    )
    cfg_p = dataclasses.replace(cfg, use_pallas_attention=True)
    params = init_lpformer(jax.random.PRNGKey(0), cfg, in_dim=10)
    src = jnp.asarray(ds.valid_pos[:16, 0])
    tgt = jnp.asarray(ds.valid_pos[:16, 1])
    h_ref = forward(params, cfg, ds.graph, src, tgt, train=False)
    h_pal = forward(params, cfg_p, ds.graph, src, tgt, train=False)
    np.testing.assert_allclose(
        np.asarray(h_ref), np.asarray(h_pal), rtol=1e-4, atol=1e-5
    )
