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


def _xla_reference(keys, q, valid, w_r, r_bias, att, bias):
    b, c, dk = keys.shape
    h = att.shape[0]
    ho = w_r.shape[1]
    xj = (keys @ w_r + r_bias).reshape(b, c, h, ho // h)
    qq = q.reshape(b, 1, h, ho // h)
    z = jax.nn.leaky_relu(xj * qq, negative_slope=0.2)
    logits = jnp.sum(z * att[None, None], axis=-1)
    masked = jnp.where(valid[:, :, None], logits, -1e30)
    m = jnp.maximum(jnp.max(masked, axis=1, keepdims=True), -5e29)
    e = jnp.exp(masked - m) * valid[:, :, None]
    alpha = e / jnp.maximum(e.sum(axis=1, keepdims=True), 1e-16)
    return jnp.sum(alpha[..., None] * xj, axis=1).reshape(b, ho) + bias


def test_kernel_backward_matches_xla_grad():
    """custom-VJP (flash-style C-streamed backward) vs jax.grad of the
    dense composition, incl. a row with zero valid entries."""
    rng = np.random.default_rng(1)
    b, c, dk, ho, h = 16, 40, 12, 8, 1
    keys = jnp.asarray(rng.standard_normal((b, c, dk)).astype(np.float32))
    q = jnp.asarray(rng.standard_normal((b, ho)).astype(np.float32))
    valid_np = rng.random((b, c)) > 0.3
    valid_np[3, :] = False  # empty context row
    valid = jnp.asarray(valid_np)
    w_r = jnp.asarray(rng.standard_normal((dk, ho)).astype(np.float32) / 4)
    r_bias = jnp.asarray(rng.standard_normal(ho).astype(np.float32) / 10)
    att = jnp.asarray(rng.standard_normal((h, ho // h)).astype(np.float32) / 4)
    bias = jnp.asarray(rng.standard_normal(ho).astype(np.float32) / 10)
    tang = jnp.asarray(rng.standard_normal((b, ho)).astype(np.float32))

    def loss_pallas(keys, q, w_r, r_bias, att, bias):
        out = fused_link_attention(
            keys, q, valid, w_r, r_bias, att, bias, heads=h, interpret=True
        )
        return jnp.sum(out * tang)

    def loss_ref(keys, q, w_r, r_bias, att, bias):
        return jnp.sum(_xla_reference(keys, q, valid, w_r, r_bias, att, bias)
                       * tang)

    got = jax.grad(loss_pallas, argnums=(0, 1, 2, 3, 4, 5))(
        keys, q, w_r, r_bias, att, bias
    )
    want = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4, 5))(
        keys, q, w_r, r_bias, att, bias
    )
    names = ["dkeys", "dq", "dw_r", "dr_bias", "datt", "dbias"]
    for n, g, w in zip(names, got, want):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=5e-4, atol=5e-5, err_msg=n
        )


def test_kernel_backward_c_padding():
    """C not a multiple of the tile: grads on the real entries unaffected
    by the pad tail."""
    rng = np.random.default_rng(2)
    b, c, dk, ho = 8, 130, 8, 8  # c pads to 256
    keys = jnp.asarray(rng.standard_normal((b, c, dk)).astype(np.float32))
    q = jnp.asarray(rng.standard_normal((b, ho)).astype(np.float32))
    valid = jnp.asarray(rng.random((b, c)) > 0.5)
    w_r = jnp.asarray(rng.standard_normal((dk, ho)).astype(np.float32) / 4)
    r_bias = jnp.zeros(ho, jnp.float32)
    att = jnp.asarray(rng.standard_normal((1, ho)).astype(np.float32) / 4)
    bias = jnp.zeros(ho, jnp.float32)

    def loss_pallas(keys):
        return jnp.sum(fused_link_attention(
            keys, q, valid, w_r, r_bias, att, bias, heads=1, interpret=True
        ) ** 2)

    def loss_ref(keys):
        return jnp.sum(
            _xla_reference(keys, q, valid, w_r, r_bias, att, bias) ** 2
        )

    np.testing.assert_allclose(
        np.asarray(jax.grad(loss_pallas)(keys)),
        np.asarray(jax.grad(loss_ref)(keys)),
        rtol=5e-4, atol=5e-5,
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


def test_model_grads_with_pallas_flag():
    """End-to-end model gradients: pallas train path vs XLA composition."""
    ds = synthetic_dataset(
        seed=3, num_nodes=90, num_train=300, num_eval=24, feat_dim=10
    )
    cfg = LPFormerConfig(
        dim=16, gnn_layers=1, budget_cn=16, budget_onehop=32,
        budget_non1hop=32, remat_pairwise=False,
    )
    cfg_p = dataclasses.replace(cfg, use_pallas_attention=True)
    params = init_lpformer(jax.random.PRNGKey(0), cfg, in_dim=10)
    src = jnp.asarray(ds.valid_pos[:16, 0])
    tgt = jnp.asarray(ds.valid_pos[:16, 1])

    def loss(params, cfg):
        h = forward(params, cfg, ds.graph, src, tgt, train=False)
        return jnp.sum(h ** 2)

    g_ref = jax.grad(loss)(params, cfg)
    g_pal = jax.grad(loss)(params, cfg_p)
    flat_ref, _ = jax.tree_util.tree_flatten(g_ref)
    flat_pal, _ = jax.tree_util.tree_flatten(g_pal)
    for a, b in zip(flat_ref, flat_pal):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-4
        )


def test_kernel_bf16_keys_close_to_f32():
    """bf16 key tables ride the kernel end-to-end (the wrapper no longer
    upcasts); outputs and grads must track the f32 path within bf16
    tolerance."""
    rng = np.random.default_rng(7)
    b, c, dk, ho = 16, 24, 32, 16
    keys = jnp.asarray(rng.standard_normal((b, c, dk)).astype(np.float32))
    q = jnp.asarray(rng.standard_normal((b, ho)).astype(np.float32))
    valid = jnp.asarray(rng.random((b, c)) > 0.3)
    w_r = jnp.asarray(rng.standard_normal((dk, ho)).astype(np.float32) / 4)
    r_bias = jnp.asarray(rng.standard_normal(ho).astype(np.float32) / 10)
    att = jnp.asarray(rng.standard_normal((1, ho)).astype(np.float32) / 4)
    bias = jnp.asarray(rng.standard_normal(ho).astype(np.float32) / 10)

    def loss(keys, w_r, cast):
        k = keys.astype(jnp.bfloat16) if cast else keys
        out = fused_link_attention(
            k, q, valid, w_r, r_bias, att, bias, heads=1, interpret=True)
        return jnp.sum(out * jnp.cos(jnp.arange(out.size).reshape(out.shape)))

    v32, g32 = jax.value_and_grad(loss, argnums=(0, 1))(keys, w_r, False)
    v16, g16 = jax.value_and_grad(loss, argnums=(0, 1))(keys, w_r, True)
    assert g16[0].dtype == jnp.float32  # cast VJP restores param dtype
    np.testing.assert_allclose(float(v16), float(v32), rtol=3e-2)
    for a, b_ in zip(g16, g32):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b_, np.float32),
                                   rtol=1e-1, atol=5e-2)
