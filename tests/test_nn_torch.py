"""NN primitive parity vs torch.nn with copied weights.

torch (cpu) is available in the image; PyG / torch_sparse are not. These
tests pin the primitive semantics (LayerNorm eps, dropout scaling, MLP
layer ordering) to the torch modules the reference uses.
"""
import jax
import jax.numpy as jnp
import numpy as np
import torch

from lpformer_tpu.nn import core as nn


def test_linear_matches_torch():
    p = nn.linear_init(jax.random.PRNGKey(0), 8, 5)
    tl = torch.nn.Linear(8, 5)
    with torch.no_grad():
        tl.weight.copy_(torch.from_numpy(np.asarray(p["w"]).T))
        tl.bias.copy_(torch.from_numpy(np.asarray(p["b"])))
    x = np.random.default_rng(0).standard_normal((7, 8)).astype(np.float32)
    got = np.asarray(nn.linear_apply(p, jnp.asarray(x)))
    want = tl(torch.from_numpy(x)).detach().numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_layer_norm_matches_torch():
    p = nn.layer_norm_init(16)
    t = torch.nn.LayerNorm(16)
    x = np.random.default_rng(1).standard_normal((4, 16)).astype(np.float32)
    got = np.asarray(nn.layer_norm_apply(p, jnp.asarray(x)))
    want = t(torch.from_numpy(x)).detach().numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_mlp_matches_torch_reference_arch():
    """2-layer MLP: Linear -> LN -> ReLU -> Linear (reference
    other_models.py:125-138, eval mode)."""
    key = jax.random.PRNGKey(2)
    p = nn.mlp_init(key, 2, 6, 10, 3)
    lin1 = torch.nn.Linear(6, 10)
    ln = torch.nn.LayerNorm(10)
    lin2 = torch.nn.Linear(10, 3)
    with torch.no_grad():
        lin1.weight.copy_(torch.from_numpy(np.asarray(p["layers"][0]["w"]).T))
        lin1.bias.copy_(torch.from_numpy(np.asarray(p["layers"][0]["b"])))
        lin2.weight.copy_(torch.from_numpy(np.asarray(p["layers"][1]["w"]).T))
        lin2.bias.copy_(torch.from_numpy(np.asarray(p["layers"][1]["b"])))
        ln.weight.copy_(torch.from_numpy(np.asarray(p["norm"]["g"])))
        ln.bias.copy_(torch.from_numpy(np.asarray(p["norm"]["b"])))
    x = np.random.default_rng(3).standard_normal((5, 6)).astype(np.float32)
    got = np.asarray(nn.mlp_apply(p, jnp.asarray(x)))
    want = lin2(torch.relu(ln(lin1(torch.from_numpy(x))))).detach().numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_dropout_inverted_scaling():
    rng = jax.random.PRNGKey(0)
    x = jnp.ones((1000, 8))
    y = np.asarray(nn.dropout(rng, x, 0.3, train=True))
    kept = y != 0
    np.testing.assert_allclose(y[kept], 1.0 / 0.7, rtol=1e-6)
    assert abs(kept.mean() - 0.7) < 0.05
    # eval: identity
    np.testing.assert_array_equal(
        np.asarray(nn.dropout(rng, x, 0.3, train=False)), np.asarray(x)
    )


def test_leaky_relu_matches_torch():
    x = np.random.default_rng(4).standard_normal(100).astype(np.float32)
    got = np.asarray(jax.nn.leaky_relu(jnp.asarray(x), negative_slope=0.2))
    want = torch.nn.functional.leaky_relu(
        torch.from_numpy(x), negative_slope=0.2
    ).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-6)
