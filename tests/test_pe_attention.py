"""Fused PE+attention kernel (ops/pallas/pe_attention.py) vs a dense jnp
composition of the same math, interpret mode on CPU."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lpformer_tpu.ops.pallas.pe_attention import (
    fused_pe_link_attention,
    pe_attention_tile,
)


def _dense_reference(xj_node, ps, pt, valid, q, w1, b1, g, b, w2f, cbias,
                     att, bias, col_cls):
    """Per-entry: pe = sym 2-layer LN-relu MLP of (ps, pt) via per-class
    weights, xj = node + pe + cbias, GATv2 score, masked softmax."""
    bsz, c, ho = xj_node.shape

    def mlp(x2, k):
        pre = x2 @ w1[k] + b1[k]
        mu = pre.mean(-1, keepdims=True)
        var = ((pre - mu) ** 2).mean(-1, keepdims=True)
        xh = (pre - mu) * jax.lax.rsqrt(var + 1e-5)
        h = jax.nn.relu(xh * g[k] + b[k])
        return h @ w2f[k]

    pe = jnp.zeros((bsz, c, ho), jnp.float32)
    cb = jnp.zeros((bsz, c, ho), jnp.float32)
    a_in = jnp.stack([ps, pt], -1)
    b_in = jnp.stack([pt, ps], -1)
    for k in range(w1.shape[0]):
        sel = (col_cls == k)[None, :, None]
        pe = jnp.where(sel, mlp(a_in, k) + mlp(b_in, k), pe)
        cb = jnp.where(sel, cbias[k], cb)
    xj = xj_node.astype(jnp.float32) + pe + cb
    z = jax.nn.leaky_relu(xj * q[:, None, :], negative_slope=0.2)
    logits = jnp.sum(z * att.reshape(1, 1, ho), axis=-1)
    masked = jnp.where(valid, logits, -1e30)
    m = jnp.maximum(jnp.max(masked, axis=1, keepdims=True), -5e29)
    e = jnp.exp(masked - m) * valid
    alpha = e / jnp.maximum(e.sum(axis=1, keepdims=True), 1e-16)
    return jnp.sum(alpha[..., None] * xj, axis=1) + bias


def _rand_case(seed, bsz=16, budgets=(16, 32, 32), ho=16, empty_row=None):
    rng = np.random.default_rng(seed)
    ct = pe_attention_tile(budgets, min_tile=8)
    tiles = []
    for k, bgt in enumerate(budgets):
        tiles.extend([k] * (bgt // ct))
    c = sum(budgets)
    col_cls = np.repeat(np.asarray(tiles, np.int32), ct)
    f32 = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32))
    valid_np = rng.random((bsz, c)) > 0.3
    if empty_row is not None:
        valid_np[empty_row] = False
    args = dict(
        xj_node=f32(bsz, c, ho) / 2,
        ps=jnp.abs(f32(bsz, c)) * 0.05,
        pt=jnp.abs(f32(bsz, c)) * 0.05,
        valid=jnp.asarray(valid_np),
        q=f32(bsz, ho),
        w1=f32(len(budgets), 2, ho),
        b1=f32(len(budgets), ho) / 10,
        g=1.0 + f32(len(budgets), ho) / 10,
        b=f32(len(budgets), ho) / 10,
        w2f=f32(len(budgets), ho, ho) / 4,
        cbias=f32(len(budgets), ho) / 10,
        att=f32(1, ho) / 4,
        bias=f32(ho) / 10,
    )
    return args, ct, tuple(tiles), jnp.asarray(col_cls)


def _run_kernel(a, ct, tiles):
    return fused_pe_link_attention(
        a["xj_node"], a["ps"], a["pt"], a["valid"], a["q"],
        a["w1"], a["b1"], a["g"], a["b"], a["w2f"], a["cbias"],
        a["att"], a["bias"],
        c_tile=ct, tile_classes=tiles, interpret=True,
    )


def test_forward_matches_dense():
    a, ct, tiles, col_cls = _rand_case(0, empty_row=3)
    got = _run_kernel(a, ct, tiles)
    want = _dense_reference(
        a["xj_node"], a["ps"], a["pt"], a["valid"], a["q"], a["w1"],
        a["b1"], a["g"], a["b"], a["w2f"], a["cbias"], a["att"], a["bias"],
        col_cls,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-6
    )


def test_forward_single_class():
    a, ct, tiles, col_cls = _rand_case(4, budgets=(48,))
    got = _run_kernel(a, ct, tiles)
    want = _dense_reference(
        a["xj_node"], a["ps"], a["pt"], a["valid"], a["q"], a["w1"],
        a["b1"], a["g"], a["b"], a["w2f"], a["cbias"], a["att"], a["bias"],
        col_cls,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-6
    )


DIFF = ["xj_node", "q", "w1", "b1", "g", "b", "w2f", "cbias", "att", "bias"]


def test_backward_matches_dense_grads():
    a, ct, tiles, col_cls = _rand_case(1, empty_row=5)
    rng = np.random.default_rng(9)
    tang = jnp.asarray(
        rng.standard_normal(( a["q"].shape[0], a["bias"].shape[0]))
        .astype(np.float32))

    def loss_kernel(*diffs):
        aa = dict(a, **dict(zip(DIFF, diffs)))
        return jnp.sum(_run_kernel(aa, ct, tiles) * tang)

    def loss_dense(*diffs):
        aa = dict(a, **dict(zip(DIFF, diffs)))
        return jnp.sum(_dense_reference(
            aa["xj_node"], aa["ps"], aa["pt"], aa["valid"], aa["q"],
            aa["w1"], aa["b1"], aa["g"], aa["b"], aa["w2f"], aa["cbias"],
            aa["att"], aa["bias"], col_cls) * tang)

    diffs = tuple(a[k] for k in DIFF)
    got = jax.grad(loss_kernel, argnums=tuple(range(len(DIFF))))(*diffs)
    want = jax.grad(loss_dense, argnums=tuple(range(len(DIFF))))(*diffs)
    for n, gv, wv in zip(DIFF, got, want):
        np.testing.assert_allclose(
            np.asarray(gv), np.asarray(wv), rtol=1e-3, atol=1e-4,
            err_msg=f"d{n}",
        )


def test_bf16_node_keys_close_to_f32():
    """bf16 node-key tables stream end-to-end; dkeys come back bf16 and
    every value tracks the f32 path within bf16 tolerance."""
    a, ct, tiles, col_cls = _rand_case(2)

    def loss(xj_node, w2f, cast):
        k = xj_node.astype(jnp.bfloat16) if cast else xj_node
        aa = dict(a, xj_node=k, w2f=w2f)
        out = _run_kernel(aa, ct, tiles)
        return jnp.sum(out * jnp.cos(jnp.arange(out.size).reshape(out.shape)))

    v32, g32 = jax.value_and_grad(loss, argnums=(0, 1))(
        a["xj_node"], a["w2f"], False)
    v16, g16 = jax.value_and_grad(loss, argnums=(0, 1))(
        a["xj_node"], a["w2f"], True)
    assert g16[0].dtype == jnp.float32  # cast VJP restores leaf dtype
    np.testing.assert_allclose(float(v16), float(v32), rtol=3e-2)
    for gv, wv in zip(g16, g32):
        np.testing.assert_allclose(np.asarray(gv, np.float32),
                                   np.asarray(wv, np.float32),
                                   rtol=1e-1, atol=5e-2)


def test_model_pallas_now_uses_fused_pe_kernel():
    """The model flag routes through the fused PE kernel and matches the
    XLA path end-to-end (fwd + grads), incl. under matmul_dtype=bfloat16."""
    from lpformer_tpu.data.synthetic import synthetic_dataset
    from lpformer_tpu.models import LPFormerConfig, forward, init_lpformer

    ds = synthetic_dataset(
        seed=5, num_nodes=90, num_train=300, num_eval=24, feat_dim=10
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

    np.testing.assert_allclose(
        float(loss(params, cfg)), float(loss(params, cfg_p)),
        rtol=1e-4,
    )
    g_ref = jax.grad(loss)(params, cfg)
    g_pal = jax.grad(loss)(params, cfg_p)
    for (pa, av), (pb, bv) in zip(
        jax.tree_util.tree_flatten_with_path(g_ref)[0],
        jax.tree_util.tree_flatten_with_path(g_pal)[0],
    ):
        np.testing.assert_allclose(
            np.asarray(av), np.asarray(bv), rtol=2e-3, atol=2e-4,
            err_msg=jax.tree_util.keystr(pa),
        )


def test_model_two_trans_layers_pallas_matches_xla():
    """trans_layers=2: layer 0 emits 2*dim (ho=2d), layer 1 re-projects —
    both route through the fused kernel and match the XLA path."""
    from lpformer_tpu.data.synthetic import synthetic_dataset
    from lpformer_tpu.models import LPFormerConfig, forward, init_lpformer

    ds = synthetic_dataset(
        seed=8, num_nodes=80, num_train=250, num_eval=20, feat_dim=8
    )
    cfg = LPFormerConfig(
        dim=16, gnn_layers=1, trans_layers=2, budget_cn=16,
        budget_onehop=32, budget_non1hop=32, remat_pairwise=False,
    )
    cfg_p = dataclasses.replace(cfg, use_pallas_attention=True)
    params = init_lpformer(jax.random.PRNGKey(1), cfg, in_dim=8)
    src = jnp.asarray(ds.valid_pos[:8, 0])
    tgt = jnp.asarray(ds.valid_pos[:8, 1])
    h_ref = forward(params, cfg, ds.graph, src, tgt, train=False)
    h_pal = forward(params, cfg_p, ds.graph, src, tgt, train=False)
    np.testing.assert_allclose(
        np.asarray(h_ref), np.asarray(h_pal), rtol=1e-4, atol=1e-5
    )

    def loss(params, cfg):
        return jnp.sum(
            forward(params, cfg, ds.graph, src, tgt, train=False) ** 2)

    g_ref = jax.tree_util.tree_leaves(jax.grad(loss)(params, cfg))
    g_pal = jax.tree_util.tree_leaves(jax.grad(loss)(params, cfg_p))
    for a, b in zip(g_ref, g_pal):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-4
        )


def test_misaligned_budgets_fall_back_to_xla():
    from lpformer_tpu.models.link_transformer import _pe_tiles
    from lpformer_tpu.models import LPFormerConfig

    cfg = LPFormerConfig(
        dim=16, budget_cn=12, budget_onehop=40, budget_non1hop=20,
    )
    ct, tiles = _pe_tiles(cfg)
    assert ct in (0, 4) and (ct == 0)  # gcd 4 < 8 -> unaligned


@pytest.mark.parametrize("budgets", [(16, 32, 32), (64, 128, 128)])
def test_tile_map(budgets):
    ct = pe_attention_tile(budgets, min_tile=8)
    assert ct > 0
    assert all(bgt % ct == 0 for bgt in budgets)
    # auto mode is conservative: sub-32 tiles fall back to XLA
    assert pe_attention_tile((16, 32, 32)) == 0
    assert pe_attention_tile((64, 128, 128)) == 64
