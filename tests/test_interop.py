"""Reference-checkpoint interop round-trips.

The import path (torch state_dict -> our pytree) is how a reference
user's trained ``.pt`` checkpoint enters this framework
(scripts/import_reference_checkpoint.py). These tests pin:
  * export -> import is the identity on our param tree (all mask modes,
    1- and 2-transformer-layer configs),
  * the torch Linear/LayerNorm key/transpose conventions are the real
    torch ones (checked against live torch modules, not our own export),
  * the full file path: torch.save -> convert_one -> load_checkpoint.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lpformer_tpu.models.config import LPFormerConfig
from lpformer_tpu.models.link_transformer import init_lpformer
from lpformer_tpu.nn import core as nn
from lpformer_tpu.utils.interop import (
    export_reference_state,
    import_reference_state,
)


def _tree_allclose(a, b):
    la, ta = jax.tree_util.tree_flatten(a)
    lb, tb = jax.tree_util.tree_flatten(b)
    assert ta == tb, f"tree structure mismatch:\n{ta}\n{tb}"
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=0,
                                   atol=0)


CFGS = [
    # (mask mode exercised, trans_layers)
    LPFormerConfig(dim=16, gnn_layers=3, trans_layers=1,
                   thresh_1hop=1e-2, thresh_non1hop=1e-2),   # "all"
    LPFormerConfig(dim=16, gnn_layers=1, trans_layers=1,
                   thresh_1hop=1e-2, thresh_non1hop=1.0),    # "1-hop"
    LPFormerConfig(dim=16, gnn_layers=2, trans_layers=2,
                   thresh_1hop=1.0, thresh_non1hop=1.0),     # "cn"
]


@pytest.mark.parametrize("cfg", CFGS, ids=["all", "1hop", "cn"])
def test_export_import_roundtrip(cfg):
    params = init_lpformer(jax.random.PRNGKey(0), cfg, in_dim=24)
    state = export_reference_state(params)
    back = import_reference_state(state)
    _tree_allclose(params, back)


def test_export_keys_match_reference_naming():
    """Spot-check the state_dict key set against the reference module
    tree (reference: src/models/link_transformer.py:52-79,
    other_models.py:30-50, modules/layers.py:130-140)."""
    cfg = CFGS[0]
    params = init_lpformer(jax.random.PRNGKey(1), cfg, in_dim=24)
    msd = export_reference_state(params)["model"]
    for k in [
        "gnn_norm.weight",
        "node_encoder.feat_transform.weight",
        "node_encoder.gnn_encoder.convs.0.lin.weight",
        "node_encoder.gnn_encoder.convs.2.bias",
        "node_encoder.gnn_encoder.lns.1.weight",
        "elementwise_lin.linears.0.weight",
        "elementwise_lin.norm.bias",
        "ppr_encoder_cn.linears.1.weight",
        "ppr_encoder_onehop.linears.0.bias",
        "ppr_encoder_non1hop.norm.weight",
        "att_layers.0.att.lin_l.weight",
        "att_layers.0.att.lin_r.bias",
        "att_layers.0.att.att",
        "att_layers.0.att.bias",
        "att_layers.0.post_att_norm.weight",
        "pairwise_lin.linears.1.bias",
    ]:
        assert k in msd, f"missing reference key {k}"
    assert msd["att_layers.0.att.att"].ndim == 3  # [1, H, O]
    # conv lin has no bias key (GCNConv bias is a separate parameter)
    assert "node_encoder.gnn_encoder.convs.0.lin.bias" not in msd


def test_torch_linear_layernorm_conventions():
    """The transpose/name mapping must match live torch modules."""
    torch = pytest.importorskip("torch")
    lin = torch.nn.Linear(6, 4)
    ln = torch.nn.LayerNorm(4)
    sd = {f"l.{k}": v for k, v in lin.state_dict().items()}
    sd.update({f"n.{k}": v for k, v in ln.state_dict().items()})
    from lpformer_tpu.utils.interop import _lin_in, _ln_in

    p = _lin_in(sd, "l")
    q = _ln_in(sd, "n")
    x = np.random.default_rng(0).standard_normal((3, 6)).astype(np.float32)
    want = ln(lin(torch.from_numpy(x))).detach().numpy()
    got = np.asarray(
        nn.layer_norm_apply(
            {"g": jnp.asarray(q["g"]), "b": jnp.asarray(q["b"])},
            nn.linear_apply(
                {"w": jnp.asarray(p["w"]), "b": jnp.asarray(p["b"])},
                jnp.asarray(x),
            ),
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_pt_file_conversion_roundtrip(tmp_path):
    """torch.save(reference layout) -> convert_one -> load_checkpoint
    reproduces the source params exactly."""
    torch = pytest.importorskip("torch")
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir,
                                    "scripts"))
    from import_reference_checkpoint import convert_one

    from lpformer_tpu.utils.checkpoint import load_checkpoint

    cfg = CFGS[0]
    params = init_lpformer(jax.random.PRNGKey(2), cfg, in_dim=24)
    state = export_reference_state(params)
    pt = {
        "model": {k: torch.from_numpy(np.asarray(v))
                  for k, v in state["model"].items()},
        "score_func": {k: torch.from_numpy(np.asarray(v))
                       for k, v in state["score_func"].items()},
        "optimizer": {},
    }
    pt_path = os.path.join(tmp_path, "ref.pt")
    ck_path = os.path.join(tmp_path, "imported.ckpt")
    torch.save(pt, pt_path)
    convert_one(pt_path, ck_path)
    loaded = load_checkpoint(ck_path)
    assert loaded["step"] == 0
    _tree_allclose(params, loaded["params"])
