"""Reference-checkpoint interop.

Converts checkpoints between the reference's torch ``state_dict`` layout
(reference: src/util/utils.py:21-51 — ``{"model": LinkTransformer
state_dict, "score_func": mlp_score state_dict, "optimizer": ...}``) and
this framework's param pytree (models/link_transformer.py:init_lpformer).

Use cases:
* A reference user brings a trained ``.pt`` checkpoint and evaluates it
  here (``scripts/import_reference_checkpoint.py`` → ``--checkpoint``
  eval) — paper-parity on real datasets without retraining.
* Exporting params for cross-validation against the reference.

The mapping is structural, not numeric: torch ``Linear.weight`` is
[out, in] and ours is [in, out] (transposed); LayerNorm ``weight/bias``
→ ``g/b``; the GATv2 ``att`` parameter drops its leading broadcast dim
([1, H, O] → [H, O]). The reference's ``node_encoder.feat_transform``
is constructed but never used in its forward (reference:
src/modules/node_encoder.py:27), so import drops it and export emits
zeros for strict ``load_state_dict`` compatibility.

Torch is NOT imported here — callers hand in plain numpy mappings, so
this module stays importable in torch-free runtimes.
"""
from __future__ import annotations

from typing import Any, Dict, List, Mapping

import numpy as np

__all__ = ["import_reference_state", "export_reference_state"]


def _np(x: Any) -> np.ndarray:
    """Accept numpy arrays or anything exposing .numpy() (torch CPU
    tensors, after .detach()) without importing torch."""
    if isinstance(x, np.ndarray):
        return x
    for attr in ("detach", "cpu"):
        if hasattr(x, attr):
            x = getattr(x, attr)()
    if hasattr(x, "numpy"):
        return np.asarray(x.numpy())
    return np.asarray(x)


def _lin_in(sd: Mapping[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    """torch Linear -> {"w" [in,out], "b"}."""
    out = {"w": np.ascontiguousarray(_np(sd[prefix + ".weight"]).T)}
    if prefix + ".bias" in sd:
        out["b"] = _np(sd[prefix + ".bias"])
    return out


def _ln_in(sd: Mapping[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    return {"g": _np(sd[prefix + ".weight"]), "b": _np(sd[prefix + ".bias"])}


def _mlp_in(sd: Mapping[str, Any], prefix: str, lin_name: str = "linears",
            norm: bool = True) -> Dict:
    """Reference MLP / mlp_score (reference: src/models/other_models.py:
    80-138, 142-179) -> our mlp param dict."""
    base = f"{prefix}.{lin_name}" if prefix else lin_name
    norm_base = f"{prefix}.norm" if prefix else "norm"
    layers: List[Dict] = []
    i = 0
    while f"{base}.{i}.weight" in sd:
        layers.append(_lin_in(sd, f"{base}.{i}"))
        i += 1
    if not layers:
        raise KeyError(f"no '{base}.*.weight' keys found")
    p: Dict = {"layers": layers}
    if norm and f"{norm_base}.weight" in sd:
        p["norm"] = _ln_in(sd, norm_base)
    return p


def _att_layer_in(sd: Mapping[str, Any], prefix: str) -> Dict:
    """Reference LinkTransformerLayer (reference: src/modules/layers.py:
    17-157): .att.{lin_l,lin_r,att,bias} + .post_att_norm."""
    att = _np(sd[f"{prefix}.att.att"])
    if att.ndim == 3:  # [1, H, O] -> [H, O]
        att = att[0]
    return {
        "lin_l": _lin_in(sd, f"{prefix}.att.lin_l"),
        "lin_r": _lin_in(sd, f"{prefix}.att.lin_r"),
        "att": att,
        "bias": _np(sd[f"{prefix}.att.bias"]),
        "post_norm": _ln_in(sd, f"{prefix}.post_att_norm"),
    }


def import_reference_state(state: Mapping[str, Any]) -> Dict:
    """``{"model": state_dict, "score_func": state_dict}`` (values: numpy
    arrays or torch CPU tensors) -> init_lpformer-shaped param pytree.

    Mask mode / layer counts are inferred from which keys exist, so the
    result matches whatever config the checkpoint was trained with."""
    msd = state["model"]
    ssd = state["score_func"]

    p: Dict = {}
    # GCN encoder (reference: other_models.py:10-76 under
    # node_encoder.gnn_encoder; conv = PyG GCNConv: lin.weight + bias)
    convs: List[Dict] = []
    lns: List[Dict] = []
    i = 0
    while f"node_encoder.gnn_encoder.convs.{i}.lin.weight" in msd:
        c = _lin_in(msd, f"node_encoder.gnn_encoder.convs.{i}.lin")
        c["bias"] = _np(msd[f"node_encoder.gnn_encoder.convs.{i}.bias"])
        convs.append(c)
        if f"node_encoder.gnn_encoder.lns.{i}.weight" in msd:
            lns.append(_ln_in(msd, f"node_encoder.gnn_encoder.lns.{i}"))
        i += 1
    if not convs:
        raise KeyError("no GCN conv weights in checkpoint['model']")
    enc: Dict = {"convs": convs}
    if lns:
        enc["lns"] = lns
    p["node_encoder"] = enc

    p["gnn_norm"] = _ln_in(msd, "gnn_norm")
    p["elementwise_lin"] = _mlp_in(msd, "elementwise_lin")
    p["ppr_encoder_cn"] = _mlp_in(msd, "ppr_encoder_cn")
    for name in ("ppr_encoder_onehop", "ppr_encoder_non1hop"):
        if f"{name}.linears.0.weight" in msd:
            p[name] = _mlp_in(msd, name)

    att_layers: List[Dict] = []
    li = 0
    while f"att_layers.{li}.att.lin_l.weight" in msd:
        att_layers.append(_att_layer_in(msd, f"att_layers.{li}"))
        li += 1
    if not att_layers:
        raise KeyError("no att_layers.* weights in checkpoint['model']")
    p["att_layers"] = att_layers

    p["pairwise_lin"] = _mlp_in(msd, "pairwise_lin")
    # mlp_score uses attribute name "lins" and has no norm
    # (reference: other_models.py:152-156)
    p["score"] = _mlp_in(ssd, "", lin_name="lins", norm=False)
    return p


def _lin_out(sd: Dict[str, np.ndarray], prefix: str, p: Mapping) -> None:
    sd[prefix + ".weight"] = np.ascontiguousarray(_np(p["w"]).T)
    if p.get("b") is not None:
        sd[prefix + ".bias"] = _np(p["b"])


def _ln_out(sd: Dict[str, np.ndarray], prefix: str, p: Mapping) -> None:
    sd[prefix + ".weight"] = _np(p["g"])
    sd[prefix + ".bias"] = _np(p["b"])


def _mlp_out(sd: Dict, prefix: str, p: Mapping,
             lin_name: str = "linears") -> None:
    for i, lp in enumerate(p["layers"]):
        _lin_out(sd, f"{prefix}{lin_name}.{i}", lp)
    if "norm" in p:
        _ln_out(sd, f"{prefix}norm", p["norm"])


def export_reference_state(params: Mapping) -> Dict[str, Dict]:
    """Inverse of :func:`import_reference_state`. Emits state dicts whose
    keys match the reference modules exactly (including the unused
    ``feat_transform``, zero-filled) so ``load_state_dict`` is strict-
    compatible."""
    msd: Dict[str, np.ndarray] = {}
    enc = params["node_encoder"]
    for i, c in enumerate(enc["convs"]):
        _lin_out(msd, f"node_encoder.gnn_encoder.convs.{i}.lin",
                 {"w": c["w"], "b": None})
        msd[f"node_encoder.gnn_encoder.convs.{i}.bias"] = _np(c["bias"])
    for i, ln in enumerate(enc.get("lns", [])):
        _ln_out(msd, f"node_encoder.gnn_encoder.lns.{i}", ln)
    in_dim, dim = (_np(enc["convs"][0]["w"]).shape[0],
                   _np(enc["convs"][-1]["w"]).shape[1])
    msd["node_encoder.feat_transform.weight"] = np.zeros(
        (dim, in_dim), np.float32)
    msd["node_encoder.feat_transform.bias"] = np.zeros((dim,), np.float32)

    _ln_out(msd, "gnn_norm", params["gnn_norm"])
    _mlp_out(msd, "elementwise_lin.", params["elementwise_lin"])
    for name in ("ppr_encoder_cn", "ppr_encoder_onehop",
                 "ppr_encoder_non1hop"):
        if name in params:
            _mlp_out(msd, name + ".", params[name])
    for li, lp in enumerate(params["att_layers"]):
        _lin_out(msd, f"att_layers.{li}.att.lin_l", lp["lin_l"])
        _lin_out(msd, f"att_layers.{li}.att.lin_r", lp["lin_r"])
        msd[f"att_layers.{li}.att.att"] = _np(lp["att"])[None]
        msd[f"att_layers.{li}.att.bias"] = _np(lp["bias"])
        _ln_out(msd, f"att_layers.{li}.post_att_norm", lp["post_norm"])
    _mlp_out(msd, "pairwise_lin.", params["pairwise_lin"])

    ssd: Dict[str, np.ndarray] = {}
    _mlp_out(ssd, "", params["score"], lin_name="lins")
    return {"model": msd, "score_func": ssd}
