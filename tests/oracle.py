"""Dense numpy oracle of the reference LPFormer semantics.

A direct, readable implementation of the reference math (dense matrices,
python sets, per-link loops) used to validate the static-shape TPU
pipeline. Written from the reference equations:
  * GCN norm / propagation: PyG gcn_norm + GCNConv
    (reference: src/models/other_models.py:35-76)
  * context classification + thresholds
    (reference: src/models/link_transformer.py:214-319,434-481)
  * attention (reference: src/modules/layers.py:193-224)
  * counts (reference: src/models/link_transformer.py:340-386)
"""
from __future__ import annotations

import numpy as np


# ---------------------------------------------------------------- nn pieces

def np_linear(p, x):
    y = x @ np.asarray(p["w"])
    if "b" in p:
        y = y + np.asarray(p["b"])
    return y


def np_layer_norm(p, x, eps=1e-5):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * np.asarray(p["g"]) + np.asarray(p["b"])


def np_mlp(p, x, sigmoid=False):
    layers = p["layers"]
    for lp in layers[:-1]:
        x = np_linear(lp, x)
        if "norm" in p:
            x = np_layer_norm(p["norm"], x)
        x = np.maximum(x, 0.0)
    x = np_linear(layers[-1], x)
    if x.shape[-1] == 1:
        x = x.squeeze(-1)
    return 1.0 / (1.0 + np.exp(-x)) if sigmoid else x


# ---------------------------------------------------------------- graph math

def dense_adj(edge_src, edge_dst, w, n):
    A = np.zeros((n, n), dtype=np.float64)
    np.add.at(A, (edge_src, edge_dst), w)
    return A


def gcn_norm_dense(A, fill=1.0):
    n = A.shape[0]
    Ah = A + fill * np.eye(n)
    deg = Ah.sum(axis=1)
    dinv = np.where(deg > 0, 1.0 / np.sqrt(deg), 0.0)
    return dinv[:, None] * Ah * dinv[None, :]


def gcn_forward(params, A_w, x, *, layer_norm=True, residual=False, relu=True):
    """reference other_models.py:61-76 ordering: conv -> LN -> (drop) -> relu
    -> residual."""
    Ah = gcn_norm_dense(np.asarray(A_w, np.float64))
    lns = params.get("lns")
    x = np.asarray(x, np.float64)
    for i, conv in enumerate(params["convs"]):
        xi = Ah @ (x @ np.asarray(conv["w"])) + np.asarray(conv["bias"])
        if lns is not None:
            xi = np_layer_norm(lns[i], xi)
        if relu:
            xi = np.maximum(xi, 0.0)
        if residual and x.shape[-1] == xi.shape[-1]:
            x = x + xi
        else:
            x = xi
    return x


# ------------------------------------------------------------- context sets

def context_sets(
    adj_masked,
    adj_unmasked,
    ppr,
    src,
    tgt,
    mode,
    thresh_cn,
    thresh_1hop,
    thresh_non1hop,
):
    """Per-link (node, cls, ppr_src, ppr_tgt) lists.

    adj_masked: dense 0/1 symmetric adjacency with the batch's positive
    edges removed per reference train_model.py:38-45 (support of the
    remaining train edges, symmetrized). Used for CN/1-hop.
    adj_unmasked: the original adjacency, used for the >1-hop exclusion
    (reference get_non_1hop_ppr NOTE, link_transformer.py:438-441).
    Returns dict cls -> list of (v, ps, pt); cls in {"cn","1hop","non1hop"}.
    """

    def nbrs(A, u):
        return set(np.nonzero(A[u])[0].tolist())

    ns, nt = nbrs(adj_masked, src), nbrs(adj_masked, tgt)
    out = {"cn": [], "1hop": [], "non1hop": []}
    for v in sorted(ns | nt):
        ps, pt = float(ppr[src, v]), float(ppr[tgt, v])
        if v in ns and v in nt:  # CN
            if ps >= thresh_cn and pt >= thresh_cn:
                out["cn"].append((v, ps, pt))
        else:  # 1-hop
            if mode == "cn":
                continue
            if ps >= thresh_1hop and pt >= thresh_1hop:
                out["1hop"].append((v, ps, pt))
    if mode == "all":
        ns_u, nt_u = nbrs(adj_unmasked, src), nbrs(adj_unmasked, tgt)
        supp_s = set(np.nonzero(ppr[src] > 0)[0].tolist())
        supp_t = set(np.nonzero(ppr[tgt] > 0)[0].tolist())
        for v in sorted((supp_s & supp_t) - ns_u - nt_u):
            ps, pt = float(ppr[src, v]), float(ppr[tgt, v])
            if ps >= thresh_non1hop and pt >= thresh_non1hop:
                out["non1hop"].append((v, ps, pt))
    return out


def counts_from_sets(sets, mode):
    num_cns = len(sets["cn"])
    num_1hop = len(sets["1hop"])
    num_non1hop = len(sets["non1hop"])
    return num_cns, num_1hop, num_non1hop, num_cns + num_1hop


# ---------------------------------------------------------------- attention

def attention_layer(lp, heads, edge_feat, entries, negative_slope=0.2):
    """One LinkTransformerLayer for ONE link (reference layers.py:161-224).

    entries: list of key vectors [node_feat ‖ pe] (python list, ragged).
    Returns post-LN output [H*O] (no dropout: eval mode).
    """
    w_l, b_l = np.asarray(lp["lin_l"]["w"]), np.asarray(lp["lin_l"]["b"])
    w_r, b_r = np.asarray(lp["lin_r"]["w"]), np.asarray(lp["lin_r"]["b"])
    att = np.asarray(lp["att"])           # [H, O]
    H, O = att.shape
    half = edge_feat.shape[-1] // 2
    e1 = (edge_feat[:half] @ w_l + b_l).reshape(H, O)
    e2 = (edge_feat[half:] @ w_l + b_l).reshape(H, O)
    if len(entries) == 0:
        out = np.zeros(H * O) + np.asarray(lp["bias"])
        return np_layer_norm(lp["post_norm"], out)
    K = np.stack([np.asarray(k) for k in entries])          # [C, 2d]
    xj = (K @ w_r + b_r).reshape(-1, H, O)                  # [C, H, O]
    z = xj * (e1 + e2)[None]
    z = np.where(z >= 0, z, negative_slope * z)
    logits = (z * att[None]).sum(-1)                        # [C, H]
    logits = logits - logits.max(0, keepdims=True)
    alpha = np.exp(logits) / np.exp(logits).sum(0, keepdims=True)
    out = (alpha[..., None] * xj).sum(0).reshape(H * O)
    out = out + np.asarray(lp["bias"])
    return np_layer_norm(lp["post_norm"], out)


def sym_pe(mlp_p, ps, pt):
    a = np_mlp(mlp_p, np.asarray([ps, pt], dtype=np.float64))
    b = np_mlp(mlp_p, np.asarray([pt, ps], dtype=np.float64))
    return a + b


# ------------------------------------------------------------- full forward

def forward_oracle(
    params,
    cfg,
    A_w,
    adj_bin,
    ppr,
    x,
    links,
    adj_masked=None,
):
    """Eval-mode full forward for a list of (src, tgt). Returns h [B, 2d]
    mirroring reference link_transformer.forward (:82-107)."""
    X = gcn_forward(
        params["node_encoder"], A_w, x,
        layer_norm=cfg.layer_norm, residual=cfg.residual, relu=cfg.relu,
    )
    X = np_layer_norm(params["gnn_norm"], X)

    mode = cfg.mask_mode
    hs = []
    for (s, t) in links:
        elementwise = np_mlp(params["elementwise_lin"], X[s] * X[t])
        sets = context_sets(
            adj_bin if adj_masked is None else adj_masked,
            adj_bin, ppr, s, t, mode,
            cfg.thresh_cn, cfg.thresh_1hop, cfg.thresh_non1hop,
        )
        entries = []
        for v, ps, pt in sets["cn"]:
            entries.append(
                np.concatenate([X[v], sym_pe(params["ppr_encoder_cn"], ps, pt)])
            )
        for v, ps, pt in sets["1hop"]:
            entries.append(
                np.concatenate(
                    [X[v], sym_pe(params["ppr_encoder_onehop"], ps, pt)]
                )
            )
        for v, ps, pt in sets["non1hop"]:
            entries.append(
                np.concatenate(
                    [X[v], sym_pe(params["ppr_encoder_non1hop"], ps, pt)]
                )
            )
        pw = np.concatenate([X[s], X[t]])
        for lp in params["att_layers"]:
            pw = attention_layer(lp, cfg.num_heads, pw, entries)
        n_cn, n_1h, n_n1, n_nb = counts_from_sets(sets, mode)
        if mode == "cn":
            cnt = [n_cn]
        elif mode == "1-hop":
            cnt = [n_cn, n_1h, n_nb]
        else:
            cnt = [n_cn, n_1h, n_n1, n_nb]
        pw = np_mlp(params["pairwise_lin"], np.concatenate([pw, cnt]))
        hs.append(np.concatenate([elementwise, pw]))
    return np.stack(hs)
