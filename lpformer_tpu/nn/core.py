"""Functional NN primitives.

Plain pytree params (nested dicts of arrays) + pure apply functions. No
framework magic: everything jits, shards, and checkpoints transparently.

Initializers mirror the reference's torch modules so that training
dynamics match:
  * ``linear_init(kind="torch")``  — torch.nn.Linear default
    (kaiming-uniform(a=sqrt(5)) == U(±1/sqrt(fan_in)) for weight & bias).
  * ``linear_init(kind="glorot")`` — PyG Linear(weight_initializer='glorot')
    with the PyG default uniform(+-1/sqrt(fan_in)) bias (used by the
    attention projections, reference: src/modules/layers.py:130-131).
  * LayerNorm: ones/zeros, eps 1e-5 (torch default).
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp


def linear_init(
    key: jax.Array,
    in_dim: int,
    out_dim: int,
    bias: bool = True,
    kind: str = "torch",
    dtype=jnp.float32,
) -> Dict[str, jnp.ndarray]:
    wk, bk = jax.random.split(key)
    if kind == "torch":
        bound = 1.0 / (in_dim ** 0.5)
        w = jax.random.uniform(
            wk, (in_dim, out_dim), dtype, minval=-bound, maxval=bound
        )
        b = (
            jax.random.uniform(
                bk, (out_dim,), dtype, minval=-bound, maxval=bound
            )
            if bias
            else None
        )
    elif kind == "glorot":
        bound = (6.0 / (in_dim + out_dim)) ** 0.5
        w = jax.random.uniform(
            wk, (in_dim, out_dim), dtype, minval=-bound, maxval=bound
        )
        # PyG Linear(weight_initializer='glorot') leaves the bias on its
        # default init: U(+-1/sqrt(fan_in)) (pyg nn.dense.linear)
        bbound = 1.0 / (in_dim ** 0.5)
        b = (
            jax.random.uniform(
                bk, (out_dim,), dtype, minval=-bbound, maxval=bbound
            )
            if bias
            else None
        )
    else:
        raise ValueError(f"unknown init kind: {kind}")
    p = {"w": w}
    if b is not None:
        p["b"] = b
    return p


def matmul(x: jnp.ndarray, w: jnp.ndarray, mm_dtype=None) -> jnp.ndarray:
    """Matmul with optional reduced-precision inputs (bf16 on the MXU)
    and float32 accumulation."""
    if mm_dtype is None:
        return x @ w
    return jnp.dot(
        x.astype(mm_dtype), w.astype(mm_dtype),
        preferred_element_type=jnp.float32,
    )


def cast_matmul_weights(params, mm_dtype):
    """Pre-cast every matmul kernel (2-D+ ``"w"`` leaves) to ``mm_dtype``.

    ``matmul``'s per-call ``w.astype`` becomes a no-op afterwards, so a
    program converts each weight ONCE instead of once per use site —
    measured ~9 ms/step of pure per-op overhead in the v5e bench step
    (42 [128,128] + 22 [2,128] converts at ~0.1 ms apiece). Gradients
    still flow to the f32 leaves through the hoisted convert."""
    if mm_dtype is None:
        return params

    def walk(d):
        if isinstance(d, dict):
            return {
                k: (v.astype(mm_dtype)
                    if k == "w" and hasattr(v, "ndim") and v.ndim >= 2
                    else walk(v))
                for k, v in d.items()
            }
        if isinstance(d, (list, tuple)):
            return type(d)(walk(x) for x in d)
        return d

    return walk(params)


def linear_apply(params: Dict, x: jnp.ndarray, mm_dtype=None) -> jnp.ndarray:
    y = matmul(x, params["w"], mm_dtype)
    if "b" in params:
        y = y + params["b"]
    return y


def layer_norm_init(dim: int, dtype=jnp.float32) -> Dict[str, jnp.ndarray]:
    return {"g": jnp.ones((dim,), dtype), "b": jnp.zeros((dim,), dtype)}


def layer_norm_apply(
    params: Dict, x: jnp.ndarray, eps: float = 1e-5
) -> jnp.ndarray:
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    y = (x - mu) * jax.lax.rsqrt(var + eps)
    return y * params["g"] + params["b"]


def dropout(
    rng: Optional[jax.Array],
    x: jnp.ndarray,
    rate: float,
    train: bool,
) -> jnp.ndarray:
    """Inverted dropout (torch semantics: scale by 1/(1-p) at train)."""
    if not train or rate <= 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


def mlp_init(
    key: jax.Array,
    num_layers: int,
    in_dim: int,
    hid_dim: int,
    out_dim: int,
    norm: str = "layer",
    bias: bool = True,
    dtype=jnp.float32,
) -> Dict:
    """L-layer MLP matching reference MLP
    (reference: src/models/other_models.py:80-138): hidden layers get
    [Linear -> norm -> relu -> dropout], final layer is a bare Linear."""
    keys = jax.random.split(key, max(num_layers, 1))
    p: Dict = {"layers": []}
    if num_layers == 1:
        p["layers"].append(linear_init(keys[0], in_dim, out_dim, bias, dtype=dtype))
    else:
        p["layers"].append(linear_init(keys[0], in_dim, hid_dim, bias, dtype=dtype))
        for i in range(num_layers - 2):
            p["layers"].append(
                linear_init(keys[i + 1], hid_dim, hid_dim, bias, dtype=dtype)
            )
        p["layers"].append(
            linear_init(keys[num_layers - 1], hid_dim, out_dim, bias, dtype=dtype)
        )
    if norm == "layer" and num_layers > 1:
        p["norm"] = layer_norm_init(hid_dim, dtype)
    return p


def mlp_apply(
    params: Dict,
    x: jnp.ndarray,
    drop: float = 0.0,
    rng: Optional[jax.Array] = None,
    train: bool = False,
    sigmoid: bool = False,
    mm_dtype=None,
) -> jnp.ndarray:
    layers = params["layers"]
    n = len(layers)
    for i, lp in enumerate(layers[:-1]):
        x = linear_apply(lp, x, mm_dtype)
        if "norm" in params:
            x = layer_norm_apply(params["norm"], x)
        x = jax.nn.relu(x)
        if train and drop > 0 and rng is not None:
            rng, sub = jax.random.split(rng)
            x = dropout(sub, x, drop, train)
    x = linear_apply(layers[-1], x, mm_dtype)
    if x.shape[-1] == 1:
        x = jnp.squeeze(x, -1)  # reference MLP squeezes the last dim (:136)
    return jax.nn.sigmoid(x) if sigmoid else x


def split_keys(key: jax.Array, n: int) -> Sequence[jax.Array]:
    return jax.random.split(key, n)
