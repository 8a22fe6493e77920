"""Optimizer: Adam + exponential epoch decay + partitioned grad clipping.

Mirrors the reference training setup (reference:
src/train/train_model.py:73-77,99-100):
  * grad-norm clip to 1.0, applied SEPARATELY to the model parameters and
    the score head (the reference calls clip_grad_norm_ twice, once per
    module) — reproduced via a partitioned clip on the 'score' subtree;
  * torch.optim.Adam semantics: L2 weight decay added to the gradient
    before the moment updates (not AdamW);
  * LambdaLR(decay ** epoch): lr(step) = lr0 * decay^(step // steps_per_epoch).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax


def partitioned_clip_by_global_norm(max_norm: float) -> optax.GradientTransformation:
    """Clip the 'score' subtree and the remainder independently, each to
    ``max_norm`` (matching the reference's two clip_grad_norm_ calls)."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def _clip_subset(updates, select):
        leaves = [
            u
            for path, u in jax.tree_util.tree_leaves_with_path(updates)
            if select(path)
        ]
        if not leaves:
            return updates
        gnorm = jnp.sqrt(sum(jnp.sum(jnp.square(g)) for g in leaves))
        scale = jnp.minimum(1.0, max_norm / jnp.maximum(gnorm, 1e-12))
        return jax.tree_util.tree_map_with_path(
            lambda path, g: g * scale if select(path) else g, updates
        )

    def _is_score(path):
        return (
            len(path) > 0
            and isinstance(path[0], jax.tree_util.DictKey)
            and path[0].key == "score"
        )

    def update_fn(updates, state, params=None):
        del params
        updates = _clip_subset(updates, _is_score)
        updates = _clip_subset(updates, lambda p: not _is_score(p))
        return updates, state

    return optax.GradientTransformation(init_fn, update_fn)


def fused_adam_with_partitioned_clip(
    lr: float,
    weight_decay: float,
    decay: float,
    steps_per_epoch: int,
    clip_norm: Optional[float],
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
) -> optax.GradientTransformation:
    """The full optimizer chain (partitioned clip -> torch-Adam -> lr
    schedule) computed on ONE flat parameter vector.

    Same math as the optax chain in :func:`make_optimizer` (verified to
    float tolerance in tests/test_fused_optim.py), but the per-leaf
    chain costs ~240 small TPU ops per step (~30 leaves x clip norms,
    moment updates, bias corrections); on v5e that tiny-op overhead is
    ~12 ms/step of the bench step. Flat: 2 reductions + one fused
    elementwise chain + per-leaf slice on the way out.
    """
    from jax.flatten_util import ravel_pytree

    def _is_score(path):
        return (
            len(path) > 0
            and isinstance(path[0], jax.tree_util.DictKey)
            and path[0].key == "score"
        )

    def init_fn(params):
        flat, _ = ravel_pytree(params)
        mask_tree = jax.tree_util.tree_map_with_path(
            lambda p, x: jnp.full(x.shape, float(_is_score(p)), flat.dtype),
            params,
        )
        mask, _ = ravel_pytree(mask_tree)
        return {
            "count": jnp.zeros((), jnp.int32),
            "m": jnp.zeros_like(flat),
            "v": jnp.zeros_like(flat),
            "score_mask": mask,
        }

    def update_fn(updates, state, params=None):
        g, unravel = ravel_pytree(updates)
        mask = state["score_mask"]
        if clip_norm is not None:
            # two independent global-norm clips (reference calls
            # clip_grad_norm_ once per module, train_model.py:73-77)
            ss = jnp.sum(jnp.square(g) * mask)
            sr = jnp.sum(jnp.square(g)) - ss
            cs = jnp.minimum(
                1.0, clip_norm / jnp.maximum(jnp.sqrt(ss), 1e-12))
            cr = jnp.minimum(
                1.0, clip_norm / jnp.maximum(jnp.sqrt(sr), 1e-12))
            g = g * (mask * cs + (1.0 - mask) * cr)
        if weight_decay > 0:
            p, _ = ravel_pytree(params)
            g = g + weight_decay * p
        c = state["count"] + 1
        m = b1 * state["m"] + (1.0 - b1) * g
        v = b2 * state["v"] + (1.0 - b2) * jnp.square(g)
        cf = c.astype(m.dtype)
        mhat = m / (1.0 - b1 ** cf)
        vhat = v / (1.0 - b2 ** cf)
        upd = mhat / (jnp.sqrt(vhat) + eps)
        # LambdaLR(decay ** epoch) on the PRE-increment count (optax
        # scale_by_schedule semantics: first update sees schedule(0))
        epoch = state["count"] // max(steps_per_epoch, 1)
        lr_t = lr * (decay ** epoch.astype(m.dtype))
        upd = -lr_t * upd
        new_state = {
            "count": c, "m": m, "v": v, "score_mask": mask,
        }
        return unravel(upd), new_state

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(
    lr: float,
    weight_decay: float = 0.0,
    decay: float = 1.0,
    steps_per_epoch: int = 1,
    clip_norm: Optional[float] = 1.0,
    fused: bool = True,
) -> optax.GradientTransformation:
    """``fused=True`` (default) runs the whole chain on one flat vector
    (see :func:`fused_adam_with_partitioned_clip`); ``fused=False`` is
    the reference-shaped optax chain it is tested against."""
    if fused:
        return fused_adam_with_partitioned_clip(
            lr, weight_decay, decay, steps_per_epoch, clip_norm
        )

    def schedule(step):
        epoch = step // max(steps_per_epoch, 1)
        return lr * (decay ** epoch)

    parts = []
    if clip_norm is not None:
        parts.append(partitioned_clip_by_global_norm(clip_norm))
    if weight_decay > 0:
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))
    parts.append(optax.scale_by_learning_rate(schedule))
    return optax.chain(*parts)
