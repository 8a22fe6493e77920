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


def make_optimizer(
    lr: float,
    weight_decay: float = 0.0,
    decay: float = 1.0,
    steps_per_epoch: int = 1,
    clip_norm: Optional[float] = 1.0,
) -> optax.GradientTransformation:
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
