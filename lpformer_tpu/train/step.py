"""Jitted training step.

One fused program per optimization step, mirroring the reference batch
loop body (reference: src/train/train_model.py:23-77):

  1. mask the batch's positive edges out of the context adjacency
     (rank-space, ops/masking.py) and optionally out of the propagation
     adjacency (``--mask-input``);
  2. positive forward (masked), uniform-random negatives ``randint``
     (reference :64) and negative forward (unmasked — the reference
     passes no masks for negatives);
  3. loss = -mean log(pos + 1e-6) - mean log(1 - neg + 1e-6)  (:61,68);
  4. grads -> partitioned clip -> Adam -> params.

The reference runs two *full* forwards (two full-graph GCN propagations)
per step with independent dropout draws; ``double_propagate=True``
mirrors that exactly. ``double_propagate=False`` shares one propagation
between pos/neg halves: the expected loss and gradient are identical
(both halves see the same dropout distribution; only the covariance
between the two loss terms changes), and with ``gnn_drop == 0`` the step
is bit-identical. It is the default whenever ``mask_input`` is off
(mask_input gives pos/neg different propagation adjacencies, which
forces two propagations). Measured on v5e at the collab-like bench
shape: 45 ms/step (~17%).

Partial final batches are handled with a per-edge weight mask (the
reference's DataLoader emits a ragged last batch; here shapes stay
static and padded entries get zero loss weight).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from lpformer_tpu.models import link_transformer as lt
from lpformer_tpu.models.config import LPFormerConfig
from lpformer_tpu.ops import masking


class TrainState(NamedTuple):
    params: dict
    opt_state: optax.OptState
    step: jnp.ndarray


def loss_fn(
    params,
    cfg: LPFormerConfig,
    graph,
    pos_src,
    pos_tgt,
    neg_src,
    neg_tgt,
    pos_weight,
    mask_ranks,
    prop_edge_w,
    rng,
    double_propagate: bool = True,
    *,
    pos_denom=None,
    neg_denom=None,
):
    rng_pos, rng_neg = jax.random.split(rng)
    if double_propagate:
        X_pos = X_neg = None
    else:
        assert prop_edge_w is None, (
            "mask_input requires double_propagate (pos/neg see different "
            "propagation adjacencies)"
        )
        X_pos = X_neg = lt.propagate(
            params, cfg, graph, rng=rng_pos, train=True
        )
    h_pos = lt.forward(
        params, cfg, graph, pos_src, pos_tgt,
        rng=rng_pos, train=True, mask_ranks=mask_ranks,
        prop_edge_w=prop_edge_w, X_node=X_pos,
    )
    pos_out = lt.score_links(
        params, cfg, h_pos, rng=jax.random.fold_in(rng_pos, 99), train=True
    )
    h_neg = lt.forward(
        params, cfg, graph, neg_src, neg_tgt,
        rng=rng_neg, train=True, mask_ranks=None, prop_edge_w=None,
        X_node=X_neg,
    )
    neg_out = lt.score_links(
        params, cfg, h_neg, rng=jax.random.fold_in(rng_neg, 99), train=True
    )

    w = pos_weight
    # pos/neg_denom let grad-accum micro-batches normalize by the FULL
    # batch's weight sums so the summed micro losses/grads equal the
    # monolithic step's (a per-micro mean would underweight a padded
    # ragged tail by up to grad_accum x).
    wsum = jnp.maximum(jnp.sum(w), 1.0) if pos_denom is None else pos_denom
    pos_loss = -jnp.sum(jnp.log(pos_out + 1e-6) * w) / wsum
    # negatives replicate pos edges num_negative times; weight alike
    nw = jnp.repeat(w, neg_out.shape[0] // w.shape[0])
    nwsum = (
        jnp.maximum(jnp.sum(nw), 1.0) if neg_denom is None else neg_denom
    )
    neg_loss = -jnp.sum(jnp.log(1.0 - neg_out + 1e-6) * nw) / nwsum
    return pos_loss + neg_loss


def make_train_step(
    cfg: LPFormerConfig,
    optimizer: optax.GradientTransformation,
    num_negative: int = 1,
    mask_input: bool = False,
    double_propagate: bool | None = None,
    donate: bool = True,
    grad_accum: int = 1,
    steps_per_call: int = 1,
):
    """Build the jitted step:
    (state, graph, mult, bin_edge_w, batch_src, batch_tgt, weight, rng)
      -> (state, loss)

    ``grad_accum`` > 1 splits the batch into that many micro-batches
    scanned sequentially, summing micro gradients (each normalized by
    the FULL batch's weight sums) before ONE optimizer update. The
    positive-edge mask is computed from the FULL batch (the reference
    masks every batch positive, train_model.py:38-45), so the semantics
    match the monolithic step exactly — including padded ragged tails —
    up to float reassociation and per-micro dropout draws; peak
    activation memory scales with the micro-batch. Use for high-degree
    configs (ddi/ppa-like) on 16GB chips.

    ``steps_per_call`` > 1 returns a device loop instead: the jitted fn
    takes K stacked batches ``src/tgt/w: [K, B]`` plus a ``live: [K]``
    mask and runs K full optimizer steps in ONE program via
    ``lax.scan``, returning per-step losses ``[K]``. Each scanned step
    is exactly the single-step program (distinct negatives / dropout via
    the per-step ``state.step`` fold); steps with ``live == 0`` leave
    params, optimizer state, and the step counter untouched, so a padded
    epoch tail is a no-op rather than a spurious Adam update. Dispatch
    and host<->device transport costs amortize K-fold — on the axon
    transport that overhead is ~38 ms per executable launch (measured
    v5e, collab-like shape), which a K=8 loop turns into <5 ms/step.
    """
    if double_propagate is None:
        double_propagate = mask_input

    def step(state: TrainState, graph, mult, bin_edge_w, src, tgt, w, rng):
        rng_neg, rng_loss = jax.random.split(jax.random.fold_in(rng, state.step))
        b = src.shape[0]
        neg = jax.random.randint(
            rng_neg, (2, b * num_negative), 0, graph.num_nodes,
            dtype=src.dtype,
        )  # reference train_model.py:64
        mask_ranks = masking.batch_mask_ranks(
            graph.adj_rows, src, tgt, mult, weight=w
        )
        if mask_input:
            # reference builds the masked propagation adjacency UNWEIGHTED
            # (train_model.py:51-53); bin_edge_w is the binarized weights
            prop_w = masking.mask_edge_weights(
                mask_ranks, graph.edge_rank, bin_edge_w
            )
        else:
            prop_w = None

        if grad_accum <= 1:
            loss, grads = jax.value_and_grad(loss_fn)(
                state.params, cfg, graph, src, tgt, neg[0], neg[1], w,
                mask_ranks, prop_w, rng_loss, double_propagate,
            )
        else:
            assert b % grad_accum == 0, (
                f"batch {b} not divisible by grad_accum {grad_accum}"
            )
            mb = b // grad_accum
            nmb = (b * num_negative) // grad_accum
            # normalize every micro-batch by the FULL batch's weight sums
            # so summing micro losses/grads reproduces the monolithic
            # step exactly even when a padded ragged tail leaves some
            # micro-batches underweighted
            pos_denom = jnp.maximum(jnp.sum(w), 1.0)
            neg_denom = jnp.maximum(jnp.sum(w) * num_negative, 1.0)

            def micro(carry, xs):
                acc_loss, acc_grads = carry
                msrc, mtgt, mw, mns, mnt, mrng = xs
                l, g = jax.value_and_grad(loss_fn)(
                    state.params, cfg, graph, msrc, mtgt, mns, mnt, mw,
                    mask_ranks, prop_w, mrng, double_propagate,
                    pos_denom=pos_denom, neg_denom=neg_denom,
                )
                return (
                    acc_loss + l,
                    jax.tree_util.tree_map(jnp.add, acc_grads, g),
                ), None

            zeros = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            xs = (
                src.reshape(grad_accum, mb),
                tgt.reshape(grad_accum, mb),
                w.reshape(grad_accum, mb),
                neg[0].reshape(grad_accum, nmb),
                neg[1].reshape(grad_accum, nmb),
                jax.random.split(rng_loss, grad_accum),
            )
            (loss, grads), _ = jax.lax.scan(micro, (0.0, zeros), xs)
        updates, opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    if steps_per_call <= 1:
        return jax.jit(step, donate_argnums=(0,) if donate else ())

    def multi_step(state: TrainState, graph, mult, bin_edge_w,
                   srcs, tgts, ws, live, rng):
        def body(st, xs):
            s, t, w, lv = xs
            st2, loss = step(st, graph, mult, bin_edge_w, s, t, w, rng)
            # dead (padded) steps keep state bit-identical — a zero-grad
            # Adam update would still decay moments / advance bias
            # correction, which the reference's epoch loop never does
            keep = jax.tree_util.tree_map(
                lambda a, b: jnp.where(lv > 0, a, b), st2, st
            )
            return keep, jnp.where(lv > 0, loss, 0.0)

        return jax.lax.scan(body, state, (srcs, tgts, ws, live))

    return jax.jit(multi_step, donate_argnums=(0,) if donate else ())
