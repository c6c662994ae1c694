"""RelationScorer — the per-relation scoring model.

Parity target: reference ``Score``/``InputLayer``/``OutputLayer``
(model.py:26-125). One trainable scalar weight per graph node plus a
bias-free linear feature-attribution vector; the forward selects, per source
(or per bag), the max-weight reachable destination.

The reference runs this as nested Python loops over dicts (model.py:45-89) —
one process per relation over MPI. Here it is a batch of segment-max/gather
ops over padded ELL neighbor tables, vmappable over a leading relation axis
so ALL relations train simultaneously on one chip.

Semantics preserved:
* flat mode (model.py:74-89): pred[s] = w[argmax_{d in N_r(s)} w[d]];
  nodes outside the source set keep prediction 0 (torch.zeros base).
* bag mode (model.py:45-72): per member s, products p(s,d) = w[d] *
  (x[s] . u); member value = max_d p(s,d); bag pred = max over members
  (strict improvement -> first-occurrence tie-break); member/bag argmax
  destinations recorded for freezing and relabeling.
* gradient flows only through the selected max elements (the reference's
  index-assignment autograd graph gives exactly this).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class ScorerParams(NamedTuple):
    w: jax.Array  # [N] per-node weights (InputLayer, model.py:26-34)
    u: jax.Array  # [F] LinearLayerAttri weight (model.py:41)


def init_scorer_params(
    rng: np.random.Generator,
    num_nodes: int,
    feat_dim: int,
    dest_nodes: np.ndarray,
    dest_min_label: np.ndarray,
    noise: float = 0.2,
) -> ScorerParams:
    """Label-informed init (reference initialize_weights, main.py:479-497):
    w[dst] = |min(src labels) + U(-noise, noise)| for destination nodes;
    other entries U(0, 1) (the reference leaves them as uninitialized
    memory — they are unreachable by the forward pass, so any value works;
    U(0,1) keeps them inside the clamp range).

    ``u`` follows torch.nn.Linear(F, 1, bias=False) default init:
    U(-1/sqrt(F), 1/sqrt(F))."""
    w = rng.uniform(0.0, 1.0, size=num_nodes).astype(np.float32)
    if len(dest_nodes):
        w[dest_nodes] = np.abs(
            dest_min_label + rng.uniform(-noise, noise, size=len(dest_nodes))
        ).astype(np.float32)
    bound = 1.0 / np.sqrt(feat_dim)
    u = rng.uniform(-bound, bound, size=feat_dim).astype(np.float32)
    return ScorerParams(w=jnp.asarray(w), u=jnp.asarray(u))


def reinitialize_scorer_weights(
    rng: np.random.Generator,
    prev_w: np.ndarray,
    frozen_mask: np.ndarray,
) -> np.ndarray:
    """Restart re-init (reference reinitialize_weights, main.py:499-516):
    frozen destinations keep their previous weight, everything else U(0,1)."""
    w = rng.uniform(0.0, 1.0, size=len(prev_w)).astype(np.float32)
    w[frozen_mask] = prev_w[frozen_mask]
    return w


def scorer_forward_flat(
    params: ScorerParams,
    nbr: jax.Array,        # [N, D] ELL destinations for this relation
    nbr_mask: jax.Array,   # [N, D]
    source_idx: jax.Array, # [S] nodes whose predictions enter the loss
    source_mask: jax.Array,# [S] valid-source mask (padding rows False)
) -> Tuple[jax.Array, jax.Array]:
    """Flat (hop-0) forward. Returns (pred [S], winner [N]).

    pred follows model.py:74-89: the max neighbor weight for sources that
    have edges of this relation, 0 otherwise (torch.zeros base at :79).
    ``winner`` is the argmax destination per node (first occurrence on ties,
    matching torch.argmax over adjacency-list order)."""
    vals = params.w[nbr]
    vals = jnp.where(nbr_mask, vals, -jnp.inf)
    j = jnp.argmax(vals, axis=-1)
    winner = jnp.take_along_axis(nbr, j[..., None], axis=-1)[..., 0]
    has_edge = jnp.any(nbr_mask, axis=-1)
    value = jnp.where(has_edge, params.w[winner], 0.0)
    pred = value[source_idx] * source_mask
    return pred, winner


def scorer_forward_bags(
    params: ScorerParams,
    x: jax.Array,            # [N, F] node features
    nbr: jax.Array,          # [N, D]
    nbr_mask: jax.Array,     # [N, D]
    bags: jax.Array,         # [B, M] member node ids (padded)
    member_mask: jax.Array,  # [B, M] member valid AND has r-edges
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Bag-mode forward (model.py:45-72).

    Returns (bag_pred [B], bag_winner_dst [B], member_value [N],
    member_winner_dst [N]):
      member_value[s] = max_d w[nbr[s,d]] * (x[s] . u)  (0 where no edges)
      bag_pred[b]     = max over valid members of member_value
      bag_winner_dst  = argmax destination of the bag's winning member
    """
    lin = x @ params.u                               # [N] LinearLayerAttri
    prod = params.w[nbr] * lin[:, None]              # [N, D] products
    prod = jnp.where(nbr_mask, prod, -jnp.inf)
    j = jnp.argmax(prod, axis=-1)                    # first occurrence
    member_winner = jnp.take_along_axis(nbr, j[..., None], axis=-1)[..., 0]
    member_val_raw = params.w[member_winner] * lin   # value at argmax index
    has_edge = jnp.any(nbr_mask, axis=-1)
    member_value = jnp.where(has_edge, member_val_raw, 0.0)

    vals = member_value[bags]                        # [B, M]
    vals = jnp.where(member_mask, vals, -jnp.inf)
    m = jnp.argmax(vals, axis=-1)
    bag_member = jnp.take_along_axis(bags, m[..., None], axis=-1)[..., 0]
    bag_winner = member_winner[bag_member]
    any_member = jnp.any(member_mask, axis=-1)
    bag_pred = jnp.where(
        any_member,
        jnp.take_along_axis(vals, m[..., None], axis=-1)[..., 0],
        0.0,
    )
    return bag_pred, bag_winner, member_value, member_winner


def clamp_params(
    params: ScorerParams, lo: float = 0.0, hi: float = 1.0
) -> ScorerParams:
    """Post-step projection (main.py:667-669): clamp node weights AND the
    attribution vector to [0, 1]."""
    return ScorerParams(
        w=jnp.clip(params.w, lo, hi), u=jnp.clip(params.u, lo, hi)
    )


def apply_freeze(
    params: ScorerParams,
    frozen_mask: Optional[jax.Array],
    frozen_values: Optional[jax.Array],
) -> ScorerParams:
    """Restore frozen destination weights after an optimizer step
    (main.py:670-672)."""
    if frozen_mask is None:
        return params
    return params._replace(
        w=jnp.where(frozen_mask, frozen_values, params.w)
    )
