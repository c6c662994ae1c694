"""Relation-masked sparse aggregation — the per-relation SpMM.

Semantics (must match reference CustomRGCNConv, mp_rgcn_layer.py:158-279):
for the selected relation r, output row i is the MEAN of ``x[dst]`` over
edges ``(i, r, dst)`` (flow='target_to_source': aggregation into the *source*
column of link.dat), with a zero row when i has no r-edges.

Three interchangeable backends, all static-shaped and jittable:

* ``segment`` — gather ``x[dst]`` then masked segment-mean into src rows.
  General-purpose; scatter-add lowers to XLA sorted scatter on TPU.
* ``ell``     — padded neighbor-table (ELL) gather + masked mean over the
  degree axis. Fully dense/vectorized; best when max degree is bounded.
  Also the exact-parity path for the scorer's first-occurrence argmax.
* ``dense``   — precomputed normalized adjacency ``A_r [N, N]`` matmul.
  Turns the whole conv into MXU GEMMs; speed-of-light for graphs whose
  adjacency fits HBM (bench flagship).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mpgnn_tpu.ops.segment import masked_segment_mean


def rel_mean_aggregate(
    x: jax.Array,
    src: jax.Array,
    dst: jax.Array,
    num_nodes: int,
    mask: Optional[jax.Array] = None,
    indices_are_sorted: bool = False,
) -> jax.Array:
    """``segment`` backend: out[i] = mean_{(i,d) in edges} x[d].

    ``src``/``dst`` are one relation's (padded) edge endpoint arrays; padded
    entries are masked. Replaces PyG propagate + scatter-mean
    (mp_rgcn_layer.py:236, aggr='mean' at :98)."""
    if mask is None:
        mask = jnp.ones_like(src, dtype=bool)
    gathered = x[dst]
    return masked_segment_mean(
        gathered, src, mask, num_nodes, indices_are_sorted=indices_are_sorted
    )


def ell_mean_aggregate(
    x: jax.Array, nbr: jax.Array, nbr_mask: jax.Array
) -> jax.Array:
    """``ell`` backend: nbr [N, D] per-source neighbor ids, masked mean.

    out[i] = mean over valid d of x[nbr[i, d]]; rows with no valid
    neighbors -> 0."""
    gathered = x[nbr]                          # [N, D, F]
    m = nbr_mask.astype(x.dtype)[..., None]    # [N, D, 1]
    total = jnp.sum(gathered * m, axis=-2)
    count = jnp.maximum(jnp.sum(m, axis=-2), 1.0)
    return total / count


def ell_max_gather(
    w: jax.Array, nbr: jax.Array, nbr_mask: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Per-source max over neighbor weights + FIRST-occurrence argmax.

    The scorer primitive (model.py:74-89): for each source i,
    value = max_d w[nbr[i, d]], winner = nbr[i, argmax]. Masked rows give
    value -inf and winner nbr[i, 0]. ``w`` is [N] (or [N, 1] squeezed by the
    caller); returns (values [N], winner ids [N]). Gradient flows only
    through the selected max element, matching the reference's
    index-assignment autograd semantics."""
    vals = w[nbr]                              # [N, D]
    vals = jnp.where(nbr_mask, vals, -jnp.inf)
    j = jnp.argmax(vals, axis=-1)              # first occurrence on ties
    winner = jnp.take_along_axis(nbr, j[..., None], axis=-1)[..., 0]
    value = jnp.take_along_axis(vals, j[..., None], axis=-1)[..., 0]
    return value, winner


def dense_adjacency(
    src: np.ndarray,
    dst: np.ndarray,
    num_nodes: int,
    dtype=jnp.float32,
) -> Tuple[jax.Array, jax.Array]:
    """``dense`` backend precompute: row-normalized adjacency A with
    A[i, d] = multiplicity(i->d) / out_deg_r(i), so that A @ x equals the
    per-relation mean aggregation. Returns (A, A^T): the transpose is
    precomputed because materializing it inside the backward pass measured
    ~80x slower than the matmul itself on TPU (transpose of a large HBM
    array is bandwidth-hostile); with both resident, fwd and bwd are plain
    MXU GEMMs. Built host-side once per relation and cached."""
    a = np.zeros((num_nodes, num_nodes), dtype=np.float32)
    np.add.at(a, (np.asarray(src), np.asarray(dst)), 1.0)
    deg = a.sum(axis=1, keepdims=True)
    deg[deg == 0] = 1.0
    a /= deg
    return jnp.asarray(a, dtype=dtype), jnp.asarray(a.T.copy(), dtype=dtype)


@jax.custom_vjp
def dense_mean_aggregate(a: jax.Array, a_t: jax.Array, h: jax.Array) -> jax.Array:
    """Dense-backend aggregation ``A @ h`` with a transpose-free VJP:
    dh = A^T @ g uses the precomputed transpose, so the backward pass is a
    forward-speed GEMM instead of a transpose+GEMM."""
    return jnp.dot(a, h, preferred_element_type=h.dtype)


def _dense_fwd(a, a_t, h):
    return jnp.dot(a, h, preferred_element_type=h.dtype), a_t


def _dense_bwd(a_t, g):
    return None, None, jnp.dot(a_t, g, preferred_element_type=g.dtype)


dense_mean_aggregate.defvjp(_dense_fwd, _dense_bwd)
