"""Scatter-free SpMM via block-local one-hot matmuls.

The XLA ``segment`` backend lowers scatter-adds, which serialize on TPU.
This module eliminates scatters with the block-local one-hot-matmul trick:
edges are pre-sorted by target row and partitioned into row blocks of ``BM``
rows with a per-block padded edge budget ``EB``; aggregation is then

  1. an XLA row gather of the needed feature rows, and
  2. ONE batched MXU matmul against the precomputed block one-hot incidence
     ``[nb, BM, EB]`` (the mean's 1/deg folded into the weights).

The backward pass is the transposed SpMM ``dh[dst] += g[src] / deg[src]`` —
the same computation on an edge blocking sorted by destination, so no
scatter appears in either direction (custom VJP). Blockings are built
host-side once per relation (``build_spmm_blocking``).

(A VMEM-gather Pallas variant was prototyped but Mosaic does not lower
dynamic row gathers from refs; the fused Pallas conv kernel lives in
ops/pallas_conv.py instead.)
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

class SpmmBlocking(NamedTuple):
    """Host-built static blocking of one relation's edges, rows = aggregation
    targets. ``fwd``: rows are edge sources; ``bwd``: rows are destinations
    (with the per-edge 1/deg_src weight folded into ``weight``)."""

    dst: jax.Array        # [num_blocks, EB] gather indices (feature rows)
    local_row: jax.Array  # [num_blocks, EB] target row within the block
    weight: jax.Array     # [num_blocks, EB] f32 edge weight (0 for padding)
    incidence: jax.Array  # [num_blocks, BM, EB] one-hot-with-weight blocks
    num_rows: int         # unpadded target-row count
    block_rows: int       # BM


def _build_one_side(
    rows: np.ndarray, cols: np.ndarray, weights: np.ndarray,
    num_rows: int, block_rows: int, lane: int = 128,
) -> SpmmBlocking:
    order = np.argsort(rows, kind="stable")
    rows, cols, weights = rows[order], cols[order], weights[order]
    nb = -(-max(num_rows, 1) // block_rows)
    block_of = rows // block_rows
    counts = np.bincount(block_of, minlength=nb)
    eb = int(counts.max()) if len(counts) else 1
    eb = max(lane, -(-eb // lane) * lane)
    dst = np.zeros((nb, eb), dtype=np.int32)
    local = np.zeros((nb, eb), dtype=np.int32)
    wt = np.zeros((nb, eb), dtype=np.float32)
    offsets = np.zeros(nb + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    for b in range(nb):
        s, e = offsets[b], offsets[b + 1]
        n = e - s
        dst[b, :n] = cols[s:e]
        local[b, :n] = rows[s:e] - b * block_rows
        wt[b, :n] = weights[s:e]
    # 3D layout [nb, eb/lane, lane]: Pallas TPU block shapes must have their
    # last two dims tile-compatible; per-step blocks of (1, eb/lane, lane)
    # satisfy the "equal to the overall dims" escape.
    # eager one-hot incidence (device array built OUTSIDE any trace, so
    # jitted users never capture trace-time temporaries)
    inc = (local[:, None, :] == np.arange(block_rows)[None, :, None]) * wt[:, None, :]
    dst = dst.reshape(nb, eb // lane, lane)
    local = local.reshape(nb, eb // lane, lane)
    wt = wt.reshape(nb, eb // lane, lane)
    return SpmmBlocking(
        dst=jnp.asarray(dst), local_row=jnp.asarray(local),
        weight=jnp.asarray(wt), incidence=jnp.asarray(inc, dtype=jnp.float32),
        num_rows=num_rows, block_rows=block_rows,
    )


def build_spmm_blocking(
    src: np.ndarray, dst: np.ndarray, num_nodes: int, block_rows: int = 128
) -> Tuple[SpmmBlocking, SpmmBlocking]:
    """(forward, backward) blockings for one relation.

    Forward computes mean over out-edges into source rows; weights are
    1/deg(src). Backward computes dh[d] = sum over edges (s->d) of
    g[s]/deg(s) — same weights, rows/cols swapped."""
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    deg = np.bincount(src, minlength=num_nodes).astype(np.float32)
    w = 1.0 / np.maximum(deg, 1.0)
    ew = w[src]
    fwd = _build_one_side(src, dst.astype(np.int64), ew, num_nodes, block_rows)
    bwd = _build_one_side(dst, src, ew, num_nodes, block_rows)
    return fwd, bwd


# ------------------------------------------------- XLA one-hot block backend
@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def onehot_spmm_mean(fwd: SpmmBlocking, bwd: SpmmBlocking, h: jax.Array):
    """Scatter-free mean aggregation in pure XLA with the same blocking as
    the Pallas kernel: XLA row-gather + precomputed block one-hot incidence
    + batched MXU matmul. The backward pass uses the transposed blocking, so
    neither direction lowers a scatter (XLA TPU scatters serialize)."""
    return _onehot_apply(fwd, h)


def _onehot_apply(blocking: SpmmBlocking, h: jax.Array) -> jax.Array:
    onehot = blocking.incidence
    nb = blocking.dst.shape[0]
    eb = blocking.dst.shape[1] * blocking.dst.shape[2]
    idx = blocking.dst.reshape(nb * eb)
    gathered = h[idx].reshape(nb, eb, h.shape[1])
    out = jnp.einsum(
        "bme,bef->bmf", onehot, gathered, preferred_element_type=jnp.float32
    )
    return out.reshape(nb * blocking.block_rows, h.shape[1])[: blocking.num_rows]


def _onehot_fwd(fwd, bwd, h):
    return _onehot_apply(fwd, h), None


def _onehot_bwd(fwd, bwd, _res, g):
    return (_onehot_apply(bwd, g),)


onehot_spmm_mean.defvjp(_onehot_fwd, _onehot_bwd)


def ref_mean(h: jax.Array, src, dst, num_nodes: int) -> jax.Array:
    """XLA reference for testing."""
    tot = jax.ops.segment_sum(h[dst], src, num_segments=num_nodes)
    cnt = jax.ops.segment_sum(jnp.ones_like(src, jnp.float32), src, num_segments=num_nodes)
    return tot / jnp.maximum(cnt, 1.0)[:, None]
