"""Pallas TPU kernels: fused relation-masked mean aggregation (SpMM).

The XLA ``segment`` backend lowers scatter-adds, which serialize on TPU.
This kernel eliminates scatters entirely with the block-local one-hot-matmul
trick: edges are pre-sorted by source row and partitioned into row blocks of
``BM`` rows with a per-block padded edge budget ``EB``; each grid step

  1. gathers the needed feature rows from the full ``h`` resident in VMEM
     (dynamic row gather, VMEM-speed),
  2. builds the block-local one-hot incidence ``[BM, EB]`` on the fly
     (local_row iota == edge local row, masked), and
  3. reduces with ONE MXU matmul ``onehot @ gathered -> [BM, F]``,
     then normalizes by precomputed degrees (mean; zero rows for
     degree-0 sources).

The backward pass is the transposed SpMM ``dh[dst] += g[src] / deg[src]`` —
the same kernel applied to an edge blocking sorted by destination, so no
scatter appears in either direction (custom VJP).

Everything is static-shaped; blockings are built host-side once per
relation (``build_spmm_blocking``).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


class SpmmBlocking(NamedTuple):
    """Host-built static blocking of one relation's edges, rows = aggregation
    targets. ``fwd``: rows are edge sources; ``bwd``: rows are destinations
    (with the per-edge 1/deg_src weight folded into ``weight``)."""

    dst: jax.Array        # [num_blocks, EB] gather indices (feature rows)
    local_row: jax.Array  # [num_blocks, EB] target row within the block
    weight: jax.Array     # [num_blocks, EB] f32 edge weight (0 for padding)
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
    dst = dst.reshape(nb, eb // lane, lane)
    local = local.reshape(nb, eb // lane, lane)
    wt = wt.reshape(nb, eb // lane, lane)
    return SpmmBlocking(
        dst=jnp.asarray(dst), local_row=jnp.asarray(local),
        weight=jnp.asarray(wt), num_rows=num_rows, block_rows=block_rows,
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


def _spmm_kernel(dst_ref, local_ref, w_ref, h_ref, out_ref, *, block_rows):
    idx = dst_ref[0].reshape(-1)                          # [EB]
    gathered = jnp.take(h_ref[...], idx, axis=0)          # [EB, F] VMEM gather
    eb = idx.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (block_rows, eb), 0)
    local = local_ref[0].reshape(-1)
    w = w_ref[0].reshape(-1)
    onehot = jnp.where(rows == local[None, :], w[None, :], 0.0)  # [BM, EB]
    out_ref[:, :] = jnp.dot(
        onehot, gathered, preferred_element_type=jnp.float32
    )


def _spmm_apply(blocking: SpmmBlocking, h: jax.Array, interpret: bool) -> jax.Array:
    nb, sub, lane = blocking.dst.shape
    bm = blocking.block_rows
    n_pad = nb * bm
    f = h.shape[1]
    out = pl.pallas_call(
        functools.partial(_spmm_kernel, block_rows=bm),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, sub, lane), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sub, lane), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sub, lane), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),      # full h
        ],
        out_specs=pl.BlockSpec((bm, f), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, f), jnp.float32),
        interpret=interpret,
    )(blocking.dst, blocking.local_row, blocking.weight, h)
    return out[: blocking.num_rows]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def pallas_spmm_mean(
    fwd: SpmmBlocking, bwd: SpmmBlocking, interpret: bool, h: jax.Array
) -> jax.Array:
    """Fused mean aggregation: out[i] = mean over edges (i, d) of h[d].

    Scatter-free in both directions (see module docstring). ``interpret``
    runs the kernels in Pallas interpreter mode (CPU tests)."""
    return _spmm_apply(fwd, h, interpret)


def _pallas_fwd(fwd, bwd, interpret, h):
    return _spmm_apply(fwd, h, interpret), None


def _pallas_bwd(fwd, bwd, interpret, _res, g):
    return (_spmm_apply(bwd, g, interpret),)


pallas_spmm_mean.defvjp(_pallas_fwd, _pallas_bwd)


# ------------------------------------------------- XLA one-hot block backend
@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def onehot_spmm_mean(fwd: SpmmBlocking, bwd: SpmmBlocking, h: jax.Array):
    """Scatter-free mean aggregation in pure XLA with the same blocking as
    the Pallas kernel: XLA row-gather + precomputed block one-hot incidence
    + batched MXU matmul. The backward pass uses the transposed blocking, so
    neither direction lowers a scatter (XLA TPU scatters serialize)."""
    return _onehot_apply(fwd, h)


def _onehot_incidence(blocking: SpmmBlocking) -> jax.Array:
    """[nb, BM, EB] one-hot-with-weights incidence, cached on the blocking's
    weight array object."""
    nb = blocking.dst.shape[0]
    eb = blocking.dst.shape[1] * blocking.dst.shape[2]
    bm = blocking.block_rows
    local = np.asarray(blocking.local_row).reshape(nb, eb)
    w = np.asarray(blocking.weight).reshape(nb, eb)
    rows = np.arange(bm)[None, :, None]
    onehot = (local[:, None, :] == rows) * w[:, None, :]
    return jnp.asarray(onehot, dtype=jnp.float32)


_INCIDENCE_CACHE: dict = {}


def _onehot_apply(blocking: SpmmBlocking, h: jax.Array) -> jax.Array:
    key = id(blocking.weight)
    if key not in _INCIDENCE_CACHE:
        # keep the blocking alive in the cache entry so the id() key can
        # never be recycled while the incidence is cached
        _INCIDENCE_CACHE[key] = (_onehot_incidence(blocking), blocking)
    onehot = _INCIDENCE_CACHE[key][0]
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
