"""Pallas sorted-CSR segment-mean — the MXU scatter replacement.

Measured on v5e (benchmarks/micro_agg.py, N=500k / E=10M / F=16):

    XLA row gather   x[dst]            65 ms    (9.8 GB/s of edge rows)
    XLA segment_sum  (sorted)         705 ms    (0.9 GB/s)   <- bottleneck
    HBM stream reference                        (358 GB/s)

XLA's scatter-add serializes on TPU; it is ~400x below the streaming
roofline and 10x worse than the (also slow) row gather. This kernel removes
the scatter entirely:

* rows are partitioned into blocks of ``BM``; edges are grouped
  contiguously by row block (intra-block edge order is by gather COLUMN —
  the kernel routes each edge by its own local row, so it is insensitive
  to intra-block order, and column order gives the XLA row gather
  block-monotonic HBM addresses; reference surface: torch_sparse SpMM,
  /root/reference/mp_rgcn_layer.py:277-279); each block's edge list is
  padded to a multiple of the edge-tile size ``ET`` so no tile straddles a
  block boundary (host build, static per relation);
* the grid walks edge tiles; a scalar-prefetched ``tile_block`` array
  (pltpu.PrefetchScalarGridSpec) routes each tile's output block, so the
  [BM, F] accumulator lives in VMEM across a block's consecutive tiles;
* each tile builds its one-hot incidence ``(iota == local_row) * weight``
  [BM, ET] ON THE FLY in VMEM (never materialized in HBM — the round-1
  ``ops/pallas_spmm`` XLA formulation stored it per block and paid GBs of
  HBM for it) and reduces with ONE MXU matmul ``onehot @ y_tile``;
* the mean's 1/deg is folded into the edge weights; zero-degree rows give
  zero (reference parity, mp_rgcn_layer.py:198).

The remaining row gather ``x[gidx]`` stays in XLA (a VMEM dynamic-row
gather is not lowerable by Mosaic; a DMA-per-row formulation was MEASURED
descriptor-bound in round 4 — ~35 ns/descriptor, 28.7 vs XLA's 157.7
Mrows/s at 512 B rows, and the ≥16-row contiguous runs that would make
batched descriptors win have mean length 1.01 in real blockings;
benchmarks/DMA_GATHER.json, docs/DESIGN.md). The backward pass is the
same kernel on a destination-sorted blocking — a custom VJP with no
scatter in either direction.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


import dataclasses


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class CsrBlocking:
    """Host-built static blocking of one relation's edges for one direction.

    Edges are grouped contiguously by row block (``rows // BM``
    non-decreasing); WITHIN a block they are ordered by gather column, not
    by row — each row block of ``BM`` owns a contiguous, ET-padded span of
    the edge arrays. Empty blocks get one all-padding tile so every output
    block is visited (and zeroed). A pytree whose array leaves are jit
    ARGUMENTS while the layout ints (num_rows/block_rows/edge_tile) stay
    static."""

    gidx: jax.Array        # [EP+1] gather index (other endpoint; 0 for pads).
                           #   One trailing dummy: XLA's row gather drops to
                           #   ~92 Mrows/s (from ~203) when the index count
                           #   sits at certain residues mod 2048 — 0, 1024,
                           #   2047 all measured slow, +1 measured fast —
                           #   and the ET-padded edge count is ALWAYS a 2048
                           #   multiple; gathering EP+1 rows and slicing the
                           #   first EP costs nothing (the slice fuses) and
                           #   keeps the fast path (probe, v5e, 2026-08)
    local: jax.Array       # [T, SUB, LANE] target row in-block (0 for pads)
    weight: jax.Array      # [EP] f32 edge weight (0 for pads) — folded into
                           #      the gathered rows OUTSIDE the kernel (XLA
                           #      fuses it into the gather stream), keeping
                           #      the in-kernel one-hot an EXACT 0/1 bf16
    tile_block: jax.Array  # [T] output block id per edge tile
    num_rows: int          # unpadded target-row count
    block_rows: int        # BM
    edge_tile: int         # ET

    def tree_flatten(self):
        children = (self.gidx, self.local, self.weight, self.tile_block)
        return children, (self.num_rows, self.block_rows, self.edge_tile)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)


# Mosaic block shapes must have their last two dims (8, 128)-aligned: edge
# tiles are therefore [SUB, LANE] 2D panels of ET = 1024 edges.
_SUB, _LANE = 16, 128
_ET = _SUB * _LANE


def _build_one_direction(
    rows: np.ndarray, cols: np.ndarray, weights: np.ndarray,
    num_rows: int, bm: int, et: int = _ET,
    num_gather_rows: int | None = None,
) -> CsrBlocking:
    """``num_gather_rows``: length of the array ``gidx`` will gather from
    (= the valid index range for pad spreading). Defaults to ``num_rows``,
    which is exact for square blockings; RECTANGULAR blockings must pass it
    (the output row space and the gather source differ — an earlier
    revision spread pads modulo ``num_rows`` there, silently relying on
    XLA's out-of-bounds clamp + zero weight, and collapsing every clamped
    pad read onto the last row's HBM channel)."""
    assert et == _ET, "edge tile is fixed by the TPU tile shape"
    if num_gather_rows is None:
        num_gather_rows = num_rows
    # primary sort: row block (each block owns a contiguous edge span);
    # secondary: COLUMN — the kernel is insensitive to edge order inside a
    # block (the one-hot routes each edge by its own local row), so ordering
    # by gather address turns the XLA row gather's access pattern from
    # random into block-monotonic, which is what HBM burst locality wants
    from mpgnn_tpu.native import sort_block_col

    order = sort_block_col(rows, cols, bm)
    rows, cols, weights = rows[order], cols[order], weights[order]
    nb = max(1, -(-num_rows // bm))
    counts = np.bincount(rows // bm, minlength=nb)
    padded = np.maximum(-(-counts // et), 1) * et   # >=1 tile per block
    offsets = np.zeros(nb + 1, dtype=np.int64)
    np.cumsum(padded, out=offsets[1:])
    ep = int(offsets[-1])
    # +1 length: see CsrBlocking.gidx. Pad slots carry weight 0, so their
    # gather VALUE is free — spread them over the row space instead of all
    # hitting row 0 (2M pad reads of one row serialize on one HBM channel;
    # measured ~12% of the whole gather at 20% padding)
    gidx = (np.arange(ep + 1, dtype=np.int64)
            % max(num_gather_rows, 1)).astype(np.int32)
    local = np.zeros(ep, dtype=np.int32)
    wt = np.zeros(ep, dtype=np.float32)
    src_off = np.zeros(nb + 1, dtype=np.int64)
    np.cumsum(counts, out=src_off[1:])
    # vectorized fill: position of edge i = offsets[b(i)] + rank within block
    b_of = rows // bm
    pos = offsets[b_of] + (np.arange(len(rows)) - src_off[b_of])
    gidx[pos] = cols
    local[pos] = rows - b_of * bm
    wt[pos] = weights
    t = ep // et
    tile_block = np.repeat(np.arange(nb, dtype=np.int32), padded // et)
    return CsrBlocking(
        gidx=jnp.asarray(gidx),
        local=jnp.asarray(local.reshape(t, _SUB, _LANE)),
        weight=jnp.asarray(wt),
        tile_block=jnp.asarray(tile_block),
        num_rows=num_rows,
        block_rows=bm,
        edge_tile=et,
    )


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class DedupCsrBlocking:
    """Unique-column ("dedup") tile blocking — the gather-volume attack for
    SKEWED graphs (VERDICT r4 item 5 / benchmarks/TILE_DENSITY.json).

    On power-law relations, many edges of one row block repeat the same
    gather column (a hub destination): measured unique-(row-block, col)
    ratios are 3.6-10x on the shipped KGs at 512-row blocks, while uniform
    graphs sit at ~1.07 (the dense-tile path's negative result — see
    docs/DESIGN.md). Since the XLA row gather is ISSUE-RATE bound
    (~201 Mrows/s regardless of pattern), gathering each tile's UNIQUE
    columns once and fanning them out to edges on the MXU divides the
    dominant gather cost by that ratio:

      gathered[e] = (onehot_u[ucol] @ y_uniq)[e]   # in-VMEM MXU "gather"
      out[block] += onehot_row[local] @ gathered   # the classic reduction

    Both one-hots are exact 0/1 bf16, so precision matches the classic
    kernel. The mean's per-edge weight 1/deg(src) never enters the kernel:
    it depends only on the forward's OUT row (post-scale [N] outside) and
    the backward's GATHER row (pre-scale of g outside) — both fuse into
    XLA elementwise ops. Pad edges carry ucol = U (out of the iota range),
    so their one-hot column is all-zero; pad unique slots are referenced
    by no edge, so their gathered garbage never lands."""

    gidx: jax.Array        # [T*U + 1] unique gather cols per tile (+1: the
                           #   anti-mod-2048 dummy, see CsrBlocking.gidx)
    ucol: jax.Array        # [T, SUB, LANE] per-edge unique slot, U for pads
    local: jax.Array       # [T, SUB, LANE] target row in-block (0 for pads)
    tile_block: jax.Array  # [T] output block id per edge tile
    scale: jax.Array       # [num_rows] post-scale (fwd: 1/deg of out rows)
                           #   or [num_gather_rows] pre-scale (bwd)
    num_rows: int
    block_rows: int
    edge_tile: int
    uniq: int              # U: unique slots per tile
    scale_is_pre: bool     # True: scale the gathered operand (bwd mode)

    def tree_flatten(self):
        children = (self.gidx, self.ucol, self.local, self.tile_block,
                    self.scale)
        return children, (self.num_rows, self.block_rows, self.edge_tile,
                          self.uniq, self.scale_is_pre)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)


_UNIQ = 512   # unique slots per tile: at most ET/_UNIQ = 4x gather savings


def _build_one_direction_dedup(
    rows: np.ndarray, cols: np.ndarray, scale: np.ndarray,
    num_rows: int, bm: int, scale_is_pre: bool,
    num_gather_rows: int | None = None, et: int = _ET, u: int = _UNIQ,
) -> DedupCsrBlocking:
    """Tile packing: within each row block (edges sorted by gather column,
    the classic order) cut a tile when it reaches ``et`` edges OR ``u``
    distinct columns — so every tile's unique list fits its [u] gather
    slot. Columns may straddle a cut (they then appear in both tiles'
    unique lists; correctness is unaffected)."""
    if num_gather_rows is None:
        num_gather_rows = num_rows
    from mpgnn_tpu.native import sort_block_col

    order = sort_block_col(rows, cols, bm)
    rows, cols = rows[order], cols[order]
    nb = max(1, -(-num_rows // bm))
    counts = np.bincount(rows // bm, minlength=nb)
    offsets = np.zeros(nb + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    # new-column flags + cumulative distinct count per block
    new_col = np.ones(len(rows), dtype=np.int64)
    if len(rows):
        same = (rows[1:] // bm == rows[:-1] // bm) & (cols[1:] == cols[:-1])
        new_col[1:] = ~same
    cum_new = np.cumsum(new_col)

    tiles = []          # (block, lo, hi) edge spans
    for b in range(nb):
        lo, hi = int(offsets[b]), int(offsets[b + 1])
        if lo == hi:
            tiles.append((b, lo, lo))       # empty block: one all-pad tile
            continue
        pos = lo
        while pos < hi:
            # distinct columns the tile [pos, end) will hold, counting the
            # edge at pos as NEW even when its column straddles the
            # previous cut (np.unique sees it as a fresh column either
            # way): cnt(j) = cum_new[j] - (cum_new[pos] - 1)
            base = cum_new[pos] - 1
            end_u = int(np.searchsorted(cum_new[pos:hi], base + u,
                                        side="right")) + pos
            end = min(pos + et, max(end_u, pos + 1), hi)
            tiles.append((b, pos, end))
            pos = end
    t = len(tiles)
    gidx = (np.arange(t * u + 1, dtype=np.int64)
            % max(num_gather_rows, 1)).astype(np.int32)
    ucol = np.full((t, et), u, dtype=np.int32)       # u = masked-out pads
    local = np.zeros((t, et), dtype=np.int32)
    tile_block = np.empty(t, dtype=np.int32)
    for i, (b, lo, hi) in enumerate(tiles):
        tile_block[i] = b
        n = hi - lo
        if n == 0:
            continue
        c = cols[lo:hi]
        uniq, inv = np.unique(c, return_inverse=True)
        # a silent overflow here would corrupt the NEXT tile's slots
        assert len(uniq) <= u, (len(uniq), u, i)
        gidx[i * u: i * u + len(uniq)] = uniq
        ucol[i, :n] = inv
        local[i, :n] = rows[lo:hi] - b * bm
    return DedupCsrBlocking(
        gidx=jnp.asarray(gidx),
        ucol=jnp.asarray(ucol.reshape(t, _SUB, _LANE)),
        local=jnp.asarray(local.reshape(t, _SUB, _LANE)),
        tile_block=jnp.asarray(tile_block),
        scale=jnp.asarray(scale.astype(np.float32)),
        num_rows=num_rows, block_rows=bm, edge_tile=et, uniq=u,
        scale_is_pre=scale_is_pre,
    )


def dedup_ratio(rows: np.ndarray, cols: np.ndarray, bm: int) -> float:
    """Edges per unique (row-block, col) pair — the gather-volume savings
    the dedup blocking can harvest (capped at ET/U = 4x by the tile
    shape)."""
    if len(rows) == 0:
        return 1.0
    key = (np.asarray(rows) // bm).astype(np.int64) * (
        int(np.asarray(cols).max()) + 1
    ) + np.asarray(cols)
    return float(len(rows) / max(len(np.unique(key)), 1))


def _auto_bm(num_rows: int, num_edges: int) -> int:
    """Row-block size targeting ~2 edge tiles per block: the in-kernel
    one-hot build costs VPU work proportional to BM per tile, while small
    BM inflates per-block padding — aim between."""
    if num_edges <= 0:
        return 256
    target = 2 * _ET * num_rows / num_edges
    bm = 1 << max(7, int(np.ceil(np.log2(max(target, 1)))))
    return int(min(bm, 2048))


import os as _os

# a direction routes to the dedup blocking when its (row-block, col)
# repetition clears this ratio: below it the 4x-capped gather savings do
# not pay for the extra in-kernel fanout matmul
_DEDUP_MIN_RATIO = float(_os.environ.get("MPGNN_DEDUP_MIN_RATIO", 2.0))


def build_csr_blocking(
    src: np.ndarray, dst: np.ndarray, num_nodes: int,
    bm: int | None = None, et: int = _ET, dedup: str = "auto",
) -> Tuple[CsrBlocking, CsrBlocking]:
    """(forward, backward) blockings for one relation's mean aggregation.

    Forward rows are edge sources (mean over out-edges, weights 1/deg(src));
    backward rows are destinations with the same per-edge weight —
    ``dx[d] = sum over edges (s->d) of g[s]/deg(s)``.

    ``dedup='auto'`` routes each direction to the unique-column tile
    blocking (``DedupCsrBlocking``) when its measured (row-block, col)
    repetition ratio clears ``_DEDUP_MIN_RATIO`` — the hub-skew gather
    attack (power-law KGs measure 3.6-10x; uniform graphs ~1.07 and keep
    the classic kernel). 'never' / 'always' force a side."""
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    bm = bm or _auto_bm(num_nodes, len(src))
    deg = np.bincount(src, minlength=num_nodes).astype(np.float32)
    inv = (1.0 / np.maximum(deg, 1.0)).astype(np.float32)
    ew = inv[src]

    bm_dedup = min(bm, 1024)

    def want(rows, cols):
        if dedup == "never" or len(src) == 0:
            return False
        if dedup == "always":
            return True
        return dedup_ratio(rows, cols, bm_dedup) >= _DEDUP_MIN_RATIO

    # the dedup kernel holds BOTH one-hots in VMEM ([U, ET] + [bm, ET]
    # bf16) on top of the [bm, f] accumulator: at bm=2048 and wide padded
    # feature dims the scoped-VMEM budget (16 MB) overflows (measured:
    # f=186 fb15k eval, 16.77M demanded). bm<=1024 keeps the worst case
    # ~8.5 MB; the routing ratio above is measured at the same bm.
    bm_d = bm_dedup
    if want(src, dst):
        fwd = _build_one_direction_dedup(
            src, dst, inv, num_nodes, bm_d, scale_is_pre=False, et=et
        )
    else:
        fwd = _build_one_direction(src, dst, ew, num_nodes, bm, et)
    if want(dst, src):
        bwd = _build_one_direction_dedup(
            dst, src, inv, num_nodes, bm_d, scale_is_pre=True, et=et
        )
    else:
        bwd = _build_one_direction(dst, src, ew, num_nodes, bm, et)
    return fwd, bwd


def _scatter_kernel(bm: int, et: int, split_f32: bool):
    def kernel(tb_ref, local_ref, y_ref, out_ref):
        t = pl.program_id(0)
        prev = tb_ref[jnp.maximum(t - 1, 0)]
        fresh = jnp.logical_or(t == 0, prev != tb_ref[t])

        @pl.when(fresh)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        # one EXACT 0/1 bf16 one-hot [bm, ET] built on the fly in VMEM
        # (edge weights were folded into y by the caller); the tile reduces
        # with bf16 MXU matmuls — f32 operands are split hi/lo into two
        # bf16 passes (~1e-6 relative), which measured ~6x faster than
        # Precision.HIGHEST's six passes of narrow [*, F] matmuls
        rows = jax.lax.broadcasted_iota(jnp.int32, (bm, et), 0)
        locals_row = jnp.concatenate(
            [local_ref[0, s, :][None, :] for s in range(_SUB)], axis=1
        )                                             # [1, ET]
        onehot = (rows == locals_row).astype(jnp.bfloat16)
        y = y_ref[:]
        if split_f32:
            hi = y.astype(jnp.bfloat16)
            lo = (y - hi.astype(jnp.float32)).astype(jnp.bfloat16)
            acc = jnp.dot(onehot, hi, preferred_element_type=jnp.float32)
            acc += jnp.dot(onehot, lo, preferred_element_type=jnp.float32)
        else:
            acc = jnp.dot(onehot, y, preferred_element_type=jnp.float32)
        out_ref[:] += acc.astype(out_ref.dtype)

    return kernel


@functools.lru_cache(maxsize=None)
def _scatter_call(t: int, nb: int, f: int, bm: int, et: int, dtype_name: str,
                  interpret: bool):
    dtype = jnp.dtype(dtype_name)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t,),
        in_specs=[
            pl.BlockSpec((1, _SUB, _LANE), lambda i, tb: (i, 0, 0)),
            pl.BlockSpec((et, f), lambda i, tb: (i, 0)),
        ],
        out_specs=pl.BlockSpec((bm, f), lambda i, tb: (tb[i], 0)),
    )
    kwargs = {}
    if not interpret:
        # consecutive tiles of one block accumulate into the SAME VMEM
        # output buffer — the grid dimension must stay sequential
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        )
    return pl.pallas_call(
        _scatter_kernel(bm, et, dtype == jnp.float32),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb * bm, f), dtype),
        interpret=interpret,
        **kwargs,
    )


def _dedup_kernel(bm: int, et: int, u: int, split_f32: bool):
    def kernel(tb_ref, local_ref, ucol_ref, y_ref, out_ref):
        t = pl.program_id(0)
        prev = tb_ref[jnp.maximum(t - 1, 0)]
        fresh = jnp.logical_or(t == 0, prev != tb_ref[t])

        @pl.when(fresh)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        # input-side one-hot [U, ET]: fans each tile's unique gathered rows
        # out to its edges on the MXU (pad edges carry ucol = U -> all-zero
        # column). One-hot @ y is row SELECTION, so casting the f32 result
        # back to bf16 between the two matmuls is exact (values are the
        # bf16 hi/lo parts themselves) — precision matches the classic
        # kernel's hi/lo split.
        ucols_row = jnp.concatenate(
            [ucol_ref[0, s, :][None, :] for s in range(_SUB)], axis=1
        )                                             # [1, ET]
        uio = jax.lax.broadcasted_iota(jnp.int32, (u, et), 0)
        oh_in = (uio == ucols_row).astype(jnp.bfloat16)
        rows = jax.lax.broadcasted_iota(jnp.int32, (bm, et), 0)
        locals_row = jnp.concatenate(
            [local_ref[0, s, :][None, :] for s in range(_SUB)], axis=1
        )
        oh_out = (rows == locals_row).astype(jnp.bfloat16)
        contract = (((0,), (0,)), ((), ()))           # share the u axis

        def fanout_reduce(part):                      # part: [U, F] bf16
            g = jax.lax.dot_general(
                oh_in, part, contract,
                preferred_element_type=jnp.float32,
            ).astype(jnp.bfloat16)                    # exact: row selection
            return jnp.dot(oh_out, g, preferred_element_type=jnp.float32)

        y = y_ref[:]
        if split_f32:
            hi = y.astype(jnp.bfloat16)
            lo = (y - hi.astype(jnp.float32)).astype(jnp.bfloat16)
            acc = fanout_reduce(hi) + fanout_reduce(lo)
        else:
            acc = fanout_reduce(y)
        out_ref[:] += acc.astype(out_ref.dtype)

    return kernel


@functools.lru_cache(maxsize=None)
def _dedup_call(t: int, nb: int, f: int, bm: int, et: int, u: int,
                dtype_name: str, interpret: bool):
    dtype = jnp.dtype(dtype_name)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t,),
        in_specs=[
            pl.BlockSpec((1, _SUB, _LANE), lambda i, tb: (i, 0, 0)),
            pl.BlockSpec((1, _SUB, _LANE), lambda i, tb: (i, 0, 0)),
            pl.BlockSpec((u, f), lambda i, tb: (i, 0)),
        ],
        out_specs=pl.BlockSpec((bm, f), lambda i, tb: (tb[i], 0)),
    )
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        )
    return pl.pallas_call(
        _dedup_kernel(bm, et, u, dtype == jnp.float32),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb * bm, f), dtype),
        interpret=interpret,
        **kwargs,
    )


def _dedup_apply(blk: DedupCsrBlocking, x: jax.Array) -> jax.Array:
    """Full dedup-path aggregation: (optional pre-scale) -> unique-col
    gather -> fanout/reduce kernel -> (optional post-scale) -> slice."""
    f = x.shape[-1]
    if blk.scale_is_pre:
        x = x * blk.scale[:, None]
    fp = _gather_cols(f, x.dtype)
    if fp != f:
        x = jnp.pad(x, ((0, 0), (0, fp - f)))
    tu = blk.gidx.shape[0] - 1
    y = x[blk.gidx][:tu]                     # [T*U, fp] unique rows only
    t = blk.local.shape[0]
    nb = max(1, (blk.num_rows + blk.block_rows - 1) // blk.block_rows)
    interpret = jax.devices()[0].platform != "tpu"
    call = _dedup_call(t, nb, fp, blk.block_rows, blk.edge_tile, blk.uniq,
                       str(y.dtype), interpret)
    out = call(blk.tile_block, blk.local, blk.ucol, y)[: blk.num_rows]
    if not blk.scale_is_pre:
        out = out * blk.scale[:, None]
    return out[:, :f]


def _segment_apply(blk: CsrBlocking, y: jax.Array) -> jax.Array:
    """Scatter-free segment reduction of pre-gathered edge rows ``y``
    [EP, F] into [num_rows, F] (weights already folded)."""
    t = blk.local.shape[0]
    f = y.shape[-1]
    nb = max(1, (blk.num_rows + blk.block_rows - 1) // blk.block_rows)
    interpret = jax.devices()[0].platform != "tpu"
    call = _scatter_call(
        t, nb, f, blk.block_rows, blk.edge_tile, str(y.dtype), interpret
    )
    out = call(blk.tile_block, blk.local, y)
    return out[: blk.num_rows]


def _gather_cols(f: int, dtype) -> int:
    """Column count the row gather should run at.

    Measured on v5e (benchmarks/GATHER_ROOFLINE.json): XLA's random row
    gather is ISSUE-RATE bound — ~201 Mrows/s for >=256-byte rows at any
    index pattern — but rows below 64 B and at exactly 128 B hit
    pathological lowerings (32 B rows: 63 M edge-visits/s at the model
    level; 128 B: 25-43 Mrows/s). Zero-padding those widths up to 256 B
    makes the gather FASTER in absolute wall time (bf16 F=16: 158.8 ->
    85.5 ms measured) even though it reads more bytes; the one-hot MXU
    reduction is lane-width-insensitive below 128 lanes, so the kernel
    cost is unchanged. Exactly-64 B rows already run a decent ~148-159
    Mrows/s path and padding them is a small net loss (F=16 f32 fwd+bwd:
    231.0 unpadded/round-2 indexing vs 237.3 padded) — but special-casing
    them under the EP+1 indexing measured WORSE still (242.0), so the
    uniform >=256 B rule ships and the ~3% F=16-f32 regression is
    accepted for the 2x wins at 32/128 B rows (docs/DESIGN.md §2)."""
    per = jnp.dtype(dtype).itemsize
    return max(f, -(-256 // per))


def _gather_weighted(blk: CsrBlocking, x: jax.Array) -> jax.Array:
    """y[e] = w[e] * x[gidx[e]] — XLA fuses the scale into the gather's
    output stream; padded edges have w = 0, so their gathered garbage
    vanishes here. Rows narrower than 256 bytes are zero-padded BEFORE the
    gather (see _gather_cols); the caller's kernel consumes the padded
    width and slices the output columns back."""
    f = x.shape[-1]
    fp = _gather_cols(f, x.dtype)
    if fp != f:
        x = jnp.pad(x, ((0, 0), (0, fp - f)))
    ep = blk.weight.shape[0]
    return x[blk.gidx][:ep] * blk.weight.astype(x.dtype)[:, None]


def _apply_direction(blk, x: jax.Array) -> jax.Array:
    """One direction of the aggregation, dispatching on the blocking kind
    (classic per-edge gather vs dedup unique-column tiles)."""
    if isinstance(blk, DedupCsrBlocking):
        return _dedup_apply(blk, x)
    return _segment_apply(blk, _gather_weighted(blk, x))[:, : x.shape[-1]]


@jax.custom_vjp
def csr_mean_aggregate(x: jax.Array, fwd: CsrBlocking, bwd: CsrBlocking):
    """out[s] = mean over edges (s, d) of x[d]; rows without edges -> 0.

    XLA row gather + Pallas block-one-hot MXU reduction in BOTH directions
    (the VJP runs the identical kernel on the destination-sorted blocking) —
    no scatter anywhere. The blockings enter as jit ARGUMENTS, not closure
    constants (a 10M-edge blocking is ~120 MB; embedded constants overflowed
    the remote-compile payload once already, docs/DESIGN.md §3). Feature
    rows narrower than 256 bytes run the gather AND the kernel zero-padded
    to 256 B (issue-rate-bound gather: wider rows are faster in wall time,
    _gather_cols) and slice back at the end. Either direction may be a
    ``DedupCsrBlocking`` (hub-skew gather dedup, build_csr_blocking)."""
    return _apply_direction(fwd, x)


def _csr_fwd(x, fwd, bwd):
    return _apply_direction(fwd, x), bwd


def _csr_bwd(bwd, g):
    return _apply_direction(bwd, g), None, None


csr_mean_aggregate.defvjp(_csr_fwd, _csr_bwd)


def make_csr_aggregate(fwd: CsrBlocking, bwd: CsrBlocking):
    """Closure-style convenience wrapper: ``agg(x) -> [N, F]``."""
    return lambda x: csr_mean_aggregate(x, fwd, bwd)


def build_rect_csr_blocking(
    rows: np.ndarray, cols: np.ndarray, weights: np.ndarray,
    num_rows: int, num_cols: int, bm: int | None = None,
) -> Tuple[CsrBlocking, CsrBlocking]:
    """(forward, backward) blockings for a RECTANGULAR weighted SpMM:
    ``out[r] = sum over edges (r, c) of w * x[c]`` with out [num_rows, F]
    and x [num_cols, F]. The square ``build_csr_blocking`` is the
    num_rows == num_cols, w = 1/deg special case; the rectangular form is
    what the node-sharded halo local aggregation needs (rows = local
    sources [S], cols = slots into concat(local block, halo) [S + H])."""
    rows = np.asarray(rows, dtype=np.int64)
    cols = np.asarray(cols, dtype=np.int64)
    weights = np.asarray(weights, dtype=np.float32)
    bm = bm or _auto_bm(max(num_rows, 1), len(rows))
    fwd = _build_one_direction(rows, cols, weights, num_rows, bm,
                               num_gather_rows=num_cols)
    bwd = _build_one_direction(cols, rows, weights, num_cols, bm,
                               num_gather_rows=num_rows)
    return fwd, bwd


# Batched (per-candidate) final-eval use: the eval program calls
# ``csr_mean_aggregate`` once per candidate under one jit (train/batch_eval's
# csr path). A vmapped form is unsupported (scalar-prefetched pallas_call),
# and a concatenated C-candidate blocking would DUPLICATE the edge arrays of
# every shared relation C times (~GBs at 10M edges x 30 candidates); the
# per-candidate calls instead pass the SAME per-relation blocking buffers
# for every candidate that aggregates that relation — zero extra HBM, and
# each call already carries a few-thousand-tile grid, so per-call overhead
# is noise. Reference surface: the final-eval fan-out, main.py:1444-1459.


def ref_mean(x, src, dst, num_nodes):
    """XLA segment reference for tests."""
    tot = jax.ops.segment_sum(x[dst], src, num_segments=num_nodes)
    cnt = jax.ops.segment_sum(
        jnp.ones_like(src, jnp.float32), src, num_segments=num_nodes
    )
    return tot / jnp.maximum(cnt, 1.0)[:, None]
