"""Vmapped relation-scoring sweeps.

The reference scores each relation by training a tiny per-relation model in a
separate MPI process (`score_relation_parallel` main.py:727-760 fanned out at
main.py:1319-1328; `score_relation_bags_parallel` main.py:853-917 at
main.py:1400-1408), shipping pickled graphs between ranks. Here the relation
axis is a vmapped batch dimension: node weights become ``[R, N]``, neighbor
tables ``[R, N, D]``, and ALL candidate relations train simultaneously in one
jitted program per restart round. Relation chunking bounds device memory.

Semantics reproduced exactly (see models/scorer.py for the forward parity):
* Adam(lr=0.1) + MSE, 100 epochs flat / 50 per bag restart
  (main.py:521-528, 755, 890)
* post-step clamp of weights and attribution vector to [0, 1]
  (main.py:667-669)
* label-informed init, U(0,1) re-init with frozen destinations kept
  (main.py:479-516)
* bag restarts until 2 consecutive non-improvements (main.py:884-911), with
  the monotone grad-mask accumulation quirk (main.py:909-910: entries zeroed
  for a restart's frozen set are never un-zeroed)
* reported score = final-epoch forward loss
* degenerate-relation flag (single cleaned bag, or no positive cleaned bag;
  main.py:876-882)
"""

from __future__ import annotations

import dataclasses
import logging
import os
import time
from functools import partial
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mpgnn_tpu.config import ScorerConfig

log = logging.getLogger("mpgnn_tpu.scoring")
from mpgnn_tpu.graph.hetero import HeteroGraph
from mpgnn_tpu.parallel.context import (
    replicate_sweep,
    shard_sweep,
    sweep_devices,
)

# Per-chunk cap on sweep operand entries (int32 + mask ~ 5 bytes each).
# None -> derived from the device's actual free HBM at first use
# (the round-2 hard-coded 48M both starved big chips and ignored real
# pressure); tests may pin a small value.
_MEM_BUDGET_ENTRIES: Optional[int] = None
# A relation whose pow2 ELL table would exceed this multiple of its padded
# edge count is hub-inflated: one high-degree node would widen the whole
# [N, D] table, so it scores through the segment path instead.
_SEG_RATIO = 64
# Max (R x widest per-instance segment surface) of one vmapped segment-form
# sweep chunk: the XLA:TPU runtime crashed ("kernel fault", worker restart)
# at R*N ≈ 19.2M full-space sweeps (R=96, N=200k, round 2, reproduced
# standalone) and AGAIN at R*P ≈ 8.4M member-segment lanes (R=2048,
# P=4096, round-3 KG hop-2), and per-relation time degrades superlinearly
# well before that — see _chunks. The cap counts the WIDEST of an
# instance's segment surfaces (compact node space C, member segments P,
# bag count B), not just C.
#
# Provenance (VERDICT r4 item 3): these observations were made over the
# image's flaky TPU tunnel; benchmarks/probe_crash_cliff.py re-derives the
# cliffs in controlled child processes (benchmarks/CRASH_CLIFF.json) and
# both caps accept environment overrides, so a different device generation
# (or a healthy runtime) can relax them without a code change:
#   MPGNN_SEG_SWEEP_RN_CAP / MPGNN_SEG_SWEEP_R_CAP / (batch_eval)
#   MPGNN_EVAL_VMAP_ENTRY_CAP
_SEG_SWEEP_RN_CAP = int(os.environ.get("MPGNN_SEG_SWEEP_RN_CAP", 8_000_000))
# Absolute vmapped-instance cap: the crash cliffs above are op-mix
# dependent (8.4M member lanes crashed where 8.4M flat edge lanes ran
# fine), so very wide instance batches stay capped even when their
# surfaces are narrow. Compact chunks are cheap — more chunks, not wider
# ones.
_SEG_SWEEP_R_CAP = int(os.environ.get("MPGNN_SEG_SWEEP_R_CAP", 512))


def _mem_budget_entries() -> int:
    """Entry budget derived from free HBM: the sweep's ELL/segment operand
    chunks may occupy ~half the dense-backend budget (itself a fraction of
    the device's reported free memory, train.loops.auto_dense_budget_bytes),
    at ~5 bytes per entry (int32 ids + bool mask) with one transient host
    copy during stacking."""
    if _MEM_BUDGET_ENTRIES is not None:
        return _MEM_BUDGET_ENTRIES
    from mpgnn_tpu.train.loops import auto_dense_budget_bytes

    return max(16_000_000, auto_dense_budget_bytes() // 10)


# ------------------------------------------------------------------ helpers
def _pow2_bucket(n: int, lo: int = 4) -> int:
    """Round up to a power of two (>= lo) so padded shapes fall into a small
    set of compile signatures — compiles over the TPU tunnel cost tens of
    seconds each, so shape bucketing matters more than padding waste."""
    n = max(n, lo)
    return 1 << (n - 1).bit_length()


def _relation_mode(graph: HeteroGraph, relation: int) -> Tuple[str, int]:
    """('ell', D_pad) or ('seg', E_pad) for one relation's scorer operands.

    ELL tables ([N, D] gather-only argmax) are the fast path for bounded
    degrees, but D is pow2(max degree): ONE hub node inflates the whole
    table — fatal on power-law KGs. Such relations (table > _SEG_RATIO x the
    padded edge count, or > a quarter of the whole budget by itself) run in
    segment form instead: [E] edge lists + segment_max/min, memory O(E)
    regardless of degree skew."""
    d = _pow2_bucket(graph.rel_max_degree(int(relation)))
    n_ell = graph.num_nodes * d
    e_pad = _pow2_bucket(int(graph.rel_counts[relation]), lo=128)
    if n_ell > _mem_budget_entries() // 4 or n_ell > _SEG_RATIO * e_pad:
        return "seg", e_pad
    return "ell", d


def _relation_ell_stack(
    graph: HeteroGraph, relations: Sequence[int], d_pad: Optional[int] = None
) -> Tuple[np.ndarray, np.ndarray]:
    """Stack per-relation ELL tables to common [R, N, D]."""
    tables = [graph.neighbor_table(int(r)) for r in relations]
    d_max = max(t[0].shape[1] for t in tables)
    if d_pad is not None:
        d_max = max(d_max, d_pad)
    R, N = len(tables), graph.num_nodes
    nbr = np.zeros((R, N, d_max), dtype=np.int32)
    mask = np.zeros((R, N, d_max), dtype=bool)
    for i, (t, m) in enumerate(tables):
        nbr[i, :, : t.shape[1]] = t
        mask[i, :, : m.shape[1]] = m
    return nbr, mask


def _relation_segment_stack_compact(
    graph: HeteroGraph, relations: Sequence[int], e_pad: int, c_pad: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, List[np.ndarray]]:
    """Stack per-relation src-sorted edge lists to common [R, e_pad],
    remapped into each relation's COMPACT endpoint space.

    Sources are sorted ascending with FILE order preserved inside each
    source's run (rel_edges_csr is a stable sort), so 'minimum edge index
    among maxima' reproduces the reference's first-occurrence argmax
    tie-break (model.py:85).

    Returns (src [R, e_pad], dst [R, e_pad], mask [R, e_pad], nodes) where
    ``nodes[i]`` is relation i's sorted unique endpoint array (compact id c
    ↔ global node nodes[i][c]). Remapping ``np.searchsorted(nodes, src)``
    is monotone, so the sorted-segment-id invariant of ``_seg_first_max``
    survives; pad edges point at compact row c_pad-1 (≥ every real id) with
    mask False, keeping the segment ids sorted."""
    R = len(relations)
    src = np.full((R, e_pad), c_pad - 1, dtype=np.int32)
    dst = np.zeros((R, e_pad), dtype=np.int32)
    mask = np.zeros((R, e_pad), dtype=bool)
    nodes: List[np.ndarray] = []
    for i, r in enumerate(relations):
        s, d = graph.rel_edges_csr(int(r))
        nd = graph.rel_endpoint_nodes(int(r))
        n = len(s)
        src[i, :n] = np.searchsorted(nd, s)
        dst[i, :n] = np.searchsorted(nd, d)
        mask[i, :n] = True
        nodes.append(nd)
    return src, dst, mask, nodes


def _gather_compact(full_rows: np.ndarray, nodes: List[np.ndarray],
                    c_pad: int, fill=0.0) -> np.ndarray:
    """[R, N] host rows → [R, c_pad] compact rows (pad lanes = ``fill``)."""
    R = len(nodes)
    out = np.full((R, c_pad), fill, dtype=full_rows.dtype)
    for i, nd in enumerate(nodes):
        out[i, : len(nd)] = full_rows[i][nd]
    return out


def _compact_pad(graph: HeteroGraph, relation: int) -> int:
    """Pow2 bucket of a relation's COMPACT node-space width (its unique edge
    endpoints) — the device state width of its segment-form scorer."""
    return _pow2_bucket(len(graph.rel_endpoint_nodes(int(relation))), lo=128)


def _chunks(
    relations: Sequence[int], graph: HeteroGraph
) -> List[Tuple[str, int, int, List[int]]]:
    """Group relations into (mode, pad, cpad, relation-list) chunks sharing
    one compile signature.

    Relations are routed to ELL or segment form (``_relation_mode``), then
    bucketed by their pow2 pad (max degree / edge count) AND, for segment
    form, by the pow2 compact node-space width ``cpad`` (unique edge
    endpoints — the sweep runs in that compact space, docs/DESIGN.md §5;
    ELL chunks use the full node space, cpad = N). Each bucket is split so
    the chunk's operand entries fit the memory budget, with R_chunk rounded
    to a pow2 (padded by repeating the last relation; callers simply
    overwrite duplicate results). Compile count is then O(#distinct
    (mode, pad, cpad, R_bucket) tuples), not O(#chunks)."""
    budget = _mem_budget_entries()
    N = graph.num_nodes
    by_bucket: Dict[Tuple[str, int, int], List[int]] = {}
    for r in relations:
        mode, pad = _relation_mode(graph, int(r))
        cpad = _compact_pad(graph, r) if mode == "seg" else N
        by_bucket.setdefault((mode, pad, cpad), []).append(int(r))
    out: List[Tuple[str, int, int, List[int]]] = []
    for (mode, pad, cpad), rels in sorted(by_bucket.items()):
        per_rel = N * pad if mode == "ell" else 2 * pad + 4 * cpad
        max_r = max(1, budget // per_rel)
        if mode == "seg":
            # the vmapped segment sweep's real width driver is R x the
            # widest segment surface (the [R, C] weights and the R-batched
            # C-segment scatters), not the tiny edge arrays the byte budget
            # sees — see _SEG_SWEEP_RN_CAP. Before the compact space, C was
            # the full N and this cap forced 200k-node sweeps into tiny R;
            # now C tracks each relation's real incident-node count.
            max_r = min(
                max_r, max(1, _SEG_SWEEP_RN_CAP // cpad), _SEG_SWEEP_R_CAP
            )
        max_r = max(1, 1 << (max_r.bit_length() - 1))  # pow2 floor
        for i in range(0, len(rels), max_r):
            chunk = rels[i : i + max_r]
            # pow2 AND >= the sweep-mesh device count, so an active mesh
            # shards the relation axis evenly (pow2 mesh sizes divide any
            # larger pow2); capped by the memory budget
            pad_to = min(
                max(_pow2_bucket(len(chunk), lo=1), sweep_devices()), max_r
            )
            while len(chunk) < pad_to:
                chunk = chunk + [chunk[-1]]
            out.append((mode, pad, cpad, chunk))
    return out


def dest_min_labels(
    graph: HeteroGraph,
    relation: int,
    source_mask: np.ndarray,   # [N] bool — sources contributing labels
    node_labels: np.ndarray,   # [N] float — per-node (pseudo-)labels
) -> Tuple[np.ndarray, np.ndarray]:
    """(dest node ids, min source label per dest) for one relation — the
    label-informed init data (destination_dictionary semantics,
    main.py:412-424)."""
    src, dst = graph.rel_edges(relation)
    sel = source_mask[src]
    src, dst = src[sel], dst[sel]
    if len(dst) == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.float32)
    order = np.argsort(dst, kind="stable")
    dsts, starts = np.unique(dst[order], return_index=True)
    mins = np.minimum.reduceat(node_labels[src[order]], starts)
    return dsts.astype(np.int64), mins.astype(np.float32)


# ======================================================== flat (hop-0) sweep
@dataclasses.dataclass
class FlatScore:
    relation: int
    loss: float
    weights: np.ndarray  # trained [N] node weights


@partial(jax.jit, static_argnames=("epochs", "lr"))
def _flat_sweep(w0, nbr, nbr_mask, loss_mask, y, *, epochs: int, lr: float):
    """Train all relations' flat scorers simultaneously.

    w0 [R, N]; nbr/nbr_mask [R, N, D]; loss_mask [R, N] floats selecting each
    relation's source set; y [N] node labels. Returns (w [R, N], loss [R]).
    """
    import optax

    opt = optax.adam(lr)

    def one_relation(w0_r, nbr_r, mask_r, lmask_r):
        denom = jnp.maximum(jnp.sum(lmask_r), 1.0)
        has_edge = jnp.any(mask_r, axis=-1)

        def loss_fn(w):
            vals = jnp.where(mask_r, w[nbr_r], -jnp.inf)
            j = jnp.argmax(vals, axis=-1)
            winner = jnp.take_along_axis(nbr_r, j[..., None], axis=-1)[..., 0]
            pred = jnp.where(has_edge, w[winner], 0.0)
            return jnp.sum((pred - y) ** 2 * lmask_r) / denom

        def epoch(carry, _):
            w, st = carry
            loss, g = jax.value_and_grad(loss_fn)(w)
            upd, st = opt.update(g, st)
            w = optax.apply_updates(w, upd)
            w = jnp.clip(w, 0.0, 1.0)            # main.py:668
            return (w, st), loss

        (w, _), losses = jax.lax.scan(
            epoch, (w0_r, opt.init(w0_r)), None, length=epochs
        )
        return w, losses[-1]

    return jax.vmap(one_relation)(w0, nbr, nbr_mask, loss_mask)


def _seg_first_max(vals, src_r, em_r, num_nodes: int):
    """Per-source (max value, FIRST-maximal edge index, has_edge) over a
    src-sorted masked edge list — the segment twin of ``ell_max_gather``'s
    argmax semantics: ties resolve to the lowest edge index, which (edges
    stable-sorted by source) is the first occurrence in file order
    (model.py:85). Comparisons carry no gradient, so downstream gathers
    through the winner index give the max element — and only it — the
    gradient, like the reference's index-assignment autograd.

    Convenience form: derives the segment constants every call. The epoch
    loops use ``_seg_boundaries`` once per program + ``_seg_first_max_scan``
    per epoch instead — the two XLA segment ops here lower to the
    serialized scatter strategy (~34M lanes/s measured on v5e; the round-5
    [sweep-util] block showed them at 51% of the bag-sweep epoch), while
    the scan form runs on the VPU with only an O(C) gather per epoch."""
    bound = _seg_boundaries(src_r, em_r, num_nodes)
    return _seg_first_max_scan(vals, *bound)


def _seg_boundaries(src_r, em_r, num_nodes: int):
    """Epoch-invariant segment constants of a sorted masked id list:
    (start flags [E], per-segment end position [C], has-real-entry [C]).
    The one E->C scatter lives HERE — outside the epoch scan — so the
    per-epoch reduction (``_seg_first_max_scan``) never scatters."""
    E = src_r.shape[0]
    eidx = jnp.arange(E, dtype=jnp.int32)
    start = jnp.concatenate(
        [jnp.ones((1,), bool), src_r[1:] != src_r[:-1]]
    )
    end_pos = jax.ops.segment_max(
        eidx, src_r, num_segments=num_nodes, indices_are_sorted=True
    )
    end_pos = jnp.clip(end_pos, 0, E - 1)    # empty segments -> masked
    has = jax.ops.segment_max(
        em_r.astype(jnp.int32), src_r, num_segments=num_nodes,
        indices_are_sorted=True,
    ) > 0
    return start, end_pos, has


def _seg_first_max_scan(vals, start, end_pos, has):
    """Scan-form segmented first-max (see ``_seg_first_max``): a segmented
    associative scan (first-maximum monoid with segment-start resets) over
    the value stream, then an O(C) gather at the precomputed segment ends.
    The running (max, first-argmax) pair at a segment's END is the
    segment's result; ties keep the LEFT index, preserving the
    first-occurrence semantics. ``vals`` is stop_gradient'ed: callers use
    only the integer winner index (gathering through it routes the
    gradient to the max element, exactly as before)."""
    E = vals.shape[0]
    vals = jax.lax.stop_gradient(vals)
    eidx = jnp.arange(E, dtype=jnp.int32)

    def combine(a, b):
        ab, av, ax = a
        bb, bv, bx = b
        take_b = bb | (bv > av)              # strict > : ties keep LEFT
        return (
            ab | bb,
            jnp.where(bb, bv, jnp.maximum(av, bv)),
            jnp.where(take_b, bx, ax),
        )

    _, v, x = jax.lax.associative_scan(combine, (start, vals, eidx))
    seg_max = jnp.where(has, v[end_pos], -jnp.inf)
    win_e = jnp.where(has, x[end_pos], 0)
    return seg_max, win_e, has


@partial(jax.jit, static_argnames=("epochs", "lr"))
def _flat_sweep_seg(
    w0, src, dst, emask, loss_mask, y, denom, const, *, epochs: int, lr: float
):
    """Segment-form flat sweep — same semantics as ``_flat_sweep`` with
    [R, E] src-sorted edge lists instead of [R, N, D] neighbor tables, and
    EVERY per-node operand in each relation's COMPACT node space (its unique
    edge endpoints, remapped host-side): w0/loss_mask/y are [R, C] with
    C = the chunk's pow2 endpoint bucket, and src/dst carry compact ids.

    Memory and per-epoch state traffic are O(E) per relation regardless of
    degree skew OR graph size: nodes outside a relation's endpoint set can
    never receive gradient (their Adam update is exactly zero), so carrying
    them on device only burned HBM bandwidth — at KG scale ([R=32, N=200k]
    vs [32, 4096]) the compact space cuts the sweep's dominant traffic ~50x
    (docs/DESIGN.md §5).

    Sources outside the compact set but inside the reference's loss mask
    (labeled sources with no edges of this relation, fb15k mode) contribute
    the constant ``sum(y² · lmask_outside)`` — passed as ``const`` [R] and
    added to the masked in-space sum before dividing by ``denom`` [R]
    (= the FULL-space mask count), so reported losses keep reference
    semantics (score_relation_parallel, main.py:746-755)."""
    import optax

    opt = optax.adam(lr)

    def one_relation(w0_r, src_r, dst_r, em_r, lmask_r, y_r, denom_r, const_r):
        C = w0_r.shape[0]
        # epoch-invariant segment constants: XLA hoists them out of the
        # epoch scan, so the per-epoch argmax is scatter-free
        ebound = _seg_boundaries(src_r, em_r, C)

        def loss_fn(w):
            vals = jnp.where(em_r, w[dst_r], -jnp.inf)
            _, win_e, has = _seg_first_max_scan(vals, *ebound)
            pred = jnp.where(has, w[dst_r[win_e]], 0.0)
            return (jnp.sum((pred - y_r) ** 2 * lmask_r) + const_r) / denom_r

        def epoch(carry, _):
            w, st = carry
            loss, g = jax.value_and_grad(loss_fn)(w)
            upd, st = opt.update(g, st)
            w = optax.apply_updates(w, upd)
            w = jnp.clip(w, 0.0, 1.0)            # main.py:668
            return (w, st), loss

        (w, _), losses = jax.lax.scan(
            epoch, (w0_r, opt.init(w0_r)), None, length=epochs
        )
        return w, losses[-1]

    return jax.vmap(one_relation)(w0, src, dst, emask, loss_mask, y, denom, const)


def score_relations_flat(
    graph: HeteroGraph,
    relations: Sequence[int],
    node_labels: np.ndarray,
    source_nodes: Optional[Sequence[int]],
    cfg: ScorerConfig = ScorerConfig(),
    rng: Optional[np.random.Generator] = None,
    warmer=None,
) -> Dict[int, FlatScore]:
    """Hop-0 sweep (score_relation_parallel parity, main.py:727-760).

    ``source_nodes=None`` mirrors the reference's first=True branch
    (main.py:728-735): each relation's source set is the unique sources of
    its own edges. Otherwise the fixed labeled-source list is used for every
    relation (FB15K/ACM mode). ``warmer`` (utils.warm.ProgramWarmer)
    pre-compiles every chunk signature concurrently before the serial
    chunk loop reaches it."""
    rng = rng or np.random.default_rng(0)
    node_labels = np.asarray(node_labels, dtype=np.float32).reshape(-1)
    N = graph.num_nodes
    results: Dict[int, FlatScore] = {}

    fixed_mask = None
    if source_nodes is not None:
        fixed_mask = np.zeros(N, dtype=bool)
        fixed_mask[np.asarray(list(source_nodes), dtype=np.int64)] = True

    chunks = _chunks(relations, graph)
    if warmer is not None:
        for mode, pad, cpad, chunk in chunks:
            warmer.warm_flat_signature(
                len(chunk), N, pad, cfg.epochs_flat, cfg.lr, mode=mode,
                C=cpad,
            )

    for ci, (mode, pad, cpad, chunk) in enumerate(chunks):
        R = len(chunk)
        log.info(
            "flat sweep chunk %d/%d: %d relations, mode=%s, pad=%d, C=%d",
            ci + 1, len(chunks), R, mode, pad, cpad,
        )
        if mode == "ell":
            nbr, mask = _relation_ell_stack(graph, chunk, pad)
            has_edge_rows = mask.any(axis=-1)              # [R, N]
        else:
            srcs, dsts_a, emask, nodes = _relation_segment_stack_compact(
                graph, chunk, pad, cpad
            )
            has_edge_rows = np.stack(
                [graph.rel_degrees(int(r)) > 0 for r in chunk]
            )
        w0 = np.empty((R, N), dtype=np.float32)
        loss_mask = np.zeros((R, N), dtype=np.float32)
        for i, r in enumerate(chunk):
            src_mask = has_edge_rows[i] if fixed_mask is None else fixed_mask
            loss_mask[i] = src_mask.astype(np.float32)
            dsts, mins = dest_min_labels(graph, r, src_mask, node_labels)
            w0[i] = rng.uniform(0.0, 1.0, size=N)
            if len(dsts):
                w0[i, dsts] = np.abs(
                    mins + rng.uniform(-cfg.init_noise, cfg.init_noise, len(dsts))
                )
        # an active sweep mesh shards the relation axis across devices —
        # the reference's np.array_split over MPI ranks (main.py:1319)
        if mode == "ell":
            batched = shard_sweep(
                jnp.asarray(w0), jnp.asarray(nbr), jnp.asarray(mask),
                jnp.asarray(loss_mask),
            )
            w, loss = _flat_sweep(
                *batched, replicate_sweep(jnp.asarray(node_labels)),
                epochs=cfg.epochs_flat, lr=cfg.lr,
            )
            w = np.asarray(w)
        else:
            # device state in each relation's compact endpoint space; the
            # label-informed init / masks stay full-space host bookkeeping
            y_rows = np.broadcast_to(node_labels, (R, N))
            y_c = _gather_compact(y_rows, nodes, cpad)
            lmask_c = _gather_compact(loss_mask, nodes, cpad)
            denom = np.maximum(loss_mask.sum(axis=1), 1.0).astype(np.float32)
            y2 = node_labels.astype(np.float64) ** 2
            const = np.array([
                float((y2 * loss_mask[i]).sum()
                      - (y2[nodes[i]] * loss_mask[i][nodes[i]]).sum())
                for i in range(R)
            ], dtype=np.float32)
            batched = shard_sweep(
                jnp.asarray(_gather_compact(w0, nodes, cpad)),
                jnp.asarray(srcs), jnp.asarray(dsts_a), jnp.asarray(emask),
                jnp.asarray(lmask_c), jnp.asarray(y_c),
                jnp.asarray(denom), jnp.asarray(const),
            )
            w_c, loss = _flat_sweep_seg(
                *batched, epochs=cfg.epochs_flat, lr=cfg.lr,
            )
            # scatter back: nodes outside the endpoint space provably keep
            # their init (zero grad -> zero Adam update -> clip no-op)
            w_c = np.asarray(w_c)
            w = w0
            for i, nd in enumerate(nodes):
                w[i][nd] = w_c[i][: len(nd)]
        loss = np.asarray(loss)
        for i, r in enumerate(chunk):
            if int(r) not in results:   # chunk padding repeats relations
                results[int(r)] = FlatScore(int(r), float(loss[i]), w[i])
    return results


# =========================================================== bag-mode sweep
def _bag_buckets(tasks: Sequence) -> Tuple[int, int, int]:
    """Shared pow2 (B, M, P) buckets across all tasks — B bags, M members
    per bag (dense ELL form), P total members (flattened segment form) —
    so every chunk of a hop compiles against stable shapes."""
    B = _pow2_bucket(max((len(t[2]) for t in tasks), default=1), lo=8)
    M = _pow2_bucket(
        max((len(b) for t in tasks for b in t[2]), default=1), lo=2
    )
    P = _pow2_bucket(
        max((sum(len(b) for b in t[2]) for t in tasks), default=1), lo=8
    )
    return B, M, P


def _instance_chunks(
    graph: HeteroGraph, tasks: Sequence, N: int
) -> List[Tuple[str, int, int, list]]:
    """(task index, relation) instances grouped into compile-signature
    chunks (mode, pad, cpad, instance-list): routed to ELL/segment form
    (``_relation_mode``), bucketed by the pow2 pad and (segment form) the
    pow2 compact node-space width, split by the memory budget, padded to
    pow2 by repeating the last instance. Deterministic in ``tasks``."""
    budget = _mem_budget_entries()
    F = graph.feat_dim
    B, _, P = _bag_buckets(tasks)
    instances = [
        (ti, int(r)) for ti, (tid, rels, _, _) in enumerate(tasks)
        for r in rels
    ]
    by_bucket: Dict[Tuple[str, int, int], list] = {}
    for inst in instances:
        mode, pad = _relation_mode(graph, inst[1])
        cpad = _compact_pad(graph, inst[1]) if mode == "seg" else N
        by_bucket.setdefault((mode, pad, cpad), []).append(inst)
    chunks = []
    for (mode, pad, cpad), insts in sorted(by_bucket.items()):
        # segment form carries per-instance [C, F] feature rows on top of
        # the edge lists and [C] state
        per_rel = N * pad if mode == "ell" else 2 * pad + cpad * (F + 6)
        max_r = max(1, budget // per_rel)
        if mode == "seg":
            # same vmapped-sweep cliff as _chunks, over the bag sweep's
            # WIDEST per-instance segment surface: compact node space,
            # flattened member segments, or bag count (the round-3 KG
            # hop-2 crash was R*P, not R*C — _SEG_SWEEP_RN_CAP)
            width = max(cpad, B, P)
            max_r = min(
                max_r, max(1, _SEG_SWEEP_RN_CAP // width), _SEG_SWEEP_R_CAP
            )
        max_r = max(1, 1 << (max_r.bit_length() - 1))
        for i in range(0, len(insts), max_r):
            chunk = insts[i : i + max_r]
            pad_to = min(
                max(_pow2_bucket(len(chunk), lo=1), sweep_devices()), max_r
            )
            while len(chunk) < pad_to:
                chunk = chunk + [chunk[-1]]
            chunks.append((mode, pad, cpad, chunk))
    return chunks


@dataclasses.dataclass
class BagScore:
    relation: int
    loss: float                    # best loss across restarts
    degenerate: bool               # the reference's ``v`` flag
    weights: np.ndarray            # [N] node weights of last restart
    attribution: np.ndarray        # [F] LinearLayerAttri vector of last restart
    member_pred_max: np.ndarray    # [N] running max member value over restarts
    member_recorded: np.ndarray    # [N] bool — member had r-edges (recorded)
    num_restarts: int


def _bag_one_relation(
    forward, w0_r, u0_r, bag_labels, keep_r, gmask_r, fmask_r,
    *, epochs: int, lr: float,
):
    """Shared restart-round scaffold for the ELL and segment bag sweeps.

    ``forward(w, u) -> (pred [B], winner [B], member_value, member_winner)``
    supplies the bag-level max over per-source neighbor argmaxes; the epoch
    loop, the grad-mask freezing, the [0,1] clamps and the final pre-step
    forward (main.py:641-673 semantics) are identical across operand
    forms (dense [B, M] bag tables vs flattened member segments)."""
    import optax

    opt = optax.adam(lr)
    denom = jnp.maximum(jnp.sum(keep_r), 1.0)

    def loss_fn(params):
        w, u = params
        pred, _, _, _ = forward(w, u)
        per_bag = (pred - bag_labels) ** 2 * keep_r
        return jnp.sum(per_bag) / denom

    def epoch(carry, _):
        (w, u), st = carry
        loss, g = jax.value_and_grad(loss_fn)((w, u))
        gw, gu = g
        gw = gw * gmask_r                            # main.py:663-664
        upd, st = opt.update((gw, gu), st)
        w, u = optax.apply_updates((w, u), upd)
        w = jnp.clip(w, 0.0, 1.0)                    # main.py:668
        u = jnp.clip(u, 0.0, 1.0)                    # main.py:669
        w = jnp.where(fmask_r, w0_r, w)              # main.py:670-672
        return ((w, u), st), loss

    ((w, u), st), _ = jax.lax.scan(
        epoch, ((w0_r, u0_r), opt.init((w0_r, u0_r))), None,
        length=epochs - 1,
    )
    # Final epoch unrolled so the reported loss / per-bag losses / argmax
    # destinations / member values come from the last forward pass BEFORE
    # the last optimizer step — exactly what the reference's train()
    # returns on its final call (main.py:641-673).
    pred, winner, member_value, _ = forward(w, u)
    per_bag = (pred - bag_labels) ** 2
    loss = jnp.sum(per_bag * keep_r) / denom
    g = jax.grad(loss_fn)((w, u))
    gw, gu = g
    gw = gw * gmask_r
    upd, st = opt.update((gw, gu), st)
    w, u = optax.apply_updates((w, u), upd)
    w = jnp.clip(w, 0.0, 1.0)
    u = jnp.clip(u, 0.0, 1.0)
    w = jnp.where(fmask_r, w0_r, w)
    return w, u, loss, per_bag, winner, member_value


@partial(jax.jit, static_argnames=("epochs", "lr"))
def _bag_round(
    w0, u0, nbr, nbr_mask, bags, member_mask, bag_labels, bag_keep,
    grad_mask, frozen_mask, x, *, epochs: int, lr: float,
):
    """One restart round (50 epochs) for all instances at once (ELL form).

    An "instance" is one (search-state, relation) pair — instances from
    DIFFERENT metapath states batch together, so a whole frontier hop is one
    device program. Shapes: w0 [R,N], u0 [R,F], nbr/nbr_mask [R,N,D],
    bags [R,B,M], member_mask [R,B,M], bag_labels [R,B], bag_keep [R,B],
    grad_mask [R,N], frozen_mask [R,N] (frozen values = w0 entries), x [N,F].

    Returns (w, u, final_loss [R], per_bag_loss [R,B], bag_winner [R,B],
    member_value [R,N])."""

    def one_relation(w0_r, u0_r, nbr_r, mask_r, bags, bag_labels, mmask_r,
                     keep_r, gmask_r, fmask_r):
        has_edge = jnp.any(mask_r, axis=-1)

        def forward(w, u):
            lin = x @ u                                  # [N]
            prod = jnp.where(mask_r, w[nbr_r] * lin[:, None], -jnp.inf)
            j = jnp.argmax(prod, axis=-1)
            member_winner = jnp.take_along_axis(nbr_r, j[..., None], -1)[..., 0]
            member_value = jnp.where(has_edge, w[member_winner] * lin, 0.0)
            # dense [B, M] bag max (first-occurrence argmax ties)
            vals = jnp.where(mmask_r, member_value[bags], -jnp.inf)
            m = jnp.argmax(vals, axis=-1)
            any_member = jnp.any(mmask_r, axis=-1)
            pred = jnp.where(
                any_member,
                jnp.take_along_axis(vals, m[..., None], -1)[..., 0],
                0.0,
            )
            bag_member = jnp.take_along_axis(bags, m[..., None], -1)[..., 0]
            winner = member_winner[bag_member]
            return pred, winner, member_value, member_winner

        return _bag_one_relation(
            forward, w0_r, u0_r, bag_labels, keep_r,
            gmask_r, fmask_r, epochs=epochs, lr=lr,
        )

    return jax.vmap(one_relation)(
        w0, u0, nbr, nbr_mask, bags, bag_labels, member_mask, bag_keep,
        grad_mask, frozen_mask,
    )


@partial(jax.jit, static_argnames=("epochs", "lr"))
def _bag_round_seg(
    w0, u0, src, dst, emask, member_node, member_bag, member_mask,
    bag_labels, bag_keep, grad_mask, frozen_mask, x,
    *, epochs: int, lr: float,
):
    """Segment-form restart round — identical semantics to ``_bag_round``
    with [R, E] src-sorted edge lists (src/dst/emask) instead of [R, N, D]
    tables, every per-node operand in each instance's COMPACT endpoint
    space (``_relation_segment_stack_compact``: w0/grad_mask/frozen_mask
    [R, C], per-instance feature rows ``x`` [R, C, F]), and bags FLATTENED
    into member segments: ``member_node`` [R, P] compact member ids,
    ``member_bag`` [R, P] non-decreasing bag ids (pads point at B-1,
    masked), ``member_mask`` [R, P]. The dense [R, B, M] bag tables were
    ~99% padding under power-law bag-size skew (one hub bag forces M for
    all); P = pow2(Σ|bag|) makes the bag reduction O(members) like the
    edge reduction is O(E) (docs/DESIGN.md §5). First-occurrence argmax
    ties survive: flattening preserves within-bag member order, and
    ``_seg_first_max`` picks the lowest flattened index."""

    def one_relation(w0_r, u0_r, src_r, dst_r, em_r, mn_r, mb_r, mm_r,
                     bag_labels, keep_r, gmask_r, fmask_r, x_r):
        C = w0_r.shape[0]
        B = bag_labels.shape[0]
        # epoch-invariant segment constants (edge + member streams): XLA
        # hoists them out of the epoch scan — the per-epoch argmaxes are
        # then scatter-free VPU scans ([sweep-util] measured the old
        # scatter-strategy segment ops at 51% of the epoch)
        ebound = _seg_boundaries(src_r, em_r, C)
        mbound = _seg_boundaries(mb_r, mm_r, B)

        def forward(w, u):
            lin = x_r @ u                                # [C]
            vals = jnp.where(em_r, w[dst_r] * lin[src_r], -jnp.inf)
            _, win_e, has = _seg_first_max_scan(vals, *ebound)
            member_winner = dst_r[win_e]
            member_value = jnp.where(has, w[member_winner] * lin, 0.0)
            # flattened member segments -> per-bag first-occurrence max
            mvals = jnp.where(mm_r, member_value[mn_r], -jnp.inf)
            _, win_m, bhas = _seg_first_max_scan(mvals, *mbound)
            pred = jnp.where(bhas, mvals[win_m], 0.0)
            bag_member = mn_r[win_m]
            winner = member_winner[bag_member]
            return pred, winner, member_value, member_winner

        return _bag_one_relation(
            forward, w0_r, u0_r, bag_labels, keep_r,
            gmask_r, fmask_r, epochs=epochs, lr=lr,
        )

    return jax.vmap(one_relation)(
        w0, u0, src, dst, emask, member_node, member_bag, member_mask,
        bag_labels, bag_keep, grad_mask, frozen_mask, x,
    )


def _retrain_mode(graph: HeteroGraph, relation: int) -> Tuple[str, int]:
    """Operand mode for the single-relation retrain: same routing as the
    sweeps, but ELL keeps the RAW max-degree width (the retrain's historical
    compile signature — ``_relation_ell_stack`` without d_pad)."""
    mode, pad = _relation_mode(graph, relation)
    if mode == "ell":
        return "ell", graph.rel_max_degree(relation)
    return mode, pad


def warm_retrain_signatures(
    graph: HeteroGraph, tasks: Sequence, cfg: ScorerConfig, warmer
) -> None:
    """Pre-compile the ``retrain_bags_predictions`` program signatures a hop
    could hit: R=1, per-task (B, M) buckets, one D per candidate relation's
    raw ELL width. Compiles overlap the hop's sweep; dedupe in the warmer
    collapses repeats across tasks and hops."""
    if warmer is None:
        return
    N, F = graph.num_nodes, graph.feat_dim
    for tid, rels, bag_list, _labels in tasks:
        B = _pow2_bucket(len(bag_list), lo=8)
        M = _pow2_bucket(max((len(b) for b in bag_list), default=1), lo=2)
        P = _pow2_bucket(sum(len(b) for b in bag_list), lo=8)
        for r in rels:
            mode, pad = _retrain_mode(graph, int(r))
            cpad = _compact_pad(graph, int(r)) if mode == "seg" else N
            warmer.warm_bag_signature(
                1, N, pad, B, M, F, cfg.epochs_bags, cfg.lr, mode=mode,
                C=cpad, P=P,
            )


def retrain_bags_predictions(
    graph: HeteroGraph,
    relation: int,
    bags: List[List[int]],
    bag_labels: np.ndarray,
    cfg: ScorerConfig = ScorerConfig(),
    rng: Optional[np.random.Generator] = None,
    x: Optional[np.ndarray] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """One fresh 50-epoch bag-training run on the chosen relation, returning
    (member values [N], recorded mask [N]) — the extra prediction round the
    search adds before relabeling (retrain_bags, main.py:814-851: 1 restart,
    no freezing, fresh label-informed init)."""
    rng = rng or np.random.default_rng(0)
    x = np.asarray(graph.x if x is None else x, dtype=np.float32)
    N, F = x.shape
    n_bags = len(bags)
    # pow2 padding keeps compile signatures stable across metapath states
    B = _pow2_bucket(n_bags, lo=8)
    M = _pow2_bucket(max((len(b) for b in bags), default=1), lo=2)
    bags_arr = np.zeros((B, M), dtype=np.int32)
    member_valid = np.zeros((B, M), dtype=bool)
    for i, b in enumerate(bags):
        bags_arr[i, : len(b)] = b
        member_valid[i, : len(b)] = True
    bag_labels = np.concatenate([
        np.asarray(bag_labels, dtype=np.float32).reshape(-1),
        np.zeros(B - n_bags, dtype=np.float32),
    ])

    member_min_label = np.full(N, np.inf, dtype=np.float32)
    for i, b in enumerate(bags):
        for s in b:
            member_min_label[s] = min(member_min_label[s], bag_labels[i])
    is_member = np.isfinite(member_min_label)

    mode, pad = _retrain_mode(graph, int(relation))
    if mode == "ell":
        nbr, mask = _relation_ell_stack(graph, [relation])
        has_edge = mask.any(axis=-1)
        ops = (jnp.asarray(nbr), jnp.asarray(mask))
        round_fn = _bag_round
    else:
        cpad = _compact_pad(graph, int(relation))
        srcs, dsts_a, emask, nodes = _relation_segment_stack_compact(
            graph, [relation], pad, cpad
        )
        has_edge = (graph.rel_degrees(int(relation)) > 0)[None]
        ops = (jnp.asarray(srcs), jnp.asarray(dsts_a), jnp.asarray(emask))
        round_fn = _bag_round_seg
    member_mask = member_valid[None] & has_edge[:, bags_arr]
    bag_keep = member_mask.any(axis=-1).astype(np.float32)
    if mode == "seg":
        # flattened member segments in the relation's compact space
        nd = nodes[0]
        P = _pow2_bucket(sum(len(b) for b in bags), lo=8)
        mn = np.zeros(P, dtype=np.int32)
        mb = np.full(P, B - 1, dtype=np.int32)
        mv = np.zeros(P, dtype=bool)
        p = 0
        for i, b in enumerate(bags):
            mn[p : p + len(b)] = b
            mb[p : p + len(b)] = i
            mv[p : p + len(b)] = True
            p += len(b)
        fm = mv & has_edge[0][mn]
        mc = np.searchsorted(nd, mn).clip(0, cpad - 1)
        bag_ops = (
            jnp.asarray(np.where(fm, mc, 0))[None],
            jnp.asarray(mb)[None],
            jnp.asarray(fm)[None],
        )
    else:
        bag_ops = (jnp.asarray(bags_arr)[None], jnp.asarray(member_mask))

    dsts, mins = dest_min_labels(graph, relation, is_member, member_min_label)
    w0 = rng.uniform(0.0, 1.0, size=(1, N)).astype(np.float32)
    if len(dsts):
        w0[0, dsts] = np.abs(
            mins + rng.uniform(-cfg.init_noise, cfg.init_noise, len(dsts))
        )
    bound = 1.0 / np.sqrt(F)
    u0 = rng.uniform(-bound, bound, size=(1, F)).astype(np.float32)

    if mode == "seg":
        x_c = np.zeros((1, cpad, F), dtype=np.float32)
        x_c[0, : len(nd)] = x[nd]
        dev_args = (
            jnp.asarray(_gather_compact(w0, [nd], cpad)),
            jnp.ones((1, cpad), jnp.float32),
            jnp.zeros((1, cpad), bool),
            jnp.asarray(x_c),
        )
    else:
        dev_args = (
            jnp.asarray(w0),
            jnp.ones((1, N), jnp.float32),
            jnp.zeros((1, N), bool),
            jnp.asarray(x),
        )
    _, _, _, _, _, member_value = round_fn(
        dev_args[0], jnp.asarray(u0), *ops, *bag_ops,
        jnp.asarray(bag_labels)[None], jnp.asarray(bag_keep),
        dev_args[1], dev_args[2], dev_args[3],
        epochs=cfg.epochs_bags, lr=cfg.lr,
    )
    member_value = np.asarray(member_value)[0]
    if mode == "seg":
        mv_full = np.zeros(N, dtype=np.float32)
        mv_full[nd] = member_value[: len(nd)]
        member_value = mv_full
    recorded = has_edge[0] & is_member
    return member_value, recorded


def score_relations_bags(
    graph: HeteroGraph,
    relations: Sequence[int],
    bags: List[List[int]],
    bag_labels: np.ndarray,
    cfg: ScorerConfig = ScorerConfig(),
    rng: Optional[np.random.Generator] = None,
    x: Optional[np.ndarray] = None,
) -> Dict[int, BagScore]:
    """Bag sweep with restarts (score_relation_bags_parallel parity,
    main.py:853-917) for one search state; see ``score_bag_tasks`` for the
    multi-state batched form the engine uses."""
    return score_bag_tasks(
        graph, [(0, relations, bags, bag_labels)], cfg, rng, x
    )[0]


def score_bag_tasks(
    graph: HeteroGraph,
    tasks: Sequence,
    cfg: ScorerConfig = ScorerConfig(),
    rng: Optional[np.random.Generator] = None,
    x: Optional[np.ndarray] = None,
    warmer=None,
    stats: Optional[list] = None,
) -> Dict:
    """Bag sweeps for MANY search states at once.

    ``tasks`` is a list of ``(task_id, relations, bags, bag_labels)``; every
    (task, relation) pair becomes one vmapped instance, so an entire
    frontier hop — the reference's per-metapath MPI fan-outs
    (main.py:1381-1408) — runs as ONE device program per restart round.
    Returns ``{task_id: {relation: BagScore}}``. Restart control flow stays
    on host, per instance (restart counts are data-dependent).

    ``warmer`` pre-compiles every distinct restart-round signature in
    background threads BEFORE the host-side bag bookkeeping below, so the
    (expensive, remote) compiles overlap prep instead of serializing at the
    first call of each chunk."""
    rng = rng or np.random.default_rng(0)
    x = np.asarray(graph.x if x is None else x, dtype=np.float32)
    N, F = x.shape

    # shared pow2 buckets across all tasks -> stable compile shapes; P is
    # the flattened member-segment width (the device-side bag reduction is
    # O(members), not O(B*M) dense-table lanes, docs/DESIGN.md §5)
    B, M, P = _bag_buckets(tasks)

    # chunk layout is computed ONCE and shared between warming and
    # execution: _instance_chunks derives its width cap from live free HBM
    # (auto budget), so two separate calls straddling a device allocation
    # could produce different chunkings — warming signatures the real
    # chunks then never match, wasting the background compiles
    chunks = _instance_chunks(graph, tasks, N)

    if warmer is not None:
        for mode, pad, cpad, chunk in chunks:
            warmer.warm_bag_signature(
                len(chunk), N, pad, B, M, F, cfg.epochs_bags, cfg.lr,
                mode=mode, C=cpad, P=P,
            )

    per_task = []
    for tid, rels, bag_list, labels in tasks:
        bags_arr = np.zeros((B, M), dtype=np.int32)
        member_valid = np.zeros((B, M), dtype=bool)
        mn = np.zeros(P, dtype=np.int32)        # flat member node ids
        mb = np.full(P, B - 1, dtype=np.int32)  # flat bag ids (sorted; pads
        mv = np.zeros(P, dtype=bool)            #  point at B-1, masked)
        p = 0
        for i, b in enumerate(bag_list):
            bags_arr[i, : len(b)] = b
            member_valid[i, : len(b)] = True
            mn[p : p + len(b)] = b
            mb[p : p + len(b)] = i
            mv[p : p + len(b)] = True
            p += len(b)
        lab = np.concatenate([
            np.asarray(labels, dtype=np.float32).reshape(-1),
            np.zeros(B - len(bag_list), dtype=np.float32),
        ])
        # min bag label per member (destination_bag_dictionary init,
        # main.py:426-438)
        mml = np.full(N, np.inf, dtype=np.float32)
        for i, b in enumerate(bag_list):
            for m in b:
                mml[m] = min(mml[m], lab[i])
        per_task.append(dict(
            tid=tid, bags=bags_arr, valid=member_valid, labels=lab,
            member_min_label=mml, is_member=np.isfinite(mml),
            mn=mn, mb=mb, mv=mv,
        ))

    results: Dict = {t[0]: {} for t in tasks}
    bound = 1.0 / np.sqrt(F)
    for ci, (mode, pad, cpad, chunk) in enumerate(chunks):
        R = len(chunk)
        log.info(
            "bag sweep chunk %d/%d: %d instances, mode=%s, pad=%d, C=%d",
            ci + 1, len(chunks), R, mode, pad, cpad,
        )
        # optional utilization accounting (bench.py [sweep-util]): per-chunk
        # shapes + per-restart-round device walls, so the sweep's dominant
        # phase gets a roofline denominator like training does
        chunk_stat = dict(
            mode=mode, R=R, E=pad, C=cpad, B=B, M=M, P=P, F=F,
            epochs=cfg.epochs_bags, device_round_s=[], full_round_s=[],
        )
        if stats is not None:
            stats.append(chunk_stat)
        nodes: List[np.ndarray] = []
        if mode == "ell":
            nbr, mask = _relation_ell_stack(
                graph, [r for _, r in chunk], pad
            )
            has_edge = mask.any(axis=-1)                  # [R, N]
        else:
            srcs, dsts_a, emask, nodes = _relation_segment_stack_compact(
                graph, [r for _, r in chunk], pad, cpad
            )
            has_edge = np.stack(
                [graph.rel_degrees(r) > 0 for _, r in chunk]
            )

        bags_i = np.stack([per_task[ti]["bags"] for ti, _ in chunk])
        valid_i = np.stack([per_task[ti]["valid"] for ti, _ in chunk])
        labels_i = np.stack([per_task[ti]["labels"] for ti, _ in chunk])
        member_mask = valid_i & np.take_along_axis(
            has_edge[:, None, :], bags_i.reshape(R, 1, -1), axis=2
        ).reshape(R, B, M)
        bag_keep = member_mask.any(axis=-1).astype(np.float32)    # [R, B]

        # degenerate flag (main.py:876-882) over CLEANED bags
        kept_counts = bag_keep.sum(axis=1)
        pos_kept = (bag_keep * (labels_i > 0.5)).sum(axis=1)
        degenerate = (kept_counts == 1) | ((kept_counts > 1) & (pos_kept == 0))

        # per-instance init weights from destination bag labels
        w0 = np.empty((R, N), dtype=np.float32)
        for i, (ti, r) in enumerate(chunk):
            t = per_task[ti]
            dsts, mins = dest_min_labels(
                graph, r, t["is_member"], t["member_min_label"]
            )
            w0[i] = rng.uniform(0.0, 1.0, size=N)
            if len(dsts):
                w0[i, dsts] = np.abs(
                    mins + rng.uniform(-cfg.init_noise, cfg.init_noise, len(dsts))
                )
        u0 = rng.uniform(-bound, bound, size=(R, F)).astype(np.float32)

        grad_mask = np.ones((R, N), dtype=np.float32)
        frozen_mask = np.zeros((R, N), dtype=bool)
        active = np.ones(R, dtype=bool)
        rest = np.zeros(R, dtype=np.int64)
        current_loss = np.full(R, 100.0, dtype=np.float32)  # main.py:854
        member_pred_max = np.full((R, N), -np.inf, dtype=np.float32)
        member_recorded = np.zeros((R, N), dtype=bool)
        last_w = w0.copy()
        last_u = u0.copy()
        n_restarts = np.zeros(R, dtype=np.int64)

        # an active sweep mesh shards the instance axis across devices —
        # the reference's per-metapath MPI fan-out (main.py:1400-1408)
        if mode == "ell":
            ops = shard_sweep(jnp.asarray(nbr), jnp.asarray(mask))
            d_x = replicate_sweep(jnp.asarray(x))
            bag_ops = shard_sweep(
                jnp.asarray(bags_i), jnp.asarray(member_mask)
            )
        else:
            ops = shard_sweep(
                jnp.asarray(srcs), jnp.asarray(dsts_a), jnp.asarray(emask)
            )
            # per-instance compact space + flattened member segments:
            # remap member ids into each relation's endpoint space (members
            # without r-edges are masked — any in-range id works) and
            # gather each instance's feature rows
            mn_i = np.zeros((R, P), dtype=np.int32)
            mb_i = np.stack([per_task[ti]["mb"] for ti, _ in chunk])
            mm_i = np.zeros((R, P), dtype=bool)
            x_c = np.zeros((R, cpad, F), dtype=np.float32)
            for i, nd in enumerate(nodes):
                t = per_task[chunk[i][0]]
                fm = t["mv"] & has_edge[i][t["mn"]]
                mc = np.searchsorted(nd, t["mn"]).clip(0, cpad - 1)
                mn_i[i] = np.where(fm, mc, 0)
                mm_i[i] = fm
                x_c[i, : len(nd)] = x[nd]
            bag_ops = shard_sweep(
                jnp.asarray(mn_i), jnp.asarray(mb_i), jnp.asarray(mm_i)
            )
            d_x = shard_sweep(jnp.asarray(x_c))
        d_labels, d_keep = shard_sweep(
            jnp.asarray(labels_i), jnp.asarray(bag_keep),
        )
        dev = dict(
            bag_ops=bag_ops,
            bag_labels=d_labels, bag_keep=d_keep, x=d_x,
        )
        round_fn = _bag_round if mode == "ell" else _bag_round_seg

        for _round in range(cfg.max_restarts):
            if not active.any():
                break
            t_round = time.time()
            if mode == "ell":
                hw0, hgm, hfm = w0, grad_mask, frozen_mask
            else:
                # host bookkeeping stays full-space; the device round runs
                # in each instance's compact endpoint space
                hw0 = _gather_compact(w0, nodes, cpad)
                hgm = _gather_compact(grad_mask, nodes, cpad)
                hfm = _gather_compact(frozen_mask, nodes, cpad, fill=False)
            rw0, ru0, rgm, rfm = shard_sweep(
                jnp.asarray(hw0), jnp.asarray(u0), jnp.asarray(hgm),
                jnp.asarray(hfm),
            )
            w, u, loss, per_bag, winner, member_value = round_fn(
                rw0, ru0, *ops, *dev["bag_ops"],
                dev["bag_labels"], dev["bag_keep"], rgm, rfm, dev["x"],
                epochs=cfg.epochs_bags, lr=cfg.lr,
            )
            w = np.asarray(w); u = np.asarray(u)
            loss = np.asarray(loss); per_bag = np.asarray(per_bag)
            winner = np.asarray(winner); member_value = np.asarray(member_value)
            if mode == "seg":
                # back to full space: outside the endpoint set, weights
                # provably keep their round init (zero grad, zero Adam
                # update, clip no-op) and member values are exactly 0
                w_full = w0.copy()
                mv_full = np.zeros((R, N), dtype=np.float32)
                win_full = np.zeros((R, B), dtype=np.int64)
                for i, nd in enumerate(nodes):
                    w_full[i][nd] = w[i][: len(nd)]
                    mv_full[i][nd] = member_value[i][: len(nd)]
                    win_full[i] = nd[winner[i].clip(0, len(nd) - 1)]
                w, member_value, winner = w_full, mv_full, win_full
            chunk_stat["device_round_s"].append(time.time() - t_round)
            log.info(
                "  bag restart round %d: %d/%d instances active, %.1fs",
                _round + 1, int(active.sum()), R, time.time() - t_round,
            )

            for i in range(R):
                if not active[i]:
                    continue
                ti = chunk[i][0]
                n_restarts[i] += 1
                last_w[i], last_u[i] = w[i], u[i]
                rec = has_edge[i] & per_task[ti]["is_member"]
                member_recorded[i] |= rec
                member_pred_max[i][rec] = np.maximum(
                    member_pred_max[i][rec], member_value[i][rec]
                )
                if loss[i] < current_loss[i]:
                    # freeze winning dsts of near-zero-loss bags (main.py:901)
                    low = (per_bag[i] < cfg.freeze_loss_threshold) & (
                        bag_keep[i] > 0.5
                    )
                    fset = np.unique(winner[i][low])
                    frozen_mask[i] = False
                    frozen_mask[i][fset] = True
                    current_loss[i] = loss[i]
                    rest[i] = 0
                else:
                    rest[i] += 1
                # monotone grad-mask accumulation (main.py:909-910)
                grad_mask[i][frozen_mask[i]] = 0.0
                # re-init: frozen keep trained values, rest U(0,1)
                # (main.py:911 with BAGS=False -> U(0,1) branch)
                w0[i] = rng.uniform(0.0, 1.0, size=N).astype(np.float32)
                w0[i][frozen_mask[i]] = w[i][frozen_mask[i]]
                # fresh LinearLayerAttri each restart (get_model, main.py:886)
                u0[i] = rng.uniform(-bound, bound, size=F).astype(np.float32)
                if rest[i] >= cfg.max_consecutive_misses:
                    active[i] = False
            chunk_stat["full_round_s"].append(time.time() - t_round)

        for i, (ti, r) in enumerate(chunk):
            tid = tasks[ti][0]
            if r in results[tid]:       # chunk padding repeats instances
                continue
            results[tid][r] = BagScore(
                relation=r,
                loss=float(current_loss[i]),
                degenerate=bool(degenerate[i]),
                weights=last_w[i],
                attribution=last_u[i],
                member_pred_max=member_pred_max[i],
                member_recorded=member_recorded[i],
                num_restarts=int(n_restarts[i]),
            )
    return results
