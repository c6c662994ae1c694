"""Immutable, device-ready heterogeneous graph structures.

TPU-first design notes
----------------------
The reference stores edges as a ``[2, E]`` torch tensor plus a parallel
``edge_type [E]`` tensor and slices ``edge_index[:, edge_type == r]``
dynamically per relation (reference: mp_rgcn_layer.py:29-37, main.py:39-43).
Dynamic boolean slicing produces data-dependent shapes, which XLA cannot
compile. Instead we sort edges by relation ONCE at build time and keep a
host-side ``rel_ptr`` array of static offsets: every per-relation view is a
*static* slice, so each relation's aggregation compiles to a fixed-shape
program. For vmapped sweeps over many relations at once we provide padded
``RelationBatch`` views (``[R, E_max]`` + mask).

Aggregation semantics preserved from the reference (mp_rgcn_layer.py:98,
model.py:137-192): messages flow dst-column -> src-column of ``link.dat``
(PyG ``flow='target_to_source'``), mean aggregation, zero rows for sources
with no edges of the selected relation.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


def _as_int32(a) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(a, dtype=np.int32))


@dataclasses.dataclass(frozen=True)
class NodeSplit:
    """Stratified train/val/test node split (reference: main.py:277-345)."""

    node_idx: np.ndarray   # all labeled node ids
    train_idx: np.ndarray
    train_y: np.ndarray
    val_idx: np.ndarray
    val_y: np.ndarray
    test_idx: np.ndarray
    test_y: np.ndarray

    @property
    def num_classes(self) -> int:
        return int(
            len(
                np.unique(
                    np.concatenate([self.train_y, self.val_y, self.test_y])
                )
            )
        )


@dataclasses.dataclass(frozen=True)
class RelationBatch:
    """A padded batch of per-relation edge lists for vmapped sweeps.

    ``src``/``dst`` are ``[R, E_max]`` int32; padding entries point at node 0
    and are masked out by ``mask``. ``relations`` records which global
    relation id occupies each row.
    """

    relations: np.ndarray  # [R] int32 global relation ids
    src: np.ndarray        # [R, E_max] int32
    dst: np.ndarray        # [R, E_max] int32
    mask: np.ndarray       # [R, E_max] bool
    counts: np.ndarray     # [R] int32 true edge counts

    @property
    def num_relations(self) -> int:
        return int(self.relations.shape[0])

    @property
    def max_edges(self) -> int:
        return int(self.src.shape[1])


class HeteroGraph:
    """A typed multigraph with relation-sorted edge storage.

    Parameters
    ----------
    x : [N, F] float32 node features (one-hot colors or BoW floats;
        reference: main.py:347-355).
    edge_src, edge_dst, edge_type : [E] arrays in *file order* — the order of
        rows in ``link.dat``. File order is preserved inside each relation
        segment after the stable sort so that argmax tie-breaking matches the
        reference's first-occurrence semantics (model.py:85).
    """

    def __init__(
        self,
        x: np.ndarray,
        edge_src: np.ndarray,
        edge_dst: np.ndarray,
        edge_type: np.ndarray,
        num_relations: Optional[int] = None,
        labels: Optional[np.ndarray] = None,
    ):
        x = np.ascontiguousarray(np.asarray(x, dtype=np.float32))
        edge_src = _as_int32(edge_src)
        edge_dst = _as_int32(edge_dst)
        edge_type = _as_int32(edge_type)
        if not (edge_src.shape == edge_dst.shape == edge_type.shape):
            raise ValueError("edge arrays must have identical shapes")

        self.x = x
        self.num_nodes = int(x.shape[0])
        self.feat_dim = int(x.shape[1])
        self.num_edges = int(edge_src.shape[0])
        self.num_relations = int(
            num_relations
            if num_relations is not None
            else (edge_type.max() + 1 if edge_type.size else 0)
        )
        self.labels = None if labels is None else np.asarray(labels)

        # file-order views (kept for parity-sensitive host-side logic)
        self.edge_src = edge_src
        self.edge_dst = edge_dst
        self.edge_type = edge_type

        # relation-sorted storage: stable counting sort keeps file order per
        # relation (native C++ when available, numpy otherwise)
        from mpgnn_tpu.native import sort_by_relation

        order, rel_ptr = sort_by_relation(edge_type, self.num_relations)
        self._order = order
        self.sorted_src = edge_src[order]
        self.sorted_dst = edge_dst[order]
        self.sorted_type = edge_type[order]
        self.rel_ptr = rel_ptr
        self.rel_counts = np.diff(rel_ptr).astype(np.int64)

        self._nbr_cache: Dict[Tuple[int, int], Tuple[np.ndarray, np.ndarray]] = {}

    # ------------------------------------------------------------------ views
    def rel_slice(self, relation: int) -> Tuple[int, int]:
        """Static (start, end) offsets of a relation's edge segment."""
        return int(self.rel_ptr[relation]), int(self.rel_ptr[relation + 1])

    def rel_edges(self, relation: int) -> Tuple[np.ndarray, np.ndarray]:
        """(src, dst) arrays of one relation, in file order."""
        s, e = self.rel_slice(relation)
        return self.sorted_src[s:e], self.sorted_dst[s:e]

    def present_relations(self) -> List[int]:
        """Relations with at least one edge (== torch.unique(edge_type))."""
        return [r for r in range(self.num_relations) if self.rel_counts[r] > 0]

    def rel_edges_csr(self, relation: int) -> Tuple[np.ndarray, np.ndarray]:
        """(src, dst) of one relation with src sorted ascending (stable, so
        each source's neighbor order stays file order). Aggregation is
        permutation-invariant, and sorted segment ids let XLA lower
        segment_sum to its fast sorted-scatter path on TPU."""
        key = ("csr", int(relation))
        if key in self._nbr_cache:
            return self._nbr_cache[key]
        src, dst = self.rel_edges(relation)
        order = np.argsort(src, kind="stable")
        out = (src[order], dst[order])
        self._nbr_cache[key] = out
        return out

    def rel_endpoint_nodes(self, relation: int) -> np.ndarray:
        """Sorted unique node ids incident to one relation's edges (cached).

        This is the relation's COMPACT index space: every node a per-relation
        scorer can read or write (sources, destinations, label-informed init
        targets) is an edge endpoint, so sweep state sized [|endpoints|]
        replaces [N] — the difference between a 2k-edge relation carrying a
        4k-entry weight vector and a 200k-entry one (docs/DESIGN.md §5)."""
        key = ("nodes", int(relation))
        if key not in self._nbr_cache:
            src, dst = self.rel_edges(relation)
            self._nbr_cache[key] = np.unique(np.concatenate([src, dst]))
        return self._nbr_cache[key]

    # ------------------------------------------------------- padded batches
    def relation_batch(
        self,
        relations: Sequence[int],
        pad_to: Optional[int] = None,
        pad_multiple: int = 128,
    ) -> RelationBatch:
        """Build a padded ``[R, E_max]`` batch for vmapped relation sweeps.

        This replaces the reference's MPI fan-out where each process received
        a Python dict per relation (main.py:1319-1328): here every relation's
        edges live in one rectangular device array and all relations are
        trained simultaneously.
        """
        rels = _as_int32(relations)
        counts = np.array([self.rel_counts[r] for r in rels], dtype=np.int32)
        e_max = int(counts.max()) if counts.size else 1
        e_max = max(e_max, 1)
        if pad_to is not None:
            e_max = max(e_max, int(pad_to))
        e_max = -(-e_max // pad_multiple) * pad_multiple  # round up
        R = len(rels)
        src = np.zeros((R, e_max), dtype=np.int32)
        dst = np.zeros((R, e_max), dtype=np.int32)
        mask = np.zeros((R, e_max), dtype=bool)
        for i, r in enumerate(rels):
            s, d = self.rel_edges(int(r))
            n = len(s)
            src[i, :n] = s
            dst[i, :n] = d
            mask[i, :n] = True
        return RelationBatch(relations=rels, src=src, dst=dst, mask=mask, counts=counts)

    # -------------------------------------------------------------- degrees
    def rel_degrees(self, relation: int) -> np.ndarray:
        """Per-node out-degree of one relation (int32, cached; native C++).
        Lets callers reason about table shapes (max degree, hub detection)
        WITHOUT materializing [N, D] neighbor tables."""
        key = ("deg", int(relation))
        if key not in self._nbr_cache:
            from mpgnn_tpu.native import degrees

            src, _ = self.rel_edges(relation)
            self._nbr_cache[key] = degrees(src, self.num_nodes)
        return self._nbr_cache[key]

    def rel_max_degree(self, relation: int) -> int:
        """Max out-degree of one relation (>= 1 for shape purposes)."""
        deg = self.rel_degrees(relation)
        return max(int(deg.max()) if deg.size else 0, 1)

    # ------------------------------------------------------------ ELL tables
    def neighbor_table(
        self, relation: int, max_degree: Optional[int] = None
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Padded per-source neighbor table (ELL format) for one relation.

        Returns ``(nbr [N, D], mask [N, D])`` where row i lists destination
        nodes of edges ``(i, relation, d)`` in file order. Used by the dense
        ELL aggregation backend and the scorer's segment-argmax. Built by the
        native C++ builder (vectorized numpy fallback) — no Python per-edge
        loop on any load path."""
        key = (int(relation), -1 if max_degree is None else int(max_degree))
        if key in self._nbr_cache:
            return self._nbr_cache[key]
        from mpgnn_tpu.native import build_ell

        src, dst = self.rel_edges(relation)
        d_max = self.rel_max_degree(relation)
        if max_degree is not None:
            d_max = min(d_max, int(max_degree))
        d_max = max(d_max, 1)
        nbr, mask, _ = build_ell(src, dst, self.num_nodes, d_max)
        self._nbr_cache[key] = (nbr, mask)
        return nbr, mask

    # ---------------------------------------------------- host-side helpers
    def edge_dictionary(
        self, relation: int, source_nodes: Sequence[int]
    ) -> Dict[int, List[int]]:
        """``{src: [dsts]}`` restricted to ``source_nodes``; empty sources
        pruned (reference: create_edge_dictionary, main.py:387-407). Kept as a
        host-side helper for parity-sensitive search bookkeeping; the hot path
        never builds Python dicts."""
        src, dst = self.rel_edges(relation)
        wanted = set(int(v) for v in source_nodes)
        out: Dict[int, List[int]] = {}
        for s, d in zip(src.tolist(), dst.tolist()):
            if s in wanted:
                out.setdefault(s, []).append(d)
        return out

    def __repr__(self) -> str:
        return (
            f"HeteroGraph(nodes={self.num_nodes}, edges={self.num_edges}, "
            f"relations={self.num_relations}, feat_dim={self.feat_dim})"
        )
