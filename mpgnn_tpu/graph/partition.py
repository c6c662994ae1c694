"""Partitioned heterogeneous graphs — out-of-core / subgraph training.

The reference replicates the whole graph into every MPI rank (main.py:1309
``comm.bcast(data)``) and trains full-graph only; graphs beyond host (or
HBM) memory are out of reach. Here a ``PartitionedHeteroGraph`` keeps the
big arrays host-side (plain numpy or ``np.memmap`` straight off the native
loader's files) and serves **induced subgraphs over unions of node blocks**
— the Cluster-GCN recipe (Chiang et al., KDD'19), which is also the
jit-friendly one on TPU:

* node blocks are fixed at partition time; a training step samples q blocks,
  takes the induced subgraph of their union, and runs a normal full-graph
  MPGNN step on it;
* subgraph shapes are padded to pow2 buckets, so every step reuses one of a
  small set of compiled programs regardless of which blocks were drawn;
* cross-block edges *within the sampled union* are kept (that is Cluster-GCN
  stochastic multi-partition sampling: larger q -> fewer dropped cut edges).

Partitioning is degree-balanced greedy (METIS is not in this image, and for
the locality the synthetic/KG graphs exhibit, balanced random blocks are the
documented Cluster-GCN fallback).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from mpgnn_tpu.graph.hetero import HeteroGraph


def _pow2(n: int, lo: int = 16) -> int:
    return max(lo, 1 << (max(1, int(n)) - 1).bit_length())


def partition_nodes(
    num_nodes: int,
    num_parts: int,
    edge_src: Optional[np.ndarray] = None,
    seed: int = 0,
) -> np.ndarray:
    """[N] int32 block id per node.

    Degree-balanced greedy: nodes in decreasing degree order go to the block
    with the smallest accumulated degree (ties -> smallest block), which
    keeps per-block induced-edge counts (and so padded step shapes) even.
    Without ``edge_src`` it falls back to a seeded balanced random split."""
    if num_parts <= 1:
        return np.zeros(num_nodes, dtype=np.int32)
    rng = np.random.default_rng(seed)
    part = np.empty(num_nodes, dtype=np.int32)
    if edge_src is None:
        perm = rng.permutation(num_nodes)
        for b in range(num_parts):
            part[perm[b::num_parts]] = b
        return part
    deg = np.bincount(np.asarray(edge_src), minlength=num_nodes).astype(
        np.int64
    )
    # jitter breaks ties between equal-degree nodes deterministically
    order = np.argsort(-(deg * num_nodes + rng.permutation(num_nodes)),
                       kind="stable")
    if num_nodes > 500_000:
        # multi-million-node fast path: snake round-robin over the
        # degree-sorted order (b0..bP-1, bP-1..b0, ...) — O(N) vectorized
        # instead of the O(N * P) python greedy loop below, and within ~1
        # hub degree of its load balance on power-law graphs (each P-wide
        # stripe of the sorted order spreads its near-equal degrees once
        # forward, once backward)
        lane = np.arange(num_nodes) % (2 * num_parts)
        lane = np.where(lane < num_parts, lane, 2 * num_parts - 1 - lane)
        part[order] = lane.astype(np.int32)
        return part
    load = np.zeros(num_parts, dtype=np.int64)
    count = np.zeros(num_parts, dtype=np.int64)
    for v in order:
        b = int(np.lexsort((count, load))[0])
        part[v] = b
        load[b] += deg[v] + 1
        count[b] += 1
    return part


@dataclasses.dataclass
class Subgraph:
    """One induced subgraph in local ids, ready for a training step.

    ``nodes`` maps local -> global id; padded rows replicate the last real
    node (masked out of the loss via ``node_mask``). With halo expansion,
    ``core_mask`` selects the sampled blocks' own nodes (loss/metrics
    restrict to these — halo rows only feed their receptive fields)."""

    graph: HeteroGraph          # local-id induced subgraph (padded features)
    nodes: np.ndarray           # [n_pad] global node ids
    node_mask: np.ndarray       # [n_pad] bool, False on padding
    core_mask: np.ndarray       # [n_pad] bool, True on the blocks' own nodes
    num_real_nodes: int
    num_real_edges: int


class PartitionedHeteroGraph:
    """Host-resident partitioned graph serving padded induced subgraphs.

    ``x`` may be an ``np.memmap`` (features never fully materialized); edge
    arrays may likewise be memmaps from the native loader. Only the sampled
    subgraph's rows are ever copied to device."""

    def __init__(
        self,
        x: np.ndarray,
        edge_src: np.ndarray,
        edge_dst: np.ndarray,
        edge_type: np.ndarray,
        num_relations: int,
        num_parts: int,
        labels: Optional[np.ndarray] = None,
        seed: int = 0,
    ):
        self.x = x
        self.num_nodes = int(x.shape[0])
        self.feat_dim = int(x.shape[1])
        self.num_relations = int(num_relations)
        self.labels = labels
        self.num_parts = int(num_parts)
        self.edge_src = np.asarray(edge_src)
        self.edge_dst = np.asarray(edge_dst)
        self.edge_type = np.asarray(edge_type)
        self.part = partition_nodes(
            self.num_nodes, num_parts, self.edge_src, seed
        )
        # block membership lists + per-edge source block (host, O(N + E))
        self._block_nodes: List[np.ndarray] = [
            np.flatnonzero(self.part == b).astype(np.int64)
            for b in range(self.num_parts)
        ]
        self._sub_cache: Dict[Tuple[int, ...], Subgraph] = {}

    @classmethod
    def from_graph(
        cls, graph: HeteroGraph, num_parts: int, seed: int = 0
    ) -> "PartitionedHeteroGraph":
        return cls(
            graph.x, graph.edge_src, graph.edge_dst, graph.edge_type,
            graph.num_relations, num_parts, labels=graph.labels, seed=seed,
        )

    def block_nodes(self, block: int) -> np.ndarray:
        return self._block_nodes[block]

    def subgraph(
        self, blocks: Sequence[int], halo_hops: int = 0, cache: bool = True,
        halo_relations: Optional[Sequence[int]] = None,
    ) -> Subgraph:
        """Induced subgraph of the union of ``blocks``, local ids, padded to
        pow2 node/edge buckets so step programs are reused across draws.

        ``halo_hops=L`` expands the node set L times along the aggregation
        direction (out[src] reads x[dst], mp_rgcn_layer.py:98: flow
        target_to_source), so every core node's L-hop receptive field is
        complete — core predictions/gradients are then EXACT, not the
        cut-edge Cluster-GCN approximation. Memory grows with the halo; 0
        keeps the pure Cluster-GCN behavior.

        ``halo_relations`` restricts the expansion to edges of the given
        relation types. For FIXED-metapath training only the metapath's
        relations carry receptive field (each hop aggregates exactly one
        relation), so expanding along the others buys nothing and — on
        power-law KGs, where any hub edge pulls the hub and the hub pulls
        everything — inflates the halo toward the whole graph."""
        blocks_key = tuple(sorted(int(b) for b in set(blocks)))
        rel_key = (None if halo_relations is None
                   else tuple(sorted(set(int(r) for r in halo_relations))))
        key = (int(halo_hops), rel_key) + blocks_key
        if cache and key in self._sub_cache:
            return self._sub_cache[key]
        member = np.zeros(self.num_nodes, dtype=bool)
        for b in blocks_key:
            member[self._block_nodes[b]] = True
        core = member.copy()
        rel_ok = None
        if rel_key is not None and int(halo_hops) > 0:
            rel_ok = np.isin(self.edge_type, np.asarray(rel_key))
        for _ in range(int(halo_hops)):
            grew = member[self.edge_src]      # O(E) streaming pass per hop
            if rel_ok is not None:
                grew &= rel_ok
            member[self.edge_dst[grew]] = True
        nodes = np.flatnonzero(member)
        n = len(nodes)
        n_pad = _pow2(n)
        # global -> local map (memmap-safe: plain int64 array over N)
        loc = np.full(self.num_nodes, -1, dtype=np.int64)
        loc[nodes] = np.arange(n, dtype=np.int64)
        keep = (loc[self.edge_src] >= 0) & (loc[self.edge_dst] >= 0)
        s = loc[self.edge_src[keep]]
        d = loc[self.edge_dst[keep]]
        t = self.edge_type[keep]
        e = len(s)
        e_pad = _pow2(e)
        # padding edges are self-loops on a padding node under a DEDICATED
        # extra relation id (= num_relations): real relations' edge counts,
        # ELL widths and aggregations are untouched, and no metapath ever
        # references the pad relation. The local graph therefore reports
        # num_relations + 1 relations.
        pad_node = n_pad - 1
        sp = np.full(e_pad, pad_node, dtype=np.int64)
        dp = np.full(e_pad, pad_node, dtype=np.int64)
        tp = np.full(e_pad, self.num_relations, dtype=np.int64)
        sp[:e], dp[:e], tp[:e] = s, d, t
        x_sub = np.zeros((n_pad, self.feat_dim), dtype=np.float32)
        x_sub[:n] = self.x[nodes]          # the only feature rows touched
        labels_sub = None
        if self.labels is not None:
            labels_sub = np.zeros(n_pad, dtype=np.asarray(self.labels).dtype)
            labels_sub[:n] = np.asarray(self.labels)[nodes]
        g = HeteroGraph(
            x_sub, sp, dp, tp, num_relations=self.num_relations + 1,
            labels=labels_sub,
        )
        mask = np.zeros(n_pad, dtype=bool)
        mask[:n] = True
        core_mask = np.zeros(n_pad, dtype=bool)
        core_mask[:n] = core[nodes]
        sub = Subgraph(
            graph=g, nodes=np.concatenate(
                [nodes, np.full(n_pad - n, nodes[-1] if n else 0, np.int64)]
            ),
            node_mask=mask, core_mask=core_mask,
            num_real_nodes=n, num_real_edges=e,
        )
        if cache:
            self._sub_cache[key] = sub
        return sub

    def edge_cut_fraction(self, blocks_per_step: int = 1) -> float:
        """Expected fraction of edges crossing a random q-block union —
        the Cluster-GCN information loss knob (q up -> loss down)."""
        same = self.part[self.edge_src] == self.part[self.edge_dst]
        within = float(np.mean(same)) if len(same) else 1.0
        q = blocks_per_step
        p_both = within + (1 - within) * max(q - 1, 0) / max(
            self.num_parts - 1, 1
        )
        return 1.0 - p_both

    def __repr__(self) -> str:
        return (
            f"PartitionedHeteroGraph(nodes={self.num_nodes}, "
            f"edges={len(self.edge_src)}, parts={self.num_parts}, "
            f"cut={self.edge_cut_fraction():.2%})"
        )


def locality_permutation(
    src: np.ndarray, dst: np.ndarray, num_nodes: int
) -> np.ndarray:
    """[N] old node ids in a BFS-clustered order (``old_of_new``).

    Contiguous-id block sharding (parallel/halo.py) inherits whatever
    locality the file's node numbering happens to have; renumbering nodes by
    BFS discovery order clusters each neighborhood into a contiguous id
    range, so block partitions cut fewer edges and halos shrink. Seeds are
    taken in decreasing-degree order (hubs anchor their communities);
    traversal is frontier-vectorized (no per-node Python loop on the BFS
    itself). O(E) total.
    """
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    # undirected CSR of the union graph
    u = np.concatenate([src, dst])
    v = np.concatenate([dst, src])
    order = np.argsort(u, kind="stable")
    u, v = u[order], v[order]
    indptr = np.zeros(num_nodes + 1, np.int64)
    np.cumsum(np.bincount(u, minlength=num_nodes), out=indptr[1:])
    deg = indptr[1:] - indptr[:-1]

    visited = np.zeros(num_nodes, bool)
    out = np.empty(num_nodes, np.int64)
    pos = 0
    seeds = np.argsort(-deg, kind="stable")
    si = 0
    while pos < num_nodes:
        while si < num_nodes and visited[seeds[si]]:
            si += 1
        if si >= num_nodes:
            break
        s0 = int(seeds[si])
        visited[s0] = True
        out[pos] = s0
        pos += 1
        frontier = np.array([s0], np.int64)
        while frontier.size:
            starts, lens = indptr[frontier], deg[frontier]
            total = int(lens.sum())
            if total == 0:
                break
            # vectorized flat-range concat: index of every frontier edge
            base = np.repeat(starts - np.concatenate(
                ([0], np.cumsum(lens)[:-1])
            ), lens)
            nbrs = v[base + np.arange(total)]
            nbrs = np.unique(nbrs)
            fresh = nbrs[~visited[nbrs]]
            if fresh.size == 0:
                break
            visited[fresh] = True
            out[pos: pos + fresh.size] = fresh
            pos += fresh.size
            frontier = fresh
    assert pos == num_nodes
    return out


def _permute_labels(labels, old_of_new, num_nodes):
    labels = np.asarray(labels)
    if len(labels) != num_nodes:
        raise ValueError(
            "locality_reorder needs per-node labels (len == num_nodes); "
            "labeled-subset tables would keep stale ids"
        )
    return labels[old_of_new]


def locality_reorder(graph: HeteroGraph, split=None):
    """Relabel a graph's nodes by BFS-clustered order for halo sharding.

    Returns ``(graph2, split2, old_of_new)``: a NEW HeteroGraph whose node
    ids cluster neighborhoods (features/labels/edges relabeled; relation
    structure and per-relation edge multisets unchanged — aggregation is
    permutation-invariant) and the split with its indices remapped. Metrics
    computed on graph2/split2 equal the originals; only id-addressed
    artifacts (per-node predictions) need ``old_of_new`` to map back."""
    from mpgnn_tpu.graph.hetero import NodeSplit

    old_of_new = locality_permutation(
        graph.edge_src, graph.edge_dst, graph.num_nodes
    )
    new_of_old = np.empty_like(old_of_new)
    new_of_old[old_of_new] = np.arange(graph.num_nodes, dtype=np.int64)
    graph2 = HeteroGraph(
        graph.x[old_of_new],
        new_of_old[graph.edge_src],
        new_of_old[graph.edge_dst],
        graph.edge_type,
        num_relations=graph.num_relations,
        labels=None if graph.labels is None else _permute_labels(
            graph.labels, old_of_new, graph.num_nodes
        ),
    )
    split2 = None
    if split is not None:
        remap = lambda a: new_of_old[np.asarray(a, np.int64)]  # noqa: E731
        split2 = NodeSplit(
            node_idx=remap(split.node_idx),
            train_idx=remap(split.train_idx), train_y=split.train_y,
            val_idx=remap(split.val_idx), val_y=split.val_y,
            test_idx=remap(split.test_idx), test_y=split.test_y,
        )
    return graph2, split2, old_of_new
