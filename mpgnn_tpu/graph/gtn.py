"""GTN (Graph Transformer Network) format export.

Parity target: reference ``gtn_files`` (main.py:197-252): per-relation scipy
CSR adjacency pickles over the relation's induced node set, [train, val,
test] label lists, and the node-feature matrix.
"""

from __future__ import annotations

import os
import pickle
import numpy as np

from mpgnn_tpu.graph.hetero import HeteroGraph, NodeSplit


def export_gtn(graph: HeteroGraph, split: NodeSplit, path: str) -> None:
    from scipy.sparse import csr_matrix

    os.makedirs(path, exist_ok=True)

    edges_list = []
    for r in graph.present_relations():
        src, dst = graph.rel_edges(r)
        # re-index onto the relation's own node set (main.py:211-222)
        node_ids = sorted(set(src.tolist()) | set(dst.tolist()))
        remap = {n: i for i, n in enumerate(node_ids)}
        rows = [remap[int(s)] for s in src]
        cols = [remap[int(d)] for d in dst]
        vals = np.ones(len(rows))
        edges_list.append(
            csr_matrix((vals, (rows, cols)), shape=(len(node_ids), len(node_ids)))
        )
    with open(os.path.join(path, "edges.pkl"), "wb") as f:
        pickle.dump(edges_list, f, protocol=pickle.HIGHEST_PROTOCOL)

    labels_list = [
        [[int(i), int(y)] for i, y in zip(split.train_idx, split.train_y)],
        [[int(i), int(y)] for i, y in zip(split.val_idx, split.val_y)],
        [[int(i), int(y)] for i, y in zip(split.test_idx, split.test_y)],
    ]
    with open(os.path.join(path, "labels.pkl"), "wb") as f:
        pickle.dump(labels_list, f, protocol=pickle.HIGHEST_PROTOCOL)

    with open(os.path.join(path, "node_features.pkl"), "wb") as f:
        pickle.dump(np.asarray(graph.x), f, protocol=pickle.HIGHEST_PROTOCOL)
