"""Loaders for the reference's on-disk ``.dat`` TSV formats and the exact
stratified split used for accuracy parity.

Formats (verified against the reference's shipped synthetic datasets):
  node.dat  : node_id \t feat_0 \t feat_1 ...
  link.dat  : src \t relation_id \t dst
  label.dat : node_id \t label

A C++ fast-path parser (mpgnn_tpu/native) is used when built; the pandas
path is the portable fallback. Reference loaders: main.py:86-195 (load_files,
load_files_fb15k237, load_files_acm), main.py:347-372 (features/edges).
"""

from __future__ import annotations

import dataclasses
import os
from typing import List, Optional, Sequence, Tuple

import numpy as np

from mpgnn_tpu.graph.hetero import HeteroGraph, NodeSplit


# --------------------------------------------------------------------- parse
def _read_tsv_ints(path: str) -> np.ndarray:
    """Fast integer TSV reader via the native C++ parser when available."""
    from mpgnn_tpu.native import load_int_tsv  # lazy: builds on first use

    return load_int_tsv(path)


def read_node_features(path: str) -> np.ndarray:
    """node.dat -> [N, F] float32. Column 0 is the node id (assumed dense,
    sorted); remaining columns are features. The reference one-hot encodes a
    single string column via pd.get_dummies for color datasets
    (main.py:347-355); numeric files load as-is."""
    import pandas as pd

    df = pd.read_csv(path, sep="\t", header=None)
    df = df.dropna(axis=1, how="all")
    node_ids = df[0].to_numpy()
    feats = df.drop(columns=[0])
    if feats.shape[1] == 1 and feats.dtypes.iloc[0] == object:
        # one string column: one-hot encode like pd.get_dummies (main.py:348)
        feats = pd.get_dummies(feats[feats.columns[0]])
    x = feats.to_numpy().astype(np.float32)
    order = np.argsort(node_ids)
    if not np.array_equal(order, np.arange(len(node_ids))):
        x = x[order]
    return x


def read_links(path: str) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """link.dat -> (src, rel, dst) int arrays, file order preserved
    (get_edge_index_and_type_no_reverse, main.py:366-372: NO reverse edges
    are added)."""
    try:
        arr = _read_tsv_ints(path)
    except Exception:
        arr = np.loadtxt(path, dtype=np.int64, ndmin=2)
    if arr.shape[1] != 3:
        raise ValueError(f"{path}: expected 3 columns, got {arr.shape[1]}")
    return arr[:, 0], arr[:, 1], arr[:, 2]


def read_labels(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """label.dat -> (node_ids, labels)."""
    try:
        arr = _read_tsv_ints(path)
    except Exception:
        arr = np.loadtxt(path, dtype=np.int64, ndmin=2)
    return arr[:, 0], arr[:, 1]


# ------------------------------------------------------------------- loaders
def binarize_labels(labels: np.ndarray) -> List[np.ndarray]:
    """One-vs-rest binarization for multi-class label vectors
    (reference: main.py:159-175). Binary datasets pass through unchanged;
    multi-class datasets yield one 0/1 vector per class (class order =
    np.unique order, matching torch.unique's sorted order)."""
    labels = np.asarray(labels)
    classes = np.unique(labels)
    if len(classes) > 2:
        return [(labels == c).astype(labels.dtype) for c in classes]
    return [labels]


def load_dat_files(
    node_file: str, link_file: str, label_file: str
) -> Tuple[HeteroGraph, np.ndarray, List[np.ndarray]]:
    """Generic loader (reference ``load_files``, main.py:178-195).

    Returns (graph, labels, binary_labels). ``num_relations`` is the count of
    distinct relation ids in the file (main.py:193)."""
    x = read_node_features(node_file)
    src, rel, dst = read_links(link_file)
    _, labels = read_labels(label_file)
    num_rel = int(len(np.unique(rel)))
    g = HeteroGraph(
        x, src, dst, rel, num_relations=int(rel.max()) + 1 if len(rel) else 0,
        labels=labels,
    )
    g.distinct_relations = num_rel  # matches reference tot_relation_types
    return g, labels, binarize_labels(labels)


def load_synthetic(folder: str) -> Tuple[HeteroGraph, np.ndarray, List[np.ndarray]]:
    return load_dat_files(
        os.path.join(folder, "node.dat"),
        os.path.join(folder, "link.dat"),
        os.path.join(folder, "label.dat"),
    )


def load_fb15k237(
    node_file: str, link_file: str, label_file: str
) -> Tuple[HeteroGraph, np.ndarray, List[np.ndarray], List[int]]:
    """FB15K-237 loader (reference ``load_files_fb15k237``, main.py:138-176).

    Only a subset of nodes carry labels; returns the ordered list of labeled
    source nodes (the ``source_nodes_with_labels`` mask) whose order aligns
    with the label vector."""
    x = read_node_features(node_file)
    src, rel, dst = read_links(link_file)
    label_nodes, labels = read_labels(label_file)
    g = HeteroGraph(
        x, src, dst, rel, num_relations=int(rel.max()) + 1 if len(rel) else 0,
        labels=labels,
    )
    g.distinct_relations = int(len(np.unique(rel)))
    return g, labels, binarize_labels(labels), [int(v) for v in label_nodes]


def load_acm_style(
    node_file: str, link_file: str, folder: str
) -> Tuple[HeteroGraph, "PreSplitLabels", List[np.ndarray]]:
    """ACM/DBLP/IMDB loader (reference ``load_files_acm``, main.py:86-136):
    pre-split labels from labels_{train,val,test}.dat plus one-vs-rest
    binarization over the concatenated label vector. The concatenation order
    (train, val, test) matters: binary label vectors align with the
    concatenated source-node list (main.py:115-116)."""
    import pandas as pd

    x = read_node_features(node_file)
    src, rel, dst = read_links(link_file)

    parts = {}
    for name in ("train", "val", "test"):
        df = pd.read_csv(
            os.path.join(folder, f"labels_{name}.dat"), sep="\t", header=None
        )
        parts[name] = (df[0].to_numpy(np.int64), df[1].to_numpy(np.int64))

    sources = np.concatenate(
        [parts["train"][0], parts["val"][0], parts["test"][0]]
    )
    labels = np.concatenate(
        [parts["train"][1], parts["val"][1], parts["test"][1]]
    )
    g = HeteroGraph(
        x, src, dst, rel,
        num_relations=int(rel.max()) + 1 if len(rel) else 0, labels=labels,
    )
    g.distinct_relations = int(len(np.unique(rel)))
    presplit = PreSplitLabels(
        train_idx=parts["train"][0], train_y=parts["train"][1],
        val_idx=parts["val"][0], val_y=parts["val"][1],
        test_idx=parts["test"][0], test_y=parts["test"][1],
        sources=sources, labels=labels,
    )
    return g, presplit, binarize_labels(labels)


@dataclasses.dataclass(frozen=True)
class PreSplitLabels:
    """Pre-split labels as shipped by ACM/DBLP/IMDB datasets."""

    train_idx: np.ndarray
    train_y: np.ndarray
    val_idx: np.ndarray
    val_y: np.ndarray
    test_idx: np.ndarray
    test_y: np.ndarray
    sources: np.ndarray
    labels: np.ndarray

    def as_split(self) -> NodeSplit:
        return NodeSplit(
            node_idx=self.sources,
            train_idx=self.train_idx, train_y=self.train_y,
            val_idx=self.val_idx, val_y=self.val_y,
            test_idx=self.test_idx, test_y=self.test_y,
        )


def one_hot_features(values: Sequence) -> np.ndarray:
    """pd.get_dummies-equivalent one-hot for a value column
    (reference get_node_features, main.py:347-355)."""
    import pandas as pd

    return pd.get_dummies(pd.Series(values)).to_numpy().astype(np.float32)


# --------------------------------------------------------------------- split
def _find_unique_indices(nums: Sequence[int]) -> List[int]:
    """Indices of values occurring exactly once, in first-occurrence order
    (reference find_unique_indices, main.py:254-270)."""
    count = {}
    for i, num in enumerate(nums):
        if num in count:
            count[num][0] += 1
        else:
            count[num] = [1, i]
    return [idx for _, (occ, idx) in count.items() if occ == 1]


def split_nodes(
    labels: np.ndarray,
    node_idx: Optional[Sequence[int]] = None,
    seed: int = 415,
) -> NodeSplit:
    """Stratified 90/10 then 80/20 split, exactly reproducing the reference
    (splitting_node_and_labels, main.py:277-345): singleton-class members are
    pulled out first and appended to train; sklearn train_test_split with
    random_state=415 and stratify drives both splits, so index sets are
    bit-identical to the reference given the same inputs."""
    from sklearn.model_selection import train_test_split

    labels = np.asarray(labels)
    if node_idx is None:
        node_idx = list(range(len(labels)))
    else:
        node_idx = [int(v) for v in node_idx]
    lab = [int(v) for v in labels]

    unique_indices = _find_unique_indices(lab)
    nodes_removed: List[int] = []
    lab_removed: List[int] = []
    if unique_indices:
        for idx in sorted(unique_indices, reverse=True):
            nodes_removed.append(node_idx.pop(idx))
            lab_removed.append(lab.pop(idx))

    train_idx, test_idx, train_y, test_y = train_test_split(
        node_idx, lab, random_state=seed, stratify=lab, test_size=0.1
    )
    train_idx, val_idx, train_y, val_y = train_test_split(
        train_idx, train_y, random_state=seed, stratify=train_y, test_size=0.2
    )
    if unique_indices:
        train_idx = list(train_idx) + nodes_removed
        train_y = list(train_y) + lab_removed

    return NodeSplit(
        node_idx=np.asarray(node_idx, dtype=np.int64),
        train_idx=np.asarray(train_idx, dtype=np.int64),
        train_y=np.asarray(train_y, dtype=np.int64),
        val_idx=np.asarray(val_idx, dtype=np.int64),
        val_y=np.asarray(val_y, dtype=np.int64),
        test_idx=np.asarray(test_idx, dtype=np.int64),
        test_y=np.asarray(test_y, dtype=np.int64),
    )


def mask_label_leak(x: np.ndarray, split: NodeSplit) -> np.ndarray:
    """Zero the feature rows of every split node (reference ``sn``,
    main.py:357-364) — used on FB15K-237 where labels derive from features."""
    x = x.copy()
    for idx in (split.test_idx, split.val_idx, split.train_idx):
        x[np.asarray(idx, dtype=np.int64)] = 0.0
    return x
