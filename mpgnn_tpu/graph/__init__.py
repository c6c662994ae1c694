"""Heterogeneous-graph data structures, loaders and generators."""

from mpgnn_tpu.graph.hetero import HeteroGraph, NodeSplit, RelationBatch
from mpgnn_tpu.graph.io import (
    load_dat_files,
    load_synthetic,
    load_fb15k237,
    binarize_labels,
    one_hot_features,
    split_nodes,
    mask_label_leak,
)
from mpgnn_tpu.graph.generate import generate_synthetic_graph
from mpgnn_tpu.graph.gtn import export_gtn

__all__ = [
    "HeteroGraph",
    "NodeSplit",
    "RelationBatch",
    "load_dat_files",
    "load_synthetic",
    "load_fb15k237",
    "binarize_labels",
    "one_hot_features",
    "split_nodes",
    "mask_label_leak",
    "generate_synthetic_graph",
    "export_gtn",
]
