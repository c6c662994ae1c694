"""Relation-masked aggregation kernels — the TPU-native replacement for the
reference's torch_scatter / torch_sparse dependency surface
(mp_rgcn_layer.py:274-357)."""

from mpgnn_tpu.ops.segment import (
    segment_sum,
    segment_mean,
    segment_max,
    segment_argmax,
    masked_segment_mean,
)
from mpgnn_tpu.ops.spmm import (
    rel_mean_aggregate,
    ell_mean_aggregate,
    dense_adjacency,
    ell_max_gather,
)

__all__ = [
    "segment_sum",
    "segment_mean",
    "segment_max",
    "segment_argmax",
    "masked_segment_mean",
    "rel_mean_aggregate",
    "ell_mean_aggregate",
    "dense_adjacency",
    "ell_max_gather",
]
