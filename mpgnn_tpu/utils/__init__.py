"""Checkpointing, profiling, and misc utilities."""

from mpgnn_tpu.utils.checkpoint import SearchCheckpoint, save_params, restore_params
from mpgnn_tpu.utils.prof import PhaseTimer, device_trace, enable_compilation_cache
from mpgnn_tpu.utils.misc import (
    most_frequent,
    one_hot_encoding,
    negative_sampling,
    save_confusion_matrix,
    find_smallest_values,
)

__all__ = [
    "SearchCheckpoint",
    "save_params",
    "restore_params",
    "PhaseTimer",
    "device_trace",
    "enable_compilation_cache",
    "most_frequent",
    "one_hot_encoding",
    "negative_sampling",
    "save_confusion_matrix",
    "find_smallest_values",
]
