"""Checkpointing, profiling, and misc utilities."""

from mpgnn_tpu.utils.checkpoint import SearchCheckpoint, save_params, restore_params
from mpgnn_tpu.utils.prof import PhaseTimer, device_trace, enable_compilation_cache

__all__ = [
    "SearchCheckpoint",
    "save_params",
    "restore_params",
    "PhaseTimer",
    "device_trace",
    "enable_compilation_cache",
]
