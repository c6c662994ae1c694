"""Jitted training loops and metrics."""

from mpgnn_tpu.train.metrics import macro_f1, macro_f1_np
from mpgnn_tpu.train.loops import (
    MPGNNTrainResult,
    train_mpgnn,
    evaluate_mpgnn,
)

__all__ = [
    "macro_f1",
    "macro_f1_np",
    "MPGNNTrainResult",
    "train_mpgnn",
    "evaluate_mpgnn",
]
