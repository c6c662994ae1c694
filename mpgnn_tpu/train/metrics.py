"""Evaluation metrics in pure JAX (device-resident, no sklearn round trips).

The reference computes macro-F1 via sklearn inside every epoch
(main.py:1095-1099) — a host sync per epoch. Here the metric is a few segment
sums that fuse into the jitted epoch, so the 1000-epoch loop is ONE device
program.

Note the reference calls ``f1_score(predictions, labels)`` with swapped
arguments (main.py:1095-1099, 1112); per-class F1 is symmetric under that
swap (precision and recall exchange), so macro-F1 over the same class set is
identical and this implementation matches it.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def macro_f1(preds: jnp.ndarray, labels: jnp.ndarray, num_classes: int):
    """Macro-averaged F1 matching sklearn's ``average='macro'``: classes
    absent from both predictions and labels are excluded from the average."""
    f1s = []
    present = []
    for c in range(num_classes):
        tp = jnp.sum((preds == c) & (labels == c))
        fp = jnp.sum((preds == c) & (labels != c))
        fn = jnp.sum((preds != c) & (labels == c))
        denom = 2 * tp + fp + fn
        f1s.append(jnp.where(denom > 0, 2.0 * tp / jnp.maximum(denom, 1), 0.0))
        present.append((tp + fp + fn) > 0)
    f1s = jnp.stack(f1s)
    present = jnp.stack(present).astype(jnp.float32)
    return jnp.sum(f1s * present) / jnp.maximum(jnp.sum(present), 1.0)


def macro_f1_np(preds, labels, num_classes: int | None = None) -> float:
    preds = np.asarray(preds)
    labels = np.asarray(labels)
    if num_classes is None:
        num_classes = int(max(preds.max(initial=0), labels.max(initial=0))) + 1
    return float(macro_f1(jnp.asarray(preds), jnp.asarray(labels), num_classes))
