"""Small auxiliary utilities with reference counterparts.

These mirror helper functions present in the reference that sit outside the
main search flow (kept for feature completeness): most-frequent value
(main.py:34-37), one-hot label encoding (main.py:45-54), negative sampling
(main.py:1020-1035), confusion-matrix persistence (main.py:1037-1053,
without the matplotlib/mlxtend plotting — not available here; saved as text
+ .npy), and the DBSCAN singleton-cluster finder (main.py:1162-1189).
"""

from __future__ import annotations

from collections import Counter
from typing import List, Optional, Sequence

import numpy as np


def most_frequent(values: Sequence) -> object:
    """valore_piu_frequente (main.py:34-37)."""
    return Counter(values).most_common(1)[0][0]


def one_hot_encoding(labels: Sequence[int]) -> np.ndarray:
    """one_hot_encoding (main.py:45-54): one column per distinct label value
    (sorted), one row per element."""
    labels = np.asarray(labels)
    classes = np.unique(labels)
    out = np.zeros((len(labels), len(classes)), dtype=np.float32)
    for j, c in enumerate(classes):
        out[labels == c, j] = 1.0
    return out


def negative_sampling(
    labels: np.ndarray, rng: Optional[np.random.Generator] = None
) -> List[int]:
    """Balanced negative sampling (main.py:1020-1035): all positive indices
    plus an equal+1 number of random negative indices (with replacement,
    as the reference's random.sample-per-draw loop allows repeats)."""
    rng = rng or np.random.default_rng(0)
    labels = np.asarray(labels).reshape(-1)
    mask = np.nonzero(labels == 1)[0].tolist()
    negatives = np.nonzero(labels == 0)[0]
    n_pos = len(mask)
    draws = rng.choice(negatives, size=n_pos + 1, replace=True)
    return mask + draws.tolist()


def save_confusion_matrix(
    y_true: Sequence[int], y_pred: Sequence[int], path_prefix: str
) -> np.ndarray:
    """Confusion matrix persisted as .npy + .txt (reference plots a jpg via
    matplotlib/mlxtend, main.py:1047-1053)."""
    from sklearn.metrics import confusion_matrix

    cm = confusion_matrix(list(y_true), list(y_pred))
    np.save(path_prefix + ".npy", cm)
    with open(path_prefix + ".txt", "w") as f:
        f.write(np.array2string(cm))
    return cm


def find_smallest_values(accuracies: Sequence[float]):
    """DBSCAN singleton-cluster outlier finder (main.py:1162-1189): returns
    the values of a single-element cluster if one exists, else the minimum."""
    from sklearn.cluster import DBSCAN

    arr = np.asarray(list(accuracies), dtype=np.float64).reshape(-1, 1)
    db = DBSCAN(eps=0.1, min_samples=1).fit(arr)
    for label in np.unique(db.labels_):
        idx = np.nonzero(db.labels_ == label)[0]
        if len(idx) == 1:
            return [float(arr[i, 0]) for i in idx]
    return float(arr.min())


def balanced_undersample(
    node_idx: Sequence[int],
    labels: Sequence[int],
    rng: Optional[np.random.Generator] = None,
):
    """Class-balanced undersampling to the minority class size — the
    reference's dead RandomUnderSampler branch (main.py:306-344, guarded by
    v=False), reimplemented without imblearn. Returns (indices, labels)."""
    rng = rng or np.random.default_rng(42)
    node_idx = np.asarray(list(node_idx))
    labels = np.asarray(list(labels))
    classes, counts = np.unique(labels, return_counts=True)
    n_min = int(counts.min())
    keep = []
    for c in classes:
        members = np.nonzero(labels == c)[0]
        keep.append(rng.choice(members, size=n_min, replace=False))
    keep = np.concatenate(keep)
    return node_idx[keep], labels[keep]
