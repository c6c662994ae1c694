"""Greedy metapath search engine — vmapped relation sweeps replacing the
reference's mpi4py fan-out (main.py:1191-1476)."""

from mpgnn_tpu.search.engine import SearchResult, find_metapaths, MetapathState
from mpgnn_tpu.search.scoring import (
    score_relations_flat,
    score_relations_bags,
    score_bag_tasks,
    retrain_bags_predictions,
    FlatScore,
    BagScore,
)
from mpgnn_tpu.search.bags import (
    create_bags,
    clean_dictionaries,
    relabel_from_predictions,
    flat_gap_selection,
    bag_gap_selection,
    connected_relations,
    build_dictionaries,
)

__all__ = [
    "SearchResult",
    "find_metapaths",
    "MetapathState",
    "score_relations_flat",
    "score_relations_bags",
    "score_bag_tasks",
    "retrain_bags_predictions",
    "FlatScore",
    "BagScore",
    "create_bags",
    "clean_dictionaries",
    "relabel_from_predictions",
    "flat_gap_selection",
    "bag_gap_selection",
    "connected_relations",
    "build_dictionaries",
]
