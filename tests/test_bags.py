"""Bag machinery and selection-rule tests (main.py:545-634, 1336-1424)."""

import numpy as np

from mpgnn_tpu.search.bags import (
    bag_gap_selection,
    clean_dictionaries,
    connected_relations,
    create_bags,
    flat_gap_selection,
    relabel_from_predictions,
)
from mpgnn_tpu.graph.hetero import HeteroGraph


def test_create_bags_reference_semantics():
    # src 10 -> dsts [1, 2, 3]; dest labels: 1 all-positive, 2 mixed, 3 pos
    edge_dict = {10: [1, 2, 3], 11: [2]}
    dest_dict = {1: [1.0, 1.0], 2: [1.0, 0.0], 3: [1.0]}
    bags, labels = create_bags(edge_dict, dest_dict)
    # src 10: dst 2 -> negative singleton first, then positive bag [1, 3]
    # src 11: dst 2 already a negative singleton -> dedup'd
    assert bags == [[2], [1, 3]]
    np.testing.assert_allclose(labels, [0.0, 1.0])


def test_create_bags_dedup_order():
    edge_dict = {1: [5], 2: [5]}
    dest_dict = {5: [1.0]}
    bags, labels = create_bags(edge_dict, dest_dict)
    assert bags == [[5]]
    np.testing.assert_allclose(labels, [1.0])


def test_flat_gap_selection_cuts_at_largest_gap():
    items = [(0, 0.01), (1, 0.02), (2, 0.5), (3, 0.6)]
    kept = flat_gap_selection(items)
    assert [r for r, _ in kept] == [0, 1]
    # fewer than 3 -> keep all (len(diffs) < 2, main.py:1350-1355)
    assert flat_gap_selection(items[:2]) == items[:2]


def test_bag_gap_selection_reference_branching():
    items4 = [(0, 0.01), (1, 0.02), (2, 0.5), (3, 0.6)]
    kept = bag_gap_selection(items4)
    # strict < the value at the gap start (main.py:1424): 0.02 is excluded
    assert [r for r, _ in kept] == [0]
    # 1 or 2 items -> keep all
    assert bag_gap_selection(items4[:2]) == items4[:2]
    assert bag_gap_selection(items4[:1]) == items4[:1]
    # exactly 3 items -> reference admits nothing (main.py:1418-1424 quirk)
    assert bag_gap_selection(items4[:3]) == []


def test_clean_dictionaries_attribution_filter():
    x = np.array([[1.0, 0.0], [0.0, 1.0]], np.float32)
    u = np.array([1.0, 0.0], np.float32)  # node 1 has dot 0 < 0.01
    edge_dict = {0: [5], 1: [5, 6]}
    dest_dict = {5: [0.0, 1.0], 6: [0.0]}
    e, d = clean_dictionaries(x, edge_dict, dest_dict, u)
    assert 1 not in e and 0 in e
    assert d[5] == [1.0]      # one 0 removed
    assert d[6] == []         # its only 0 removed


def test_relabel_threshold():
    pred_max = np.array([0.95, 0.5, 0.91, 0.0])
    recorded = np.array([True, True, False, False])
    src, labels = relabel_from_predictions(pred_max, recorded, 4)
    assert src == [0, 1]
    np.testing.assert_allclose(labels, [1.0, 0.0, 0.0, 0.0])


def test_connected_relations_modes():
    src = np.array([0, 1, 2, 3])
    dst = np.array([1, 2, 3, 0])
    rel = np.array([0, 1, 2, 1])
    g = HeteroGraph(np.ones((4, 2), np.float32), src, dst, rel, num_relations=3)
    labels = np.array([1.0, 0.0, 1.0, 0.0])
    assert connected_relations(g, node_labels=labels) == [0, 2]
    assert connected_relations(g, source_nodes=[1, 3]) == [1]
    assert connected_relations(g, bag_members=[2, 3]) == [2, 1]


def test_bag_gap_selection_inclusive_mode():
    """inclusive=True keeps the clear winner the reference's strict < drops
    (upstream bug: gap right after the best relation admits nothing)."""
    items = [(2, 0.0), (0, 0.0098), (1, 0.0109), (3, 0.0159)]
    assert bag_gap_selection(items) == []          # parity: nothing survives
    kept = bag_gap_selection(items, inclusive=True)
    assert [r for r, _ in kept] == [2]
    # 3-candidate case also behaves sensibly in inclusive mode
    items3 = [(0, 0.01), (1, 0.5), (2, 0.6)]
    assert bag_gap_selection(items3) == []
    assert [r for r, _ in bag_gap_selection(items3, inclusive=True)] == [0]
