"""Compile-ahead warmer tests: warming must populate the shared jit cache
and must not perturb search results (it never touches the search's rng)."""

import numpy as np
import pytest

from mpgnn_tpu.config import MPGNNConfig, ScorerConfig, SearchConfig
from mpgnn_tpu.graph.generate import generate_synthetic_graph
from mpgnn_tpu.graph.hetero import HeteroGraph
from mpgnn_tpu.graph.io import split_nodes
from mpgnn_tpu.utils.warm import ProgramWarmer


@pytest.fixture(scope="module")
def planted():
    g = generate_synthetic_graph(400, 4, "red-red-blue", seed=11)
    graph = HeteroGraph(
        g["node_features"].astype(np.float32), g["src"], g["dst"], g["rel"],
        num_relations=4, labels=g["labels"],
    )
    return graph, g


def test_warm_flat_populates_jit_cache(planted):
    from mpgnn_tpu.search.scoring import _flat_sweep

    graph, _ = planted
    warmer = ProgramWarmer(max_workers=2)
    before = _flat_sweep._cache_size()
    warmer.warm_flat(graph, [0, 1, 2, 3], ScorerConfig(epochs_flat=7))
    warmer.wait(timeout=300)
    assert _flat_sweep._cache_size() > before


def test_warm_bag_signature_best_effort_on_failure():
    # nonsense shapes must not raise from the background thread
    warmer = ProgramWarmer(max_workers=1)
    warmer.warm_bag_signature(-1, -1, -1, -1, -1, -1, 3, 0.1)
    warmer.wait(timeout=60)


def test_warmed_search_matches_unwarmed(planted):
    from mpgnn_tpu.search import find_metapaths

    graph, g = planted
    split = split_nodes(g["labels"])
    cfg = SearchConfig(
        max_extension_hops=2,
        scorer=ScorerConfig(epochs_flat=25, epochs_bags=15, max_restarts=3),
        mpgnn=MPGNNConfig(epochs=40, hidden_dim=16),
    )
    kw = dict(
        num_classes=2, config=cfg, dataset="synthetic", seed=0,
    )
    labels = np.asarray(g["labels"], np.float32)
    res_plain = find_metapaths(graph, labels, split, **kw)
    warmer = ProgramWarmer(max_workers=2)
    res_warm = find_metapaths(graph, labels, split, warmer=warmer, **kw)
    warmer.wait(timeout=300)
    assert res_warm.metapaths == res_plain.metapaths
    assert res_warm.discovered == res_plain.discovered
    assert res_warm.val_f1_by_path == res_plain.val_f1_by_path
