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


def test_warm_eval_registers_events_synchronously(planted):
    """A real call racing a still-queued warm must find its in-flight event
    (registered on the submitting thread), wait, then consume + evict the
    executable."""
    import threading

    from mpgnn_tpu.train import batch_eval as be

    graph, g = planted
    split = split_nodes(g["labels"])
    cfg = MPGNNConfig(epochs=5, hidden_dim=8)
    paths = [[0], [1]]
    keys = be.eval_aot_keys(graph, paths, split, 2, cfg, seed=0)
    for k in keys:
        be._aot_store.pop(k, None)
        be._aot_inflight.pop(k, None)

    warmer = ProgramWarmer(max_workers=1)
    gate = threading.Event()
    warmer._pool.submit(gate.wait)  # occupy the single worker
    warmer.warm_eval(graph, paths, split, 2, cfg, 0, None)
    # events exist BEFORE any pool thread has run the warm task
    for k in keys:
        assert k in be._aot_inflight and not be._aot_inflight[k].is_set()
    gate.set()
    warmer.wait(timeout=600)
    for k in keys:
        assert be._aot_inflight[k].is_set()
        assert k in be._aot_store

    out = be.evaluate_candidates(graph, paths, split, 2, cfg, seed=0)
    assert set(out) == {"[0]", "[1]"}
    # consumed executables are evicted (no unbounded growth)
    for k in keys:
        assert k not in be._aot_store and k not in be._aot_inflight


def test_aot_key_covers_split_shapes_and_classes(planted):
    """A later one-vs-rest class with the same path set but different split
    shapes or class count compiles a DIFFERENT program — its key must differ
    (the round-1 dedup keyed only on the path set and hit stale entries)."""
    import dataclasses

    from mpgnn_tpu.train import batch_eval as be

    graph, g = planted
    split = split_nodes(g["labels"])
    cfg = MPGNNConfig(epochs=5, hidden_dim=8)
    k0 = be.eval_aot_keys(graph, [[0]], split, 2, cfg, seed=0)
    split2 = dataclasses.replace(
        split, train_idx=split.train_idx[:-3], train_y=split.train_y[:-3]
    )
    k1 = be.eval_aot_keys(graph, [[0]], split2, 2, cfg, seed=0)
    k2 = be.eval_aot_keys(graph, [[0]], split, 3, cfg, seed=0)
    assert k0 != k1
    assert k0 != k2


@pytest.mark.slow
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


def test_claim_aot_keys_single_owner_on_overlap():
    """Per-key compile ownership (round-4 advisor fix): when two warm
    tasks' key sets overlap, only the task that actually registered a
    key's event owns it — the other must see 'another task's in-progress
    compile' and skip, instead of both passing the self-skip guard and
    launching duplicate 20-577s remote compiles. __exit__ restores the
    previous binding (nest-safe)."""
    from mpgnn_tpu.train import batch_eval as be

    k_shared, k_a, k_b = ("t4", "shared"), ("t4", "a"), ("t4", "b")
    for k in (k_shared, k_a, k_b):
        be._aot_inflight.pop(k, None)
        be._aot_owner.pop(k, None)
    try:
        tok1, ev1 = be.claim_aot_keys([k_shared, k_a])
        tok2, ev2 = be.claim_aot_keys([k_shared, k_b])
        assert len(ev1) == 2 and len(ev2) == 1  # task 2 owns only k_b

        with be._owned_aot_keys(tok1):
            assert be._owns_aot_key(k_shared) and be._owns_aot_key(k_a)
            assert not be._owns_aot_key(k_b)
            with be._owned_aot_keys(tok2):      # nesting
                assert be._owns_aot_key(k_b)
                assert not be._owns_aot_key(k_shared)
            # previous binding restored, not clobbered to empty
            assert be._owns_aot_key(k_shared)
        assert not be._owns_aot_key(k_shared)   # outside any binding
    finally:
        for k in (k_shared, k_a, k_b):
            be._aot_inflight.pop(k, None)
            be._aot_owner.pop(k, None)
