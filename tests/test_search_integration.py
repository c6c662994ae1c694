"""Search integration test (SURVEY §4 layer c): the full search must recover
the planted metapath on a generated synthetic graph — the reference's
scientific validation criterion (metapath.dat recovery)."""

import numpy as np
import pytest

from mpgnn_tpu.config import MPGNNConfig, ScorerConfig, SearchConfig
from mpgnn_tpu.graph.generate import generate_synthetic_graph
from mpgnn_tpu.graph.hetero import HeteroGraph
from mpgnn_tpu.graph.io import split_nodes
from mpgnn_tpu.search import find_metapaths


@pytest.mark.slow
def test_search_recovers_planted_metapath():
    g = generate_synthetic_graph(
        1200, 4, "red-red-blue", overlap=0, shared_relations=0, seed=11
    )
    planted = g["metapath_relations"]
    graph = HeteroGraph(
        g["node_features"].astype(np.float32), g["src"], g["dst"], g["rel"],
        num_relations=4, labels=g["labels"],
    )
    split = split_nodes(g["labels"])
    cfg = SearchConfig(
        mpgnn=MPGNNConfig(epochs=120, hidden_dim=32),
        scorer=ScorerConfig(max_restarts=6),
        max_extension_hops=2,
    )
    res = find_metapaths(
        graph, g["labels"].astype(np.float32), split, num_classes=2,
        config=cfg, dataset="synthetic", seed=0,
    )
    assert planted in res.discovered
    # the planted metapath must rank at the top on validation F1
    best_path = max(res.val_f1_by_path.items(), key=lambda kv: kv[1])[0]
    assert res.val_f1_by_path[str(planted)] >= 0.95
    assert res.test_f1 >= 0.9
    assert planted in res.metapaths or res.val_f1_by_path[best_path] >= 0.99


@pytest.mark.slow
def test_search_recovers_length3_planted_metapath():
    """Three extension hops (the reference's for k in range(3), main.py:1381)
    on a planted length-3 metapath (4 relations on the path - 1 = 3 hops of
    extension from the 1-hop seed)."""
    g = generate_synthetic_graph(
        1200, 4, "red-red-red-blue", overlap=0, shared_relations=0, seed=5
    )
    planted = g["metapath_relations"]
    assert len(planted) == 3
    graph = HeteroGraph(
        g["node_features"].astype(np.float32), g["src"], g["dst"], g["rel"],
        num_relations=4, labels=g["labels"],
    )
    split = split_nodes(g["labels"])
    cfg = SearchConfig(
        mpgnn=MPGNNConfig(epochs=120, hidden_dim=32),
        scorer=ScorerConfig(max_restarts=5),
        max_extension_hops=2,
    )
    res = find_metapaths(
        graph, g["labels"].astype(np.float32), split, num_classes=2,
        config=cfg, dataset="synthetic", seed=0,
    )
    assert planted in res.discovered
    assert res.val_f1_by_path[str(planted)] >= 0.9


@pytest.mark.slow
def test_frontier_checkpoint_resume(tmp_path):
    """An interrupted search resumes from the saved frontier without
    re-running earlier hops."""
    g = generate_synthetic_graph(600, 4, "red-red-blue", seed=2)
    graph = HeteroGraph(
        g["node_features"].astype(np.float32), g["src"], g["dst"], g["rel"],
        num_relations=4, labels=g["labels"],
    )
    split = split_nodes(g["labels"])
    cfg = SearchConfig(
        mpgnn=MPGNNConfig(epochs=50, hidden_dim=16),
        scorer=ScorerConfig(max_restarts=3),
        max_extension_hops=1,
    )
    ck = str(tmp_path / "frontier.pkl")
    res1 = find_metapaths(
        graph, g["labels"].astype(np.float32), split, num_classes=2,
        config=cfg, dataset="synthetic", seed=0, frontier_checkpoint=ck,
    )
    import os

    assert os.path.exists(ck)
    # a second run resumes (final frontier has hop=1) and still produces
    # the same discovered set
    res2 = find_metapaths(
        graph, g["labels"].astype(np.float32), split, num_classes=2,
        config=cfg, dataset="synthetic", seed=0, frontier_checkpoint=ck,
    )
    assert res2.discovered == res1.discovered


@pytest.mark.slow
def test_search_deterministic_given_seed():
    g = generate_synthetic_graph(500, 4, "red-red-blue", seed=9)
    graph = HeteroGraph(
        g["node_features"].astype(np.float32), g["src"], g["dst"], g["rel"],
        num_relations=4, labels=g["labels"],
    )
    split = split_nodes(g["labels"])
    cfg = SearchConfig(
        mpgnn=MPGNNConfig(epochs=40, hidden_dim=16),
        scorer=ScorerConfig(max_restarts=3),
        max_extension_hops=1,
    )
    kw = dict(config=cfg, dataset="synthetic", seed=0)
    r1 = find_metapaths(graph, g["labels"].astype(np.float32), split, 2, **kw)
    r2 = find_metapaths(graph, g["labels"].astype(np.float32), split, 2, **kw)
    assert r1.discovered == r2.discovered
    assert r1.val_f1_by_path == r2.val_f1_by_path


@pytest.mark.slow
def test_multiclass_one_vs_rest_search():
    """Multi-class flow (reference main.py:1214): one-vs-rest binarization,
    one search per class; each class's search should discover its own
    planted metapath."""
    from mpgnn_tpu.graph.io import binarize_labels

    g = generate_synthetic_graph(
        1200, 4, "red-red-blue", seed=13, metapath2="blue-blue-red",
    )
    p1 = g["metapath_relations"]
    p2 = g["metapath2_relations"]
    heads1 = g["embeddings"][len(p1) - 1] == 1
    heads2 = g["embeddings"][len(p1) + len(p2) - 1] == 1
    y = np.zeros(1200, dtype=np.int64)
    y[heads1] = 1
    y[heads2] = 2          # overlap resolved in favor of class 2
    if len(np.unique(y)) < 3:
        pytest.skip("degenerate draw: a class is empty")

    graph = HeteroGraph(
        g["node_features"].astype(np.float32), g["src"], g["dst"], g["rel"],
        num_relations=4, labels=y,
    )
    split = split_nodes(y)
    cfg = SearchConfig(
        mpgnn=MPGNNConfig(epochs=80, hidden_dim=16),
        scorer=ScorerConfig(max_restarts=3),
        max_extension_hops=1,
    )
    binlabs = binarize_labels(y)
    assert len(binlabs) == 3
    res1 = find_metapaths(
        graph, binlabs[1].astype(np.float32), split, num_classes=3,
        config=cfg, dataset="synthetic", seed=0,
    )
    res2 = find_metapaths(
        graph, binlabs[2].astype(np.float32), split, num_classes=3,
        config=cfg, dataset="synthetic", seed=0,
    )
    assert p1 in res1.discovered
    assert p2 in res2.discovered


@pytest.mark.slow
def test_search_with_shared_relation_vocabulary():
    """Harder grid point (overlap=0, shared_relations=1: two relation ids
    per color pair, 8 relations total — reference generator table :71-77):
    the search must still seed with plausible relations and rank the planted
    path at the top."""
    g = generate_synthetic_graph(
        1500, 4, "red-red-blue", overlap=0, shared_relations=1, seed=21
    )
    planted = g["metapath_relations"]
    graph = HeteroGraph(
        g["node_features"].astype(np.float32), g["src"], g["dst"], g["rel"],
        num_relations=8, labels=g["labels"],
    )
    split = split_nodes(g["labels"])
    cfg = SearchConfig(
        mpgnn=MPGNNConfig(epochs=120, hidden_dim=32),
        scorer=ScorerConfig(max_restarts=4),
        max_extension_hops=1,
    )
    res = find_metapaths(
        graph, g["labels"].astype(np.float32), split, num_classes=2,
        config=cfg, dataset="synthetic", seed=0,
    )
    # hop-0 must identify the planted path's final relation even among the
    # doubled vocabulary; full extension can die faithfully on the
    # reference's exactly-3-candidates empty-selection branch
    # (main.py:1418-1424), so only require the 1-hop seed to be right and,
    # when the full path IS discovered, that it ranks at the top.
    assert [planted[-1]] in res.discovered
    if str(planted) in res.val_f1_by_path:
        best = max(res.val_f1_by_path.values())
        assert res.val_f1_by_path[str(planted)] >= best - 0.02


def test_search_no_positive_sources_degrades_gracefully():
    """All-negative labels -> no hop-0 candidates -> empty result, no crash
    (the reference would raise on rank 0; we return an empty SearchResult)."""
    g = generate_synthetic_graph(300, 3, "red-red-blue", seed=33)
    graph = HeteroGraph(
        g["node_features"].astype(np.float32), g["src"], g["dst"], g["rel"],
        num_relations=4,
    )
    labels = np.zeros(300, dtype=np.int64)
    labels[:4] = 1  # enough for a stratified split, no graph signal needed
    split = split_nodes(labels)
    cfg = SearchConfig(
        mpgnn=MPGNNConfig(epochs=10, hidden_dim=8),
        scorer=ScorerConfig(max_restarts=2),
        max_extension_hops=1,
    )
    res = find_metapaths(
        graph, np.zeros(300, np.float32), split, num_classes=2,
        config=cfg, dataset="synthetic", seed=0,
    )
    assert res.metapaths == []
    assert res.discovered == []
    assert res.test_f1 == 0.0


@pytest.mark.slow
def test_inclusive_gap_cut_recovers_on_hard_grid():
    """The inclusive bag gap cut recovers the planted path on a grid cell
    where the reference's strict < cut blocks every extension."""
    g = generate_synthetic_graph(
        1500, 4, "red-red-blue", overlap=2, shared_relations=1, seed=11
    )
    R = int(max(g["rel"])) + 1
    graph = HeteroGraph(
        g["node_features"].astype(np.float32), g["src"], g["dst"], g["rel"],
        num_relations=R, labels=g["labels"],
    )
    split = split_nodes(g["labels"])
    base = dict(
        mpgnn=MPGNNConfig(epochs=120, hidden_dim=32),
        scorer=ScorerConfig(max_restarts=5),
        max_extension_hops=1,
    )
    res_par = find_metapaths(
        graph, g["labels"].astype(np.float32), split, 2,
        config=SearchConfig(**base), dataset="synthetic", seed=0,
    )
    res_inc = find_metapaths(
        graph, g["labels"].astype(np.float32), split, 2,
        config=SearchConfig(bag_gap_inclusive=True, **base),
        dataset="synthetic", seed=0,
    )
    planted = g["metapath_relations"]
    assert planted not in res_par.discovered      # reference behavior
    assert planted in res_inc.discovered          # fixed behavior


def test_powerlaw_kg_generator_properties(tmp_path):
    """Power-law KG: hub degrees, skewed relation sizes, pattern-consistent
    labels, FB15K-style labeled subset, and the five reference files."""
    import os

    from mpgnn_tpu.graph.generate import generate_powerlaw_kg

    out = str(tmp_path / "kg")
    g = generate_powerlaw_kg(4000, 40000, 30, metapath_len=2, seed=3,
                             out_dir=out)
    deg = np.bincount(g["src"], minlength=4000)
    # power-law endpoints -> a genuine hub far above the mean degree
    assert deg.max() > 50 * max(deg.mean(), 1e-9)
    rel_sizes = np.bincount(g["rel"], minlength=30)
    assert rel_sizes.max() > 4 * np.median(rel_sizes[rel_sizes > 0])
    # labels are defined by the planted pattern on the FINAL graph:
    # every labeled-1 node must start the chain, verified independently
    mp_fwd = g["metapath_relations_path_order"]
    colors = g["colors"]
    reach = (colors == (len(mp_fwd)) % 4).astype(int)
    for i in range(len(mp_fwd) - 1, -1, -1):
        hit = (g["rel"] == mp_fwd[i]) & (reach[g["dst"]] == 1) \
            & (colors[g["dst"]] == (i + 1) % 4)
        nxt = np.zeros(4000, int)
        nxt[g["src"][hit]] = 1
        if i > 0:
            nxt &= (colors == i % 4).astype(int)
        reach = nxt
    np.testing.assert_array_equal(reach, g["labels"])
    # labeled subset: all positives present, plus hard+random negatives
    ln = g["label_nodes"]
    assert set(np.nonzero(g["labels"])[0]).issubset(set(ln.tolist()))
    assert (g["labels"][ln] == 0).sum() > 0
    for f in ["node.dat", "link.dat", "label.dat", "embedding.dat",
              "metapath.dat"]:
        assert os.path.exists(os.path.join(out, f))
    # label.dat is FB15K-style: only the labeled subset
    with open(os.path.join(out, "label.dat")) as fh:
        assert len(fh.read().splitlines()) == len(ln)


@pytest.mark.slow
def test_search_recovers_planted_path_on_powerlaw_kg():
    """KG-scale structure in miniature: power-law hubs (segment-routed
    scorer), skewed relations, FB15K-style labeled subset — the search must
    recover the planted path and classify perfectly with it."""
    from mpgnn_tpu.graph.generate import generate_powerlaw_kg
    from mpgnn_tpu.search import scoring as sc

    g = generate_powerlaw_kg(3000, 30000, 20, metapath_len=2, seed=1)
    planted = list(g["metapath_relations"])
    graph = HeteroGraph(
        g["node_features"].astype(np.float32), g["src"], g["dst"], g["rel"],
        num_relations=20,
    )
    # the hub relations must route through the segment scorer path
    assert any(
        sc._relation_mode(graph, r)[0] == "seg" for r in range(20)
    )
    ln = g["label_nodes"]
    split = split_nodes(g["labels"][ln], node_idx=ln)
    cfg = SearchConfig(
        max_extension_hops=1, bag_gap_inclusive=True,
        mpgnn=MPGNNConfig(hidden_dim=16, epochs=150),
    )
    res = find_metapaths(
        graph, g["labels"][ln].astype(np.float32), split, 2, cfg,
        source_nodes=ln, seed=0,
    )
    assert planted in [list(p) for p in res.discovered]
    assert res.metapaths == [planted]
    assert res.test_f1 >= 0.95


def test_bounded_frontier_cap_recovers_planted_path():
    """max_extensions_per_state=1 (the tightest beam) still recovers the
    planted metapath — it scores loss≈0, so it survives every lowest-loss
    cut — while provably bounding the per-state fan-out. The cap is the
    round-4 answer to many-relation KGs where the reference's faithful
    np.diff cut keeps nearly every candidate (SearchConfig docstring)."""
    g = generate_synthetic_graph(
        1200, 4, "red-red-blue", overlap=0, shared_relations=0, seed=11
    )
    planted = g["metapath_relations"]
    graph = HeteroGraph(
        g["node_features"].astype(np.float32), g["src"], g["dst"], g["rel"],
        num_relations=4, labels=g["labels"],
    )
    split = split_nodes(g["labels"])
    cfg = SearchConfig(
        mpgnn=MPGNNConfig(epochs=120, hidden_dim=32),
        scorer=ScorerConfig(max_restarts=4),
        max_extension_hops=1,
        bag_gap_inclusive=True,
        max_extensions_per_state=1,
    )
    res = find_metapaths(
        graph, g["labels"].astype(np.float32), split, num_classes=2,
        config=cfg, dataset="synthetic", seed=0,
    )
    assert planted in [list(p) for p in res.discovered]
    # beam width 1 from a single hop-0 survivor: at most 1 seed + 1
    # extension enters the candidate set
    assert len(res.discovered) <= 2


def test_cap_frontier_keeps_lowest_loss():
    """_cap_frontier keeps the k lowest-loss survivors (stable under ties)
    and is the identity when the cap is off or not binding."""
    from mpgnn_tpu.search.engine import _cap_frontier

    items = [(7, 0.5), (3, 0.0), (9, 0.25), (1, 0.25)]
    cfg_off = SearchConfig()
    assert _cap_frontier(items, cfg_off, "hop 1", "[x]") == items
    cfg2 = SearchConfig(max_extensions_per_state=2)
    assert _cap_frontier(items, cfg2, "hop 1", "[x]") == [(3, 0.0), (9, 0.25)]
    cfg9 = SearchConfig(max_extensions_per_state=9)
    assert _cap_frontier(items, cfg9, "hop 1", "[x]") == items
