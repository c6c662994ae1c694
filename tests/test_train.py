"""Training-loop tests: MPGNN trainer, batched candidate evaluation, RGCN
baseline, metrics, checkpointing, GTN export."""

import os

import numpy as np
import pytest

from mpgnn_tpu.config import MPGNNConfig
from mpgnn_tpu.graph.generate import generate_synthetic_graph
from mpgnn_tpu.graph.hetero import HeteroGraph
from mpgnn_tpu.graph.io import split_nodes
from mpgnn_tpu.train.loops import train_mpgnn
from mpgnn_tpu.train.metrics import macro_f1_np


@pytest.fixture(scope="module")
def planted():
    g = generate_synthetic_graph(800, 4, "red-red-blue", seed=7)
    graph = HeteroGraph(
        g["node_features"].astype(np.float32), g["src"], g["dst"], g["rel"],
        num_relations=4, labels=g["labels"],
    )
    return graph, g


def test_train_planted_metapath_high_f1(planted):
    graph, g = planted
    split = split_nodes(g["labels"])
    res = train_mpgnn(
        graph, [g["metapath_relations"]], split, 2,
        MPGNNConfig(epochs=150, hidden_dim=32),
    )
    assert res.val_f1 > 0.95
    assert res.test_f1 > 0.9


def test_train_wrong_metapath_lower_f1(planted):
    graph, g = planted
    split = split_nodes(g["labels"])
    # a blue-headed metapath cannot explain red-headed labels
    res_wrong = train_mpgnn(
        graph, [[2, 2]], split, 2, MPGNNConfig(epochs=150, hidden_dim=32)
    )
    res_right = train_mpgnn(
        graph, [g["metapath_relations"]], split, 2,
        MPGNNConfig(epochs=150, hidden_dim=32),
    )
    assert res_right.val_f1 > res_wrong.val_f1


def test_batched_eval_matches_serial(planted):
    from mpgnn_tpu.train.batch_eval import evaluate_candidates

    graph, g = planted
    split = split_nodes(g["labels"])
    cfg = MPGNNConfig(epochs=60, hidden_dim=16)
    paths = [[1, 0], [0, 1], [2, 3]]
    batch = evaluate_candidates(graph, paths, split, 2, cfg, seed=3)
    for p in paths:
        serial = train_mpgnn(graph, [p], split, 2, cfg, seed=3).val_f1
        # identical seeds and math -> identical result
        np.testing.assert_allclose(batch[str(p)], serial, atol=1e-5)


def test_rgcn_baseline_runs(planted):
    from mpgnn_tpu.rgcn_baseline import train_rgcn_baseline

    graph, g = planted
    split = split_nodes(g["labels"])
    res = train_rgcn_baseline(
        graph, g["labels"], split, 2, metapath_length=2,
        cfg=MPGNNConfig(epochs=100, hidden_dim=16),
    )
    assert res["val_f1"] > 0.5  # plain RGCN learns something
    assert np.isfinite(res["final_loss"])


def test_macro_f1_matches_sklearn():
    from sklearn.metrics import f1_score

    rng = np.random.default_rng(0)
    y = rng.integers(0, 3, 200)
    p = rng.integers(0, 3, 200)
    ours = macro_f1_np(p, y, 3)
    theirs = f1_score(y, p, average="macro")
    np.testing.assert_allclose(ours, theirs, atol=1e-6)
    # argument-swap symmetry the reference relies on (main.py:1095-1099)
    np.testing.assert_allclose(ours, f1_score(p, y, average="macro"), atol=1e-6)


def test_search_checkpoint_roundtrip(tmp_path):
    from mpgnn_tpu.search.engine import SearchResult
    from mpgnn_tpu.utils.checkpoint import SearchCheckpoint

    path = str(tmp_path / "ck.json")
    ck = SearchCheckpoint(path)
    assert not ck.has(0)
    res = SearchResult(
        metapaths=[[1, 0]], test_f1=0.97,
        val_f1_by_path={"[1, 0]": 0.99}, discovered=[[1], [1, 0]],
    )
    ck.save(0, res)
    ck2 = SearchCheckpoint(path)
    assert ck2.has(0)
    r = ck2.load(0)
    assert r.metapaths == [[1, 0]] and r.test_f1 == 0.97


def test_gtn_export(planted, tmp_path):
    import pickle

    from mpgnn_tpu.graph.gtn import export_gtn

    graph, g = planted
    split = split_nodes(g["labels"])
    out = str(tmp_path / "gtn")
    export_gtn(graph, split, out)
    with open(os.path.join(out, "edges.pkl"), "rb") as f:
        edges = pickle.load(f)
    assert len(edges) == len(graph.present_relations())
    assert edges[0].nnz == int(graph.rel_counts[graph.present_relations()[0]])
    with open(os.path.join(out, "labels.pkl"), "rb") as f:
        labels = pickle.load(f)
    assert len(labels) == 3
    assert len(labels[0]) == len(split.train_idx)
