"""Data generation, loading, splitting, and native-parser tests."""

import os

import numpy as np
import pytest

from mpgnn_tpu.graph import (
    generate_synthetic_graph,
    load_synthetic,
    split_nodes,
    binarize_labels,
    mask_label_leak,
)
from mpgnn_tpu.graph.generate import read_planted_metapath
from mpgnn_tpu.graph.hetero import HeteroGraph
from mpgnn_tpu import native


def test_generator_roundtrip(tmp_path):
    out = str(tmp_path / "g")
    g = generate_synthetic_graph(
        300, 4, "red-red-blue", overlap=0, shared_relations=0, seed=1,
        out_dir=out,
    )
    for f in ["node.dat", "link.dat", "label.dat", "embedding.dat", "metapath.dat"]:
        assert os.path.exists(os.path.join(out, f))
    graph, labels, binlabs = load_synthetic(out)
    assert graph.num_nodes == 300
    assert graph.num_edges == len(g["src"])
    np.testing.assert_array_equal(labels, g["labels"])
    planted = read_planted_metapath(out)
    assert planted == g["metapath_relations"]
    assert len(planted) == 2


def test_generator_labels_are_reachability():
    """A labeled node must head a planted-metapath instance; verify by
    walking the graph."""
    g = generate_synthetic_graph(400, 4, "red-blue-red", seed=3)
    src, rel, dst, colors = g["src"], g["rel"], g["dst"], g["colors"]
    meta = g["metapath_relations"]           # eval order [last_hop, first_hop]
    # labels = nodes with an edge of meta[-1]... verify via the stored
    # embeddings instead: hop-k sets must nest backwards
    embs = g["embeddings"]
    assert len(embs) == 2
    # every hop-1 node must have an edge of relation meta[1] to a hop-0 node
    hop0 = set(np.nonzero(embs[0])[0].tolist())
    e_sel = rel == meta[1]
    ok_src = set(src[e_sel][np.isin(dst[e_sel], list(hop0))].tolist())
    hop1 = set(np.nonzero(embs[1])[0].tolist())
    assert hop1 <= ok_src


def test_split_matches_sklearn_and_reference_shape():
    labels = np.array([0] * 50 + [1] * 50)
    s = split_nodes(labels)
    assert len(s.test_idx) == 10           # 10% test
    assert len(s.val_idx) == 18            # 20% of the remaining 90
    assert len(s.train_idx) == 72
    all_idx = np.concatenate([s.train_idx, s.val_idx, s.test_idx])
    assert len(np.unique(all_idx)) == 100
    # deterministic given the fixed seed
    s2 = split_nodes(labels)
    np.testing.assert_array_equal(s.train_idx, s2.train_idx)


def test_split_singleton_class_goes_to_train():
    labels = np.array([0] * 40 + [1] * 40 + [2])  # class 2 has one member
    s = split_nodes(labels)
    assert 80 in s.train_idx.tolist()
    assert 2 in s.train_y.tolist()
    assert 2 not in s.val_y.tolist() and 2 not in s.test_y.tolist()


def test_binarize_labels():
    b = binarize_labels(np.array([0, 1, 2, 1]))
    assert len(b) == 3
    np.testing.assert_array_equal(b[0], [1, 0, 0, 0])
    np.testing.assert_array_equal(b[1], [0, 1, 0, 1])
    # binary passes through
    b2 = binarize_labels(np.array([0, 1, 1]))
    assert len(b2) == 1


def test_mask_label_leak():
    x = np.ones((40, 3), np.float32)
    labels = np.array([0, 1] * 20)
    s = split_nodes(labels)
    masked = mask_label_leak(x, s)
    assert masked.sum() == 0  # every node is in some split here
    assert x.sum() == 120     # original untouched


def test_native_parser_matches_numpy(tmp_path):
    path = str(tmp_path / "links.tsv")
    rng = np.random.default_rng(0)
    arr = rng.integers(0, 1000, size=(500, 3))
    with open(path, "w") as f:
        for row in arr:
            f.write("\t".join(map(str, row)) + "\n")
    got = native.load_int_tsv(path)
    np.testing.assert_array_equal(got, arr)


def test_native_sort_and_ell():
    et = np.array([2, 0, 1, 0, 2, 2], np.int32)
    order, rel_ptr = native.sort_by_relation(et, 3)
    np.testing.assert_array_equal(rel_ptr, [0, 2, 3, 6])
    np.testing.assert_array_equal(et[order], np.sort(et))
    # stability: equal keys keep file order
    assert order[0] < order[1]

    src = np.array([0, 0, 1], np.int32)
    dst = np.array([5, 6, 7], np.int32)
    nbr, mask, md = native.build_ell(src, dst, 3, 2)
    assert md == 2
    np.testing.assert_array_equal(nbr[0], [5, 6])
    np.testing.assert_array_equal(nbr[1], [7, 0])
    assert mask[1].tolist() == [True, False]
    assert mask[2].tolist() == [False, False]


def test_hetero_graph_rel_views():
    src = np.array([0, 1, 2, 3])
    dst = np.array([1, 2, 3, 0])
    rel = np.array([1, 0, 1, 0])
    g = HeteroGraph(np.ones((4, 2), np.float32), src, dst, rel, num_relations=2)
    s, d = g.rel_edges(0)
    np.testing.assert_array_equal(s, [1, 3])
    np.testing.assert_array_equal(d, [2, 0])
    batch = g.relation_batch([0, 1], pad_multiple=4)
    assert batch.src.shape == (2, 4)
    assert batch.mask[:, :2].all() and not batch.mask[:, 2:].any()
    assert g.present_relations() == [0, 1]
    ed = g.edge_dictionary(1, [0, 2])
    assert ed == {0: [1], 2: [3]}


def test_generator_two_planted_metapaths():
    """metapath2 plants a second path; labels are the union of both
    reachability sets (reference :299-352)."""
    g1 = generate_synthetic_graph(400, 4, "red-red-blue", seed=4)
    g2 = generate_synthetic_graph(
        400, 4, "red-red-blue", seed=4, metapath2="blue-red",
    )
    assert g2["metapath2_relations"] is not None
    # union can only add positives
    assert (g2["labels"] >= g1["labels"]).all() or g2["labels"].sum() > 0
    # embeddings extended by the second path's hops
    assert len(g2["embeddings"]) == len(g1["embeddings"]) + 1


def test_generator_multiclass_three_paths(tmp_path):
    """multiclass=True assigns one class per planted path (later path wins
    overlaps), 0 for background; extra metapath files round-trip."""
    g = generate_synthetic_graph(
        600, 4, "red-red-blue", seed=11,
        metapath2="blue-blue-red", metapath3="blue-red",
        multiclass=True, out_dir=str(tmp_path / "mc"),
    )
    y = g["labels"]
    assert set(np.unique(y)) <= {0, 1, 2, 3}
    # head masks from the per-path reachability embeddings
    l1 = len(g["metapath_relations"])
    l2 = len(g["metapath2_relations"])
    heads1 = g["embeddings"][l1 - 1] == 1
    heads2 = g["embeddings"][l1 + l2 - 1] == 1
    heads3 = g["embeddings"][-1] == 1
    assert (y[heads3] == 3).all()                      # last path wins
    assert (y[heads2 & ~heads3] == 2).all()
    assert (y[heads1 & ~heads2 & ~heads3] == 1).all()
    assert (y[~heads1 & ~heads2 & ~heads3] == 0).all()
    # label.dat carries the class ids; extra metapath files readable
    import os
    lab = np.loadtxt(tmp_path / "mc" / "label.dat", dtype=np.int64)
    assert (lab[:, 1] == y).all()
    assert os.path.exists(tmp_path / "mc" / "metapath2.dat")
    from mpgnn_tpu.graph.generate import read_planted_metapath
    assert [int(v) for v in
            open(tmp_path / "mc" / "metapath3.dat").read().splitlines()[1].split()
            ] == g["metapath3_relations"]
    # binary union mode unchanged by the refactor
    gu = generate_synthetic_graph(
        600, 4, "red-red-blue", seed=11, metapath2="blue-blue-red",
    )
    assert set(np.unique(gu["labels"])) <= {0, 1}
