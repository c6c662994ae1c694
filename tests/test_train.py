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


@pytest.mark.slow
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


def test_misc_utils(tmp_path):
    from mpgnn_tpu.utils.misc import (
        find_smallest_values,
        most_frequent,
        negative_sampling,
        one_hot_encoding,
        save_confusion_matrix,
    )

    assert most_frequent([1, 2, 2, 3]) == 2
    oh = one_hot_encoding([0, 2, 2])
    assert oh.shape == (3, 2) and oh[0, 0] == 1 and oh[1, 1] == 1
    labels = np.array([1, 0, 0, 0, 1])
    samp = negative_sampling(labels, np.random.default_rng(0))
    assert set(samp[:2]) == {0, 4} and len(samp) == 5
    cm = save_confusion_matrix([0, 1, 1], [0, 1, 0], str(tmp_path / "cm"))
    assert cm.sum() == 3
    assert find_smallest_values([0.1, 0.11, 0.12, 0.9]) == [0.9]
    assert find_smallest_values([0.1, 0.11]) == 0.1


def test_metapath_net_forward(planted):
    import jax

    from mpgnn_tpu.models.mpgnn import init_metapath_net, metapath_net_forward
    from mpgnn_tpu.train.loops import build_hop_arrays

    graph, g = planted
    params = init_metapath_net(jax.random.PRNGKey(0), graph.feat_dim, 8, 8, 2)
    ops = build_hop_arrays(graph, [[1, 0]], pad_multiple=8)[0]
    import jax.numpy as jnp

    out = metapath_net_forward(params, jnp.asarray(graph.x), ops)
    assert out.shape == (graph.num_nodes, 2)
    # raw logits, not log-probs
    assert not np.allclose(np.exp(np.asarray(out)).sum(axis=1), 1.0)


def test_acm_style_loader(tmp_path):
    from mpgnn_tpu.graph.io import load_acm_style

    d = str(tmp_path)
    with open(d + "/node.dat", "w") as f:
        for i in range(6):
            f.write(f"{i}\t1\t0\n")
    with open(d + "/link.dat", "w") as f:
        f.write("0\t0\t1\n1\t1\t2\n3\t0\t4\n")
    for name, rows in [
        ("labels_train.dat", [(0, 0), (1, 1)]),
        ("labels_val.dat", [(2, 0)]),
        ("labels_test.dat", [(3, 1)]),
    ]:
        with open(d + "/" + name, "w") as f:
            for n, l in rows:
                f.write(f"{n}\t{l}\n")
    g, presplit, binlabs = load_acm_style(d + "/node.dat", d + "/link.dat", d)
    assert g.num_nodes == 6
    np.testing.assert_array_equal(presplit.sources, [0, 1, 2, 3])
    np.testing.assert_array_equal(presplit.labels, [0, 1, 0, 1])
    s = presplit.as_split()
    np.testing.assert_array_equal(s.train_idx, [0, 1])
    assert len(binlabs) == 1


def test_batched_eval_dense_matches_segment(planted):
    from mpgnn_tpu.train.batch_eval import evaluate_candidates

    graph, g = planted
    split = split_nodes(g["labels"])
    cfg = MPGNNConfig(epochs=60, hidden_dim=16)
    paths = [[1, 0], [0, 1], [2, 3], [1]]
    a = evaluate_candidates(graph, paths, split, 2, cfg, seed=3)
    b = evaluate_candidates(graph, paths, split, 2, cfg, seed=3, backend="dense")
    for p in paths:
        # bf16 adjacency + different dropout streams -> small tolerance
        assert abs(a[str(p)] - b[str(p)]) < 0.08, (p, a[str(p)], b[str(p)])


def test_batched_eval_csr_matches_serial(planted):
    """The csr batched eval (the scatter-free final-eval backend) trains
    each candidate identically to a serial csr train_mpgnn: same init keys,
    same dropout streams, same kernel — results match to float tolerance."""
    from mpgnn_tpu.train.batch_eval import evaluate_candidates

    graph, g = planted
    split = split_nodes(g["labels"])
    cfg = MPGNNConfig(epochs=60, hidden_dim=16, backend="csr")
    paths = [[1, 0], [2, 3]]
    batch = evaluate_candidates(
        graph, paths, split, 2, cfg, seed=3, backend="csr"
    )
    for p in paths:
        serial = train_mpgnn(graph, [p], split, 2, cfg, seed=3).val_f1
        np.testing.assert_allclose(batch[str(p)], serial, atol=1e-5)


def test_batched_eval_csr_matches_segment(planted):
    """csr vs segment batched eval: same training semantics, different
    kernels — small tolerance for the csr kernel's split-bf16 MXU math."""
    from mpgnn_tpu.train.batch_eval import evaluate_candidates

    graph, g = planted
    split = split_nodes(g["labels"])
    cfg = MPGNNConfig(epochs=60, hidden_dim=16)
    paths = [[1, 0], [0, 1], [1]]
    a = evaluate_candidates(graph, paths, split, 2, cfg, seed=3)
    b = evaluate_candidates(
        graph, paths, split, 2, cfg, seed=3, backend="csr"
    )
    for p in paths:
        assert abs(a[str(p)] - b[str(p)]) < 0.08, (p, a[str(p)], b[str(p)])


def test_resolve_eval_backend(planted):
    """'auto' batched eval routes to csr past the 1M-edge cutover and to
    segment below it; explicit backends pass through."""
    from mpgnn_tpu.train.batch_eval import resolve_eval_backend

    graph, g = planted
    cfg = MPGNNConfig()
    paths = [[1, 0]]
    assert resolve_eval_backend("segment", cfg, graph, paths) == "segment"
    assert resolve_eval_backend("auto", cfg, graph, paths) == "segment"
    saved = graph.rel_counts.copy()
    try:
        graph.rel_counts[0] = 2_000_000
        assert resolve_eval_backend("auto", cfg, graph, paths) == "csr"
    finally:
        graph.rel_counts[:] = saved


def test_evaluate_candidates_csr_compile_only(planted):
    """compile_only on the csr path stores an AOT executable the real call
    consumes (same _aot_store machinery as the segment path)."""
    from mpgnn_tpu.train import batch_eval
    from mpgnn_tpu.train.batch_eval import evaluate_candidates

    graph, g = planted
    split = split_nodes(g["labels"])
    cfg = MPGNNConfig(epochs=10, hidden_dim=8)
    paths = [[1, 0], [2, 3]]
    warm = evaluate_candidates(
        graph, paths, split, 2, cfg, seed=5, backend="csr",
        compile_only=True,
    )
    assert warm == {}
    key = batch_eval._aot_key_csr(
        graph, paths, split, 2, cfg,
        str(batch_eval.make_dropout_key(
            __import__("jax").random.PRNGKey(6), 6, cfg.dropout_rng).dtype),
    )
    assert key in batch_eval._aot_store
    res = evaluate_candidates(
        graph, paths, split, 2, cfg, seed=5, backend="csr"
    )
    assert key not in batch_eval._aot_store  # consumed
    assert set(res) == {str(p) for p in paths}


@pytest.mark.slow
def test_batched_eval_hbm_chunking_matches_unchunked(planted, monkeypatch):
    """Forcing the free-HBM candidate cap below the group size must produce
    identical per-candidate results: chunks are pure batch splits (padded to
    the cap, stacked to the full group's e_pad) of independent trainings.
    Regression for the KG-scale compile OOM (19.3 GB demanded of a 15.75 GB
    chip by an unchunked C≈35 vmapped program)."""
    from mpgnn_tpu.train import batch_eval
    from mpgnn_tpu.train.batch_eval import evaluate_candidates

    graph, g = planted
    split = split_nodes(g["labels"])
    cfg = MPGNNConfig(epochs=40, hidden_dim=8)
    paths = [[1, 0], [0, 1], [2, 3], [3, 2], [1, 2]]
    full = evaluate_candidates(graph, paths, split, 2, cfg, seed=3)
    monkeypatch.setattr(batch_eval, "_segment_chunk_cap",
                        lambda *a, **k: 2)
    chunked = evaluate_candidates(graph, paths, split, 2, cfg, seed=3)
    assert set(chunked) == set(full)
    for p in paths:
        np.testing.assert_allclose(chunked[str(p)], full[str(p)], atol=1e-5)


def test_batched_eval_csr_chunking_matches_unchunked(planted, monkeypatch):
    """csr eval chunked by a forced tiny HBM cap == unchunked csr results
    (each chunk is an independent program over the shared blockings)."""
    from mpgnn_tpu.train import batch_eval
    from mpgnn_tpu.train.batch_eval import evaluate_candidates

    graph, g = planted
    split = split_nodes(g["labels"])
    cfg = MPGNNConfig(epochs=30, hidden_dim=8)
    paths = [[1, 0], [0, 1], [2, 3], [3, 2], [1, 2]]
    full = evaluate_candidates(graph, paths, split, 2, cfg, seed=4,
                               backend="csr")
    monkeypatch.setattr(batch_eval, "_csr_chunk_cap", lambda *a, **k: 2)
    chunked = evaluate_candidates(graph, paths, split, 2, cfg, seed=4,
                                  backend="csr")
    for p in paths:
        np.testing.assert_allclose(chunked[str(p)], full[str(p)], atol=1e-5)


def test_batched_eval_csr_epoch_blocks_match_single(planted, monkeypatch):
    """Splitting the csr eval's epoch scan into bounded dispatches (the
    round-4 fix for the TPU-tunnel worker crash on one ~20-minute
    1000-epoch dispatch) must reproduce the single-dispatch results: the
    carry stays on device and dropout folds use GLOBAL epoch indices, so
    any block partition (including one with a remainder block) is
    bit-for-bit the same training stream."""
    from mpgnn_tpu.train import batch_eval
    from mpgnn_tpu.train.batch_eval import evaluate_candidates

    graph, g = planted
    split = split_nodes(g["labels"])
    cfg = MPGNNConfig(epochs=25, hidden_dim=8)
    paths = [[1, 0], [2, 3]]
    single = evaluate_candidates(graph, paths, split, 2, cfg, seed=4,
                                 backend="csr")
    monkeypatch.setattr(batch_eval, "_CSR_EVAL_EPOCH_BLOCK", 10)
    blocked = evaluate_candidates(graph, paths, split, 2, cfg, seed=4,
                                  backend="csr")  # blocks 10+10+5
    for p in paths:
        np.testing.assert_allclose(blocked[str(p)], single[str(p)],
                                   atol=1e-6)


def test_batched_eval_csr_compile_only_epoch_blocks(planted, monkeypatch):
    """compile_only warms every block-size program + the finalize program;
    the real blocked call consumes them (no fallback recompiles)."""
    from mpgnn_tpu.train import batch_eval
    from mpgnn_tpu.train.batch_eval import evaluate_candidates

    graph, g = planted
    split = split_nodes(g["labels"])
    cfg = MPGNNConfig(epochs=25, hidden_dim=8)
    paths = [[1, 0], [2, 3]]
    monkeypatch.setattr(batch_eval, "_CSR_EVAL_EPOCH_BLOCK", 10)
    evaluate_candidates(graph, paths, split, 2, cfg, seed=9, backend="csr",
                        compile_only=True)
    key = batch_eval._aot_key_csr(
        graph, paths, split, 2, cfg,
        str(batch_eval.make_dropout_key(
            __import__("jax").random.PRNGKey(10), 10, cfg.dropout_rng).dtype),
    )
    execs = batch_eval._aot_store.get(key)
    assert execs is not None
    assert set(execs) == {("block", 10), ("block", 5), "final"}
    res = evaluate_candidates(graph, paths, split, 2, cfg, seed=9,
                              backend="csr")
    assert key not in batch_eval._aot_store  # consumed
    assert set(res) == {str(p) for p in paths}


def test_batched_eval_chunk_resume_matches_uninterrupted(planted, monkeypatch):
    """Crash-resume (round 4): sink delivers per-chunk results; a re-call
    passing those as ``existing`` skips covered chunks and reproduces the
    uninterrupted results bit-for-bit (chunk layout + PRNG positions come
    from the full candidate list, not the remaining one)."""
    from mpgnn_tpu.train import batch_eval
    from mpgnn_tpu.train.batch_eval import evaluate_candidates

    graph, g = planted
    split = split_nodes(g["labels"])
    cfg = MPGNNConfig(epochs=30, hidden_dim=8)
    paths = [[1, 0], [0, 1], [2, 3], [3, 2], [1, 2]]
    for backend, capname in (("segment", "_segment_chunk_cap"),
                             ("csr", "_csr_chunk_cap")):
        full = evaluate_candidates(graph, paths, split, 2, cfg, seed=6,
                                   backend=backend)
        monkeypatch.setattr(batch_eval, capname, lambda *a, **k: 2)
        sunk = []
        out1 = evaluate_candidates(graph, paths, split, 2, cfg, seed=6,
                                   backend=backend, sink=sunk.append)
        assert len(sunk) == 3, backend              # 3 chunks of <=2
        for p in paths:
            np.testing.assert_allclose(out1[str(p)], full[str(p)],
                                       atol=1e-5, err_msg=backend)
        # simulate a crash after the first chunk: only its results exist
        partial = dict(sunk[0])
        sunk2 = []
        out2 = evaluate_candidates(graph, paths, split, 2, cfg, seed=6,
                                   backend=backend, existing=partial,
                                   sink=sunk2.append)
        assert len(sunk2) == 2, backend             # first chunk skipped
        for p in paths:
            np.testing.assert_allclose(out2[str(p)], full[str(p)],
                                       atol=1e-5, err_msg=backend)
        monkeypatch.undo()


def test_resolve_eval_backend_entry_cliff(planted):
    """'auto' routes a wide-e_pad multi-candidate group to csr even below
    the 1M-edges/relation cutover: the vmapped segment batch would run
    into the worker-crash entry cliff near-serialized (KG regression)."""
    from mpgnn_tpu.train import batch_eval

    graph, g = planted
    cfg = MPGNNConfig(hidden_dim=64)
    paths = [[1, 0], [0, 1], [2, 3]]
    assert batch_eval.resolve_eval_backend("auto", cfg, graph, paths) == \
        "segment"  # shipped scale: far below both bounds
    try:
        # shrink the cliff below this graph's e_pad x H to simulate KG scale
        orig = batch_eval._EVAL_VMAP_ENTRY_CAP
        batch_eval._EVAL_VMAP_ENTRY_CAP = 1
        assert batch_eval.resolve_eval_backend(
            "auto", cfg, graph, paths) == "csr"
        # a SINGLETON group past the cliff must route to csr too: the
        # worker kernel-faulted at C=1 × e_pad=524416 × H=64 on the
        # 237-relation KG (round 4) — candidate chunking cannot help at
        # C=1, only the scatter-free path can
        assert batch_eval.resolve_eval_backend(
            "auto", cfg, graph, [[1]]) == "csr"
    finally:
        batch_eval._EVAL_VMAP_ENTRY_CAP = orig
    # back at shipped scale the singleton stays segment
    assert batch_eval.resolve_eval_backend(
        "auto", cfg, graph, [[1]]) == "segment"


def test_segment_chunks_share_one_shape(planted):
    """All HBM chunks of a length group share (C, e_pad) so one compiled
    program serves them; the AOT warm key mirrors the chunk shape."""
    from mpgnn_tpu.train import batch_eval

    graph, g = planted
    cfg = MPGNNConfig(epochs=5, hidden_dim=8)
    group = [[1, 0], [0, 1], [2, 3], [3, 2], [1, 2]]
    cap = 2
    orig = batch_eval._segment_chunk_cap
    try:
        batch_eval._segment_chunk_cap = lambda *a, **k: cap
        chunks, e_pad = batch_eval._segment_chunks(graph, group, cfg)
    finally:
        batch_eval._segment_chunk_cap = orig
    assert len(chunks) == 3
    assert all(len(c) == cap for c, _, _ in chunks)
    assert [off for _, off, _ in chunks] == [0, 2, 4]
    assert [n for _, _, n in chunks] == [2, 2, 1]
    assert e_pad == batch_eval._e_pad(graph, group)
    # tail chunk padded by repeating its last real path
    assert chunks[-1][0] == [[1, 2], [1, 2]]


def test_balanced_undersample():
    from mpgnn_tpu.utils.misc import balanced_undersample

    idx = list(range(30))
    labels = [0] * 20 + [1] * 10
    ki, kl = balanced_undersample(idx, labels, np.random.default_rng(0))
    assert len(ki) == 20
    assert (np.asarray(kl) == 0).sum() == 10 and (np.asarray(kl) == 1).sum() == 10


def test_bf16_compute_path_matches_f32(planted):
    """Mixed-precision training (compute_dtype=bfloat16) keeps params f32,
    runs activations in bf16, and recovers the planted metapath as well as
    the f32 path."""
    import jax.numpy as jnp

    from mpgnn_tpu.models.mpgnn import init_mpgnn, mpgnn_forward
    from mpgnn_tpu.train.loops import build_hop_arrays

    graph, g = planted
    split = split_nodes(g["labels"])
    res = train_mpgnn(
        graph, [g["metapath_relations"]], split, 2,
        MPGNNConfig(epochs=150, hidden_dim=32, compute_dtype="bfloat16"),
    )
    assert res.val_f1 > 0.95
    # params stayed f32
    assert res.params.fc1.w.dtype == jnp.float32

    # forward agreement at f32 weights: bf16 output close to f32 output
    import jax

    params = init_mpgnn(jax.random.PRNGKey(0), graph.feat_dim, 32, 2,
                        [g["metapath_relations"]])
    ops = build_hop_arrays(graph, [g["metapath_relations"]])
    out32 = mpgnn_forward(params, jnp.asarray(graph.x), ops, train=False)
    out16 = mpgnn_forward(
        params, jnp.asarray(graph.x), ops, train=False,
        compute_dtype=jnp.bfloat16,
    )
    assert out16.dtype == jnp.float32          # log_softmax stays f32
    agree = np.mean(
        np.argmax(np.asarray(out32), 1) == np.argmax(np.asarray(out16), 1)
    )
    assert agree > 0.99


def test_resolve_backend_auto(planted):
    """'auto' -> dense under the HBM budget, segment above it; explicit
    backends pass through."""
    from mpgnn_tpu.train.loops import resolve_backend

    graph, labels = planted
    mps = [[0, 1]]
    assert resolve_backend("segment", graph, mps) == "segment"
    assert resolve_backend("auto", graph, mps) == "dense"
    # shrink the budget below 2 * Ru * N^2 * 4 bytes -> falls back
    n = graph.num_nodes
    tight = 2 * 2 * n * n * 4 - 1
    assert resolve_backend("auto", graph, mps, budget_bytes=tight) == "segment"
    # past 1M edges/relation XLA's scatter-add collapses (0.8 GB/s measured,
    # benchmarks/micro_agg.py) -> 'auto' switches to the Pallas sorted-CSR
    # kernel
    saved = graph.rel_counts.copy()
    try:
        graph.rel_counts[0] = 2_000_000
        assert resolve_backend(
            "auto", graph, mps, budget_bytes=tight) == "csr"
    finally:
        graph.rel_counts[:] = saved


def test_train_with_rbg_dropout_runs(planted):
    """dropout_rng='rbg' (hardware RngBitGenerator) trains to the same
    quality as threefry — only the dropout stream differs, init is
    identical."""
    graph, g = planted
    split = split_nodes(g["labels"])
    cfg = MPGNNConfig(epochs=40, hidden_dim=16, dropout_rng="rbg")
    res = train_mpgnn(graph, [[1, 0]], split, 2, cfg, seed=0)
    assert np.isfinite(res.final_loss)
    ref = train_mpgnn(
        graph, [[1, 0]], split, 2,
        MPGNNConfig(epochs=40, hidden_dim=16, dropout_rng="threefry"), seed=0,
    )
    # same planted task, both streams should learn comparably
    assert res.train_f1 > 0.8 and ref.train_f1 > 0.8


def test_evaluate_candidates_compile_only_shares_program(planted):
    """compile_only warms the SAME lru-cached jit object the real call
    uses: the warm returns {} without running, and the subsequent real
    call produces normal results (in-process executable-cache hit)."""
    from mpgnn_tpu.train import batch_eval
    from mpgnn_tpu.train.batch_eval import evaluate_candidates

    graph, g = planted
    split = split_nodes(g["labels"])
    cfg = MPGNNConfig(epochs=20, hidden_dim=8)
    paths = [[0], [1], [1, 0]]
    warm = evaluate_candidates(
        graph, paths, split, 2, cfg, seed=5, compile_only=True
    )
    assert warm == {}
    before = batch_eval._eval_program.cache_info()
    res = evaluate_candidates(graph, paths, split, 2, cfg, seed=5)
    after = batch_eval._eval_program.cache_info()
    # the real call must reuse the warmed factory entries (one per length)
    assert after.hits >= before.hits + 2
    assert set(res) == {str(p) for p in paths}
    assert all(0.0 <= v <= 1.0 for v in res.values())


def test_auto_eval_mixed_backend_routing(planted, monkeypatch):
    """Under backend='auto' the batched eval resolves PER LENGTH GROUP: a
    KG-heavy group routes to csr while small groups stay on segment, and
    the mixed call returns exactly the union of the explicit per-subset
    calls (each subset's RNG positions are its own path order). The warm
    keys (eval_aot_keys) follow the same per-group routing, so warmed
    executables always match what the real call runs."""
    from mpgnn_tpu.train import batch_eval, loops

    graph, g = planted
    split = split_nodes(g["labels"])
    cfg = MPGNNConfig(epochs=15, hidden_dim=8, backend="auto")
    order = np.argsort(graph.rel_counts)
    big = int(order[-1])
    s0, s1 = int(order[0]), int(order[1])
    assert graph.rel_counts[big] > graph.rel_counts[s1]
    monkeypatch.setattr(loops, "CSR_EDGE_CUTOVER",
                        int(graph.rel_counts[big]))
    paths_csr = [[big]]
    paths_seg = [[s0, s1]]
    assert batch_eval.resolve_eval_backend(
        None, cfg, graph, paths_csr) == "csr"
    assert batch_eval.resolve_eval_backend(
        None, cfg, graph, paths_seg) == "segment"
    mixed = batch_eval.evaluate_candidates(
        graph, paths_csr + paths_seg, split, 2, cfg, seed=3
    )
    a = batch_eval.evaluate_candidates(
        graph, paths_csr, split, 2, cfg, seed=3, backend="csr"
    )
    b = batch_eval.evaluate_candidates(
        graph, paths_seg, split, 2, cfg, seed=3, backend="segment"
    )
    assert mixed == {**a, **b}
    keys = batch_eval.eval_aot_keys(
        graph, paths_csr + paths_seg, split, 2, cfg, seed=3
    )
    kinds = {k[0] == "csr" for k in keys}
    assert kinds == {True, False}


def test_csr_epoch_blocks_partition():
    """_csr_epoch_blocks covers epochs exactly: full blocks + remainder,
    a single short block when epochs < block, [0] for epochs=0."""
    from mpgnn_tpu.train import batch_eval

    orig = batch_eval._CSR_EVAL_EPOCH_BLOCK
    try:
        batch_eval._CSR_EVAL_EPOCH_BLOCK = 100
        assert batch_eval._csr_epoch_blocks(1000) == [100] * 10
        assert batch_eval._csr_epoch_blocks(250) == [100, 100, 50]
        assert batch_eval._csr_epoch_blocks(60) == [60]
        assert batch_eval._csr_epoch_blocks(0) == [0]
        assert sum(batch_eval._csr_epoch_blocks(1234)) == 1234
    finally:
        batch_eval._CSR_EVAL_EPOCH_BLOCK = orig
