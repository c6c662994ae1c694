"""Relation-scorer semantics tests vs hand-computed references
(model.py:26-125, main.py:479-543, 641-673 behavior)."""

import jax
import jax.numpy as jnp
import numpy as np

from mpgnn_tpu.graph.hetero import HeteroGraph
from mpgnn_tpu.models.scorer import (
    ScorerParams,
    scorer_forward_bags,
    scorer_forward_flat,
    clamp_params,
)
from mpgnn_tpu.search.scoring import (
    dest_min_labels,
    score_relations_flat,
    score_relations_bags,
)
from mpgnn_tpu.config import ScorerConfig


def _ell(graph, r):
    return graph.neighbor_table(r)


def make_graph():
    #  0 -r0-> 2, 0 -r0-> 3, 1 -r0-> 3, 4 -r1-> 2
    src = np.array([0, 0, 1, 4])
    dst = np.array([2, 3, 3, 2])
    rel = np.array([0, 0, 0, 1])
    x = np.eye(5, 3, dtype=np.float32)[:, :3]
    return HeteroGraph(x[:, :2], src, dst, rel, num_relations=2)


def test_flat_forward_max_and_zero_rows():
    g = make_graph()
    nbr, mask = _ell(g, 0)
    w = jnp.asarray([0.0, 0.0, 0.7, 0.2, 0.0])
    params = ScorerParams(w=w, u=jnp.zeros(2))
    src_idx = jnp.asarray([0, 1, 4])
    pred, winner = scorer_forward_flat(
        params, jnp.asarray(nbr), jnp.asarray(mask), src_idx,
        jnp.ones(3),
    )
    # node 0: max(w[2], w[3]) = 0.7 ; node 1: w[3] = 0.2 ; node 4 has no
    # r0 edges -> 0 (torch.zeros base, model.py:79)
    np.testing.assert_allclose(np.asarray(pred), [0.7, 0.2, 0.0], atol=1e-6)
    assert int(winner[0]) == 2 and int(winner[1]) == 3


def test_flat_gradient_only_to_winner():
    g = make_graph()
    nbr, mask = _ell(g, 0)

    def loss(w):
        params = ScorerParams(w=w, u=jnp.zeros(2))
        pred, _ = scorer_forward_flat(
            params, jnp.asarray(nbr), jnp.asarray(mask),
            jnp.asarray([0]), jnp.ones(1),
        )
        return ((pred - 1.0) ** 2).sum()

    gr = np.asarray(jax.grad(loss)(jnp.asarray([0.0, 0.0, 0.7, 0.2, 0.0])))
    assert gr[2] != 0.0          # winner gets gradient
    assert np.all(gr[[0, 1, 3, 4]] == 0.0)  # losers don't


def test_bag_forward_two_level_max():
    g = make_graph()
    nbr, mask = _ell(g, 0)
    w = jnp.asarray([0.0, 0.0, 0.5, 0.9, 0.0])
    u = jnp.asarray([1.0, 0.5])
    x = jnp.asarray(g.x)
    # bag 0 = {0, 1}; lin(0) = x[0].u = 1.0, lin(1) = 0.5
    bags = jnp.asarray([[0, 1]])
    member_mask = jnp.asarray([[True, True]])
    pred, bag_winner, member_value, member_winner = scorer_forward_bags(
        ScorerParams(w=w, u=u), x, jnp.asarray(nbr), jnp.asarray(mask),
        bags, member_mask,
    )
    # member 0: max(w[2]*1, w[3]*1) = 0.9 (winner 3)
    # member 1: w[3]*0.5 = 0.45 (winner 3)
    np.testing.assert_allclose(float(member_value[0]), 0.9, atol=1e-6)
    np.testing.assert_allclose(float(member_value[1]), 0.45, atol=1e-6)
    np.testing.assert_allclose(float(pred[0]), 0.9, atol=1e-6)
    assert int(bag_winner[0]) == 3


def test_dest_min_labels():
    g = make_graph()
    labels = np.array([1.0, 0.0, 0.0, 0.0, 1.0], np.float32)
    mask = np.array([True, True, False, False, False])
    dsts, mins = dest_min_labels(g, 0, mask, labels)
    # dst 2 sees src 0 (label 1); dst 3 sees srcs 0,1 (labels 1,0) -> min 0
    assert dsts.tolist() == [2, 3]
    np.testing.assert_allclose(mins, [1.0, 0.0])


def test_clamp():
    p = ScorerParams(w=jnp.asarray([-0.5, 0.5, 1.5]), u=jnp.asarray([2.0]))
    c = clamp_params(p)
    np.testing.assert_allclose(np.asarray(c.w), [0.0, 0.5, 1.0])
    np.testing.assert_allclose(np.asarray(c.u), [1.0])


def test_flat_sweep_separates_informative_relation():
    """On a graph where relation 0 perfectly explains labels and relation 1
    is noise, the hop-0 sweep must give relation 0 a much lower loss
    (score_relation_parallel behavior, main.py:727-760)."""
    rng = np.random.default_rng(0)
    N = 400
    # sources 0..199, destinations 200..399; label(src) = 1 iff its r0
    # destination is in the "good" half
    src0 = np.arange(200)
    dst0 = rng.integers(200, 400, 200)
    labels = (dst0 >= 300).astype(np.float32)
    # relation 1: random
    src1 = np.arange(200)
    dst1 = rng.integers(200, 400, 200)
    src = np.concatenate([src0, src1])
    dst = np.concatenate([dst0, dst1])
    rel = np.concatenate([np.zeros(200, int), np.ones(200, int)])
    x = np.ones((400, 2), np.float32)
    g = HeteroGraph(x, src, dst, rel, num_relations=2)
    node_labels = np.zeros(400, np.float32)
    node_labels[:200] = labels
    res = score_relations_flat(
        g, [0, 1], node_labels, None, ScorerConfig(), rng,
    )
    assert res[0].loss < 0.01
    assert res[1].loss > res[0].loss * 5


def _force_segment(monkeypatch):
    """Route every relation through the segment scorer path."""
    from mpgnn_tpu.search import scoring as sc

    monkeypatch.setattr(sc, "_SEG_RATIO", 0)


def test_flat_sweep_segment_matches_ell(monkeypatch):
    """The segment-form flat sweep (hub-degree strategy) is BIT-compatible
    with the ELL sweep: same init -> same trained weights and losses."""
    from mpgnn_tpu.search import scoring as sc

    rng = np.random.default_rng(0)
    N = 300
    src = rng.integers(0, 150, 600)
    dst = rng.integers(150, N, 600)
    rel = rng.integers(0, 3, 600)
    x = np.ones((N, 2), np.float32)
    g = HeteroGraph(x, src, dst, rel, num_relations=3)
    labels = rng.random(N).astype(np.float32)

    assert all(sc._relation_mode(g, r)[0] == "ell" for r in range(3))
    ref = score_relations_flat(
        g, [0, 1, 2], labels, None, ScorerConfig(),
        np.random.default_rng(7),
    )
    _force_segment(monkeypatch)
    assert all(sc._relation_mode(g, r)[0] == "seg" for r in range(3))
    got = score_relations_flat(
        g, [0, 1, 2], labels, None, ScorerConfig(),
        np.random.default_rng(7),
    )
    for r in range(3):
        np.testing.assert_allclose(
            got[r].loss, ref[r].loss, rtol=1e-5, atol=1e-6
        )
        np.testing.assert_allclose(
            got[r].weights, ref[r].weights, rtol=1e-4, atol=1e-5
        )


def test_flat_sweep_compact_fixed_mask_loss_const(monkeypatch):
    """fb15k mode pins ONE labeled-source set for every relation
    (main.py:728-735 first=False branch); sources with no edges of a
    relation then sit OUTSIDE its compact endpoint space yet still
    contribute (0 - y)² to its loss. The segment sweep must reproduce the
    ELL sweep's loss (which sums those terms in-device) via its host-side
    constant."""
    from mpgnn_tpu.search import scoring as sc
    from mpgnn_tpu.search.scoring import score_relations_flat

    rng = np.random.default_rng(1)
    N = 260
    # relation 0 touches nodes 0..99 only; relation 1 touches 100..199
    src0 = rng.integers(0, 50, 150)
    dst0 = rng.integers(50, 100, 150)
    src1 = rng.integers(100, 150, 150)
    dst1 = rng.integers(150, 200, 150)
    src = np.concatenate([src0, src1])
    dst = np.concatenate([dst0, dst1])
    rel = np.concatenate([np.zeros(150, int), np.ones(150, int)])
    x = np.ones((N, 2), np.float32)
    g = HeteroGraph(x, src, dst, rel, num_relations=2)
    labels = rng.random(N).astype(np.float32)
    # labeled sources spread across BOTH relations' node ranges plus nodes
    # incident to neither -> every relation sees edgeless masked sources
    sources = list(range(0, 30)) + list(range(100, 130)) + list(range(200, 230))

    ref = score_relations_flat(
        g, [0, 1], labels, sources, ScorerConfig(), np.random.default_rng(9)
    )
    _force_segment(monkeypatch)
    got = score_relations_flat(
        g, [0, 1], labels, sources, ScorerConfig(), np.random.default_rng(9)
    )
    for r in (0, 1):
        np.testing.assert_allclose(
            got[r].loss, ref[r].loss, rtol=1e-5, atol=1e-6
        )
        np.testing.assert_allclose(
            got[r].weights, ref[r].weights, rtol=1e-4, atol=1e-5
        )


def test_bag_sweep_segment_matches_ell(monkeypatch):
    """Segment-form bag restarts reproduce the ELL path's scores, restart
    counts, degenerate flags and member predictions exactly."""
    from mpgnn_tpu.search import scoring as sc

    rng = np.random.default_rng(3)
    N = 120
    src = rng.integers(0, 60, 300)
    dst = rng.integers(60, N, 300)
    rel = rng.integers(0, 2, 300)
    x = rng.random((N, 3)).astype(np.float32)
    g = HeteroGraph(x, src, dst, rel, num_relations=2)
    bags = [[0, 1, 2], [3], [4, 5]]
    bag_labels = np.array([1.0, 0.0, 1.0])
    cfg = ScorerConfig(max_restarts=3)

    ref = score_relations_bags(
        g, [0, 1], bags, bag_labels, cfg, np.random.default_rng(5)
    )
    _force_segment(monkeypatch)
    got = score_relations_bags(
        g, [0, 1], bags, bag_labels, cfg, np.random.default_rng(5)
    )
    for r in (0, 1):
        np.testing.assert_allclose(got[r].loss, ref[r].loss, rtol=1e-5)
        assert got[r].degenerate == ref[r].degenerate
        assert got[r].num_restarts == ref[r].num_restarts
        np.testing.assert_allclose(
            got[r].member_pred_max, ref[r].member_pred_max,
            rtol=1e-4, atol=1e-5,
        )
        np.testing.assert_array_equal(
            got[r].member_recorded, ref[r].member_recorded
        )


def test_segment_first_max_tie_break():
    """Ties resolve to the FIRST occurrence in file order (model.py:85):
    with equal weights on two destinations of one source, the segment
    winner must be the earlier edge's destination — and gradient flows to
    the winner only."""
    from mpgnn_tpu.search.scoring import _seg_first_max

    # source 0 -> dsts 3 then 2 (file order), equal weights
    src = jnp.asarray([0, 0], jnp.int32)
    dst = jnp.asarray([3, 2], jnp.int32)
    em = jnp.asarray([True, True])

    def pred_fn(w):
        vals = jnp.where(em, w[dst], -jnp.inf)
        _, win_e, has = _seg_first_max(vals, src, em, 5)
        return jnp.where(has, w[dst[win_e]], 0.0)[0]

    w = jnp.asarray([0.0, 0.0, 0.6, 0.6, 0.0])
    np.testing.assert_allclose(float(pred_fn(w)), 0.6, rtol=1e-6)
    gr = np.asarray(jax.grad(pred_fn)(w))
    assert gr[3] == 1.0 and gr[2] == 0.0     # first edge's dst (3) wins


def test_segment_first_max_scan_matches_bruteforce():
    """The segmented-associative-scan first-max (round-5 rewrite of the
    per-epoch argmax; scoring._seg_first_max_scan) matches a per-segment
    numpy oracle on random sorted id streams with duplicates, empty
    segments, and fully-masked segments — winner index, max value, and
    has-flag all agree, with ties at the FIRST occurrence."""
    from mpgnn_tpu.search.scoring import _seg_boundaries, _seg_first_max_scan

    rng = np.random.default_rng(7)
    for trial in range(5):
        C = 12
        E = int(rng.integers(8, 40))
        src = np.sort(rng.integers(0, C, E)).astype(np.int32)
        em = rng.random(E) < 0.7
        # quantized values make ties likely
        vals_raw = rng.integers(0, 4, E).astype(np.float32)
        vals = np.where(em, vals_raw, -np.inf).astype(np.float32)

        bound = _seg_boundaries(
            jnp.asarray(src), jnp.asarray(em), C
        )
        seg_max, win_e, has = (
            np.asarray(a)
            for a in _seg_first_max_scan(jnp.asarray(vals), *bound)
        )
        for c in range(C):
            idx = np.where((src == c) & em)[0]
            if len(idx) == 0:
                assert not has[c], (trial, c)
                continue
            assert has[c], (trial, c)
            best = idx[np.argmax(vals[idx])]   # np.argmax: first max
            assert win_e[c] == best, (trial, c, win_e[c], best)
            np.testing.assert_allclose(seg_max[c], vals[best])


def test_hub_relation_routes_to_segment():
    """A relation with one huge-degree hub must route to the segment path
    (one hub node would otherwise inflate the whole [N, D] ELL table)."""
    from mpgnn_tpu.search import scoring as sc

    rng = np.random.default_rng(0)
    N = 2000
    hub_e = 1500
    src = np.concatenate([np.zeros(hub_e, int), rng.integers(0, N, 100)])
    dst = rng.integers(0, N, hub_e + 100)
    rel = np.zeros(hub_e + 100, int)
    g = HeteroGraph(np.ones((N, 2), np.float32), src, dst, rel,
                    num_relations=1)
    mode, pad = sc._relation_mode(g, 0)
    assert mode == "seg"
    # and the sweep still runs correctly through it
    labels = rng.random(N).astype(np.float32)
    res = score_relations_flat(
        g, [0], labels, None, ScorerConfig(epochs_flat=5),
        np.random.default_rng(1),
    )
    assert np.isfinite(res[0].loss)


def test_bag_sweep_runs_and_flags_degenerate():
    g = make_graph()
    bags = [[0], [1]]
    bag_labels = np.array([1.0, 0.0])
    res = score_relations_bags(
        g, [0, 1], bags, bag_labels, ScorerConfig(max_restarts=3),
        np.random.default_rng(0),
    )
    assert not res[0].degenerate          # both bags have r0 edges
    # relation 1: no bag member has r1 edges -> zero kept bags is degenerate
    # via the single/no-positive rule (kept == 0 -> not single, not >1 ->
    # not flagged; the reference would have produced an empty cleaned bag
    # list here). Just assert it scored without error.
    assert res[1].relation == 1
    assert res[0].num_restarts >= 2


def test_seg_chunk_width_cap():
    """Vmapped segment-form sweep chunks must respect the R*C width cap:
    the XLA:TPU runtime crashed ('kernel fault') at a width product ~19.2M
    (R=96 full-space sweeps at N=200k, reproduced standalone on v5e), and
    per-relation time degrades superlinearly well before that. C is now
    each chunk's COMPACT node-space width (unique edge endpoints), so the
    cap binds on R*cpad rather than R*N."""
    import numpy as np

    from mpgnn_tpu.graph.hetero import HeteroGraph
    from mpgnn_tpu.search import scoring as sc

    N = 200_000
    rng = np.random.default_rng(0)
    # 128 relations, ~1.5k edges each, plus one hub edge per relation so
    # every relation routes to segment form (hub-inflated ELL)
    R, per = 128, 1500
    src = rng.integers(0, N, R * per)
    hub_src = np.repeat(np.arange(R) % 17, 130)  # 130 hub edges per rel
    rel = np.concatenate([np.repeat(np.arange(R), per),
                          np.arange(R).repeat(130)])
    src = np.concatenate([src, hub_src])
    dst = rng.integers(0, N, len(src))
    x = np.zeros((N, 1), np.float32)
    g = HeteroGraph(x, src, dst, rel, num_relations=R)

    chunks = sc._chunks(list(range(R)), g)
    assert chunks
    assert any(mode == "seg" for mode, _, _, _ in chunks)
    for mode, pad, cpad, chunk in chunks:
        if mode == "seg":
            assert len(chunk) * cpad <= sc._SEG_SWEEP_RN_CAP, (
                len(chunk), pad, cpad,
            )
            # the compact width is the endpoint bucket, far under N
            assert cpad <= sc._pow2_bucket(2 * pad)
