"""Model parity tests: RelConv / fast RGCN / MultiMetapathGNN semantics vs
independent dense references (SURVEY §4 layer (b): activation parity given
identical weights)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpgnn_tpu.models import (
    fast_rgcn_aggregate,
    init_mpgnn,
    init_relconv,
    mpgnn_forward,
    relconv_apply,
)
from mpgnn_tpu.ops import rel_mean_aggregate
from mpgnn_tpu.graph.hetero import HeteroGraph
from mpgnn_tpu.train.loops import build_hop_arrays


@pytest.fixture
def tiny_graph(rng=np.random.default_rng(3)):
    N, E, R, F = 20, 60, 3, 5
    src = rng.integers(0, N, E)
    dst = rng.integers(0, N, E)
    rel = rng.integers(0, R, E)
    x = rng.normal(size=(N, F)).astype(np.float32)
    return HeteroGraph(x, src, dst, rel, num_relations=R)


def _dense_relconv_reference(x, src, dst, W, root, bias):
    """out = mean_r(x) @ W + x @ root + bias with zero rows for edgeless
    sources — the reference CustomRGCNConv math (mp_rgcn_layer.py:231-268)."""
    N = x.shape[0]
    agg = np.zeros_like(x)
    cnt = np.zeros(N)
    for s, d in zip(src, dst):
        agg[s] += x[d]
        cnt[s] += 1
    nz = cnt > 0
    agg[nz] /= cnt[nz, None]
    return agg @ W + x @ root + bias


def test_relconv_matches_dense_reference(tiny_graph):
    g = tiny_graph
    params = init_relconv(jax.random.PRNGKey(0), g.feat_dim, 7)
    for r in range(g.num_relations):
        src, dst = g.rel_edges(r)
        agg = rel_mean_aggregate(
            jnp.asarray(g.x), jnp.asarray(src), jnp.asarray(dst), g.num_nodes
        )
        got = np.asarray(relconv_apply(params, jnp.asarray(g.x), agg))
        want = _dense_relconv_reference(
            g.x, src, dst,
            np.asarray(params.weight), np.asarray(params.root),
            np.asarray(params.bias),
        )
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_fast_rgcn_matches_per_relation_sum(tiny_graph):
    """CustomFastRGCNConv aggregation == sum over relations of per-relation
    mean @ W_r (typed-degree normalization, mp_rgcn_layer.py:346-357)."""
    g = tiny_graph
    R, F, H = g.num_relations, g.feat_dim, 4
    rng = np.random.default_rng(0)
    W = rng.normal(size=(R, F, H)).astype(np.float32)
    got = np.asarray(
        fast_rgcn_aggregate(
            jnp.asarray(g.x), jnp.asarray(W),
            jnp.asarray(g.sorted_src), jnp.asarray(g.sorted_dst),
            jnp.asarray(g.sorted_type), g.num_nodes,
        )
    )
    want = np.zeros((g.num_nodes, H))
    for r in range(R):
        src, dst = g.rel_edges(r)
        agg = np.zeros((g.num_nodes, F))
        cnt = np.zeros(g.num_nodes)
        for s, d in zip(src, dst):
            agg[s] += g.x[d]
            cnt[s] += 1
        nz = cnt > 0
        agg[nz] /= cnt[nz, None]
        want += agg @ W[r]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_mpgnn_forward_reference_math(tiny_graph):
    """Full MPNetm forward vs a dense numpy re-execution with the same
    parameters (model.py:203-228 semantics: per-hop ReLU, concat, fc1-ReLU,
    fc2, log_softmax; eval mode = no dropout)."""
    g = tiny_graph
    metapaths = [[0, 1], [2, 0]]
    params = init_mpgnn(jax.random.PRNGKey(1), g.feat_dim, 6, 2, metapaths)
    ops = build_hop_arrays(g, metapaths, pad_multiple=8)
    got = np.asarray(
        mpgnn_forward(params, jnp.asarray(g.x), ops, train=False)
    )

    embs = []
    for i, mp in enumerate(metapaths):
        h = g.x.astype(np.float64)
        for j, r in enumerate(mp):
            src, dst = g.rel_edges(r)
            conv = params.convs[i][j]
            h = _dense_relconv_reference(
                h, src, dst,
                np.asarray(conv.weight), np.asarray(conv.root),
                np.asarray(conv.bias),
            )
            h = np.maximum(h, 0)
        embs.append(h)
    cat = np.concatenate(embs, axis=1)
    h = np.maximum(cat @ np.asarray(params.fc1.w) + np.asarray(params.fc1.b), 0)
    h = h @ np.asarray(params.fc2.w) + np.asarray(params.fc2.b)
    logp = h - np.log(np.exp(h).sum(axis=1, keepdims=True))
    np.testing.assert_allclose(got, logp, rtol=1e-4, atol=1e-4)


def test_mpgnn_dropout_only_in_train_mode(tiny_graph):
    g = tiny_graph
    metapaths = [[0]]
    params = init_mpgnn(jax.random.PRNGKey(1), g.feat_dim, 6, 2, metapaths)
    ops = build_hop_arrays(g, metapaths, pad_multiple=8)
    a = mpgnn_forward(params, jnp.asarray(g.x), ops, train=False)
    b = mpgnn_forward(params, jnp.asarray(g.x), ops, train=False)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = mpgnn_forward(
        params, jnp.asarray(g.x), ops, train=True,
        dropout_rng=jax.random.PRNGKey(5),
    )
    assert not np.allclose(np.asarray(a), np.asarray(c))


def test_mpgnn_backends_agree(tiny_graph):
    """segment / ell / dense aggregation backends produce identical
    forward activations."""
    from mpgnn_tpu.train.loops import build_hop_arrays as bha

    g = tiny_graph
    metapaths = [[0, 2]]
    params = init_mpgnn(jax.random.PRNGKey(2), g.feat_dim, 6, 2, metapaths)
    outs = []
    for backend in ("segment", "ell", "dense"):
        ops = bha(g, metapaths, pad_multiple=8, backend=backend)
        outs.append(
            np.asarray(mpgnn_forward(params, jnp.asarray(g.x), ops, train=False))
        )
    np.testing.assert_allclose(outs[0], outs[1], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(outs[0], outs[2], rtol=1e-4, atol=1e-4)


def test_basis_and_block_decomposition():
    from mpgnn_tpu.models.relconv import basis_weights, block_diag_apply

    rng = np.random.default_rng(0)
    R, B, F, H = 4, 2, 6, 8
    comp = jnp.asarray(rng.normal(size=(R, B)).astype(np.float32))
    bases = jnp.asarray(rng.normal(size=(B, F, H)).astype(np.float32))
    W = np.asarray(basis_weights(comp, bases))
    want = np.einsum("rb,bio->rio", np.asarray(comp), np.asarray(bases))
    np.testing.assert_allclose(W, want, rtol=1e-5, atol=1e-6)

    nb, bi, bo = 2, 3, 4
    bw = jnp.asarray(rng.normal(size=(nb, bi, bo)).astype(np.float32))
    h = jnp.asarray(rng.normal(size=(5, nb * bi)).astype(np.float32))
    got = np.asarray(block_diag_apply(h, bw))
    want = np.zeros((5, nb * bo))
    for b in range(nb):
        want[:, b * bo:(b + 1) * bo] = (
            np.asarray(h)[:, b * bi:(b + 1) * bi] @ np.asarray(bw)[b]
        )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_empty_relation_hop_is_root_only():
    """A metapath hop over a relation with zero edges must produce zero
    aggregation (root + bias only) — the torch.zeros base of
    mp_rgcn_layer.py:198."""
    src = np.array([0, 1])
    dst = np.array([1, 2])
    rel = np.array([0, 0])
    g = HeteroGraph(np.ones((4, 3), np.float32), src, dst, rel, num_relations=2)
    params = init_mpgnn(jax.random.PRNGKey(0), 3, 4, 2, [[1]])  # relation 1: no edges
    ops = build_hop_arrays(g, [[1]], pad_multiple=8)
    out = mpgnn_forward(params, jnp.asarray(g.x), ops, train=False)
    conv = params.convs[0][0]
    h = jax.nn.relu(jnp.asarray(g.x) @ conv.root + conv.bias)
    h = jax.nn.relu(h @ params.fc1.w + params.fc1.b)
    want = jax.nn.log_softmax(h @ params.fc2.w + params.fc2.b, axis=1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), rtol=1e-5, atol=1e-6)


def test_duplicate_and_self_loop_edges_counted_with_multiplicity():
    """Duplicate edges contribute with multiplicity and self-loops are legal
    (the reference never dedups edge_index)."""
    src = np.array([0, 0, 0, 1])
    dst = np.array([1, 1, 2, 1])   # (0->1) twice, plus a self-loop at 1
    rel = np.zeros(4, dtype=np.int64)
    x = np.array([[1.0], [2.0], [4.0]], np.float32)
    g = HeteroGraph(x, src, dst, rel, num_relations=1)
    from mpgnn_tpu.ops import rel_mean_aggregate
    from mpgnn_tpu.ops.spmm import dense_adjacency

    s, d = g.rel_edges(0)
    agg = np.asarray(rel_mean_aggregate(jnp.asarray(x), jnp.asarray(s), jnp.asarray(d), 3))
    # node 0: mean(2, 2, 4) = 8/3 ; node 1: mean(2) = 2
    np.testing.assert_allclose(agg[:, 0], [8 / 3, 2.0, 0.0], rtol=1e-6)
    adj, _ = dense_adjacency(s, d, 3)
    np.testing.assert_allclose(np.asarray(adj @ jnp.asarray(x))[:, 0], [8 / 3, 2.0, 0.0], rtol=1e-6)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_all_backends_agree_on_random_graphs(seed):
    """Property test: every aggregation backend computes the same training
    forward on random graphs (random N, E, relations, features)."""
    from mpgnn_tpu.train.loops import build_hop_arrays as bha

    rng = np.random.default_rng(seed)
    N = int(rng.integers(30, 200))
    E = int(rng.integers(50, 600))
    R = int(rng.integers(2, 5))
    F = int(rng.integers(2, 9))
    src = rng.integers(0, N, E)
    dst = rng.integers(0, N, E)
    rel = rng.integers(0, R, E)
    x = rng.normal(size=(N, F)).astype(np.float32)
    g = HeteroGraph(x, src, dst, rel, num_relations=R)
    mp = [int(rng.integers(0, R)) for _ in range(int(rng.integers(1, 4)))]
    params = init_mpgnn(jax.random.PRNGKey(seed), F, 8, 2, [mp])

    outs = {}
    for backend in ("segment", "ell", "ell2", "dense", "onehot", "pallas", "csr"):
        ops = bha(g, [mp], pad_multiple=8, backend=backend)
        outs[backend] = np.asarray(
            mpgnn_forward(params, jnp.asarray(g.x), ops, train=False)
        )
    ref = outs["segment"]
    for backend, out in outs.items():
        tol = 3e-2 if backend == "pallas" else 1e-4  # bf16 adjacency
        np.testing.assert_allclose(out, ref, rtol=tol, atol=tol,
                                   err_msg=backend)


def test_first_hop_precompute_is_exact(tiny_graph):
    """precompute_first_hop + mpgnn_forward(first_hop_agg=...) must be
    bit-identical to the uncached forward: hop 0 aggregates the constant
    input features, so caching it outside the epoch loop is pure CSE."""
    from mpgnn_tpu.models.mpgnn import mpgnn_forward, precompute_first_hop

    g = tiny_graph
    metapaths = [[0, 1], [2, 0]]
    params = init_mpgnn(jax.random.PRNGKey(3), g.feat_dim, 6, 2, metapaths)
    x = jnp.asarray(g.x)
    for backend in ("segment", "ell", "dense"):
        ops = build_hop_arrays(g, metapaths, pad_multiple=8, backend=backend)
        base = mpgnn_forward(params, x, ops, train=False)
        aggs = precompute_first_hop(x, ops)
        cached = mpgnn_forward(
            params, x, ops, train=False, first_hop_agg=aggs
        )
        np.testing.assert_array_equal(np.asarray(base), np.asarray(cached))
        # train mode (dropout active) with the same rng must also agree
        rng = jax.random.PRNGKey(7)
        bt = mpgnn_forward(params, x, ops, train=True, dropout_rng=rng)
        ct = mpgnn_forward(
            params, x, ops, train=True, dropout_rng=rng, first_hop_agg=aggs
        )
        np.testing.assert_array_equal(np.asarray(bt), np.asarray(ct))
