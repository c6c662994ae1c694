"""Kernel unit tests: segment reductions vs dense numpy references.

Covers the reference aggregation semantics (SURVEY §2.5): mean over in-edges
of the selected relation into source rows, zero vector for empty segments,
first-occurrence argmax tie-breaking.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from mpgnn_tpu.ops import (
    ell_mean_aggregate,
    ell_max_gather,
    masked_segment_mean,
    rel_mean_aggregate,
    segment_argmax,
    segment_max,
    segment_mean,
)
from mpgnn_tpu.ops.spmm import dense_adjacency


def dense_mean_reference(x, src, dst, num_nodes, mask=None):
    out = np.zeros((num_nodes, x.shape[1]), dtype=np.float64)
    cnt = np.zeros(num_nodes, dtype=np.float64)
    for i in range(len(src)):
        if mask is not None and not mask[i]:
            continue
        out[src[i]] += x[dst[i]]
        cnt[src[i]] += 1
    nz = cnt > 0
    out[nz] /= cnt[nz, None]
    return out


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def test_segment_mean_matches_dense(rng):
    N, E, F = 50, 200, 8
    src = rng.integers(0, N, E)
    dst = rng.integers(0, N, E)
    x = rng.normal(size=(N, F)).astype(np.float32)
    got = segment_mean(jnp.asarray(x)[jnp.asarray(dst)], jnp.asarray(src), N)
    want = dense_mean_reference(x, src, dst, N)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)


def test_segment_mean_empty_segments_zero(rng):
    x = np.ones((10, 4), dtype=np.float32)
    src = np.array([0, 0, 3])
    dst = np.array([1, 2, 4])
    got = np.asarray(segment_mean(jnp.asarray(x)[dst], jnp.asarray(src), 10))
    assert np.all(got[1] == 0) and np.all(got[9] == 0)
    assert np.all(got[0] == 1) and np.all(got[3] == 1)


def test_masked_segment_mean(rng):
    N, E, F = 30, 100, 4
    src = rng.integers(0, N, E)
    dst = rng.integers(0, N, E)
    mask = rng.random(E) > 0.4
    x = rng.normal(size=(N, F)).astype(np.float32)
    got = masked_segment_mean(
        jnp.asarray(x)[jnp.asarray(dst)], jnp.asarray(src), jnp.asarray(mask), N
    )
    want = dense_mean_reference(x, src, dst, N, mask)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)


def test_rel_mean_aggregate_equals_ell_and_dense(rng):
    N, E, F = 40, 150, 6
    src = rng.integers(0, N, E).astype(np.int32)
    dst = rng.integers(0, N, E).astype(np.int32)
    x = rng.normal(size=(N, F)).astype(np.float32)

    seg = np.asarray(rel_mean_aggregate(jnp.asarray(x), jnp.asarray(src), jnp.asarray(dst), N))

    # ELL build
    deg = np.bincount(src, minlength=N)
    D = int(deg.max())
    nbr = np.zeros((N, D), np.int32)
    m = np.zeros((N, D), bool)
    cur = np.zeros(N, np.int64)
    for s, d in zip(src, dst):
        nbr[s, cur[s]] = d
        m[s, cur[s]] = True
        cur[s] += 1
    ell = np.asarray(ell_mean_aggregate(jnp.asarray(x), jnp.asarray(nbr), jnp.asarray(m)))

    adj, adj_t = dense_adjacency(src, dst, N)
    den = np.asarray(adj @ jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(adj_t), np.asarray(adj).T)

    want = dense_mean_reference(x, src, dst, N)
    np.testing.assert_allclose(seg, want, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(ell, want, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(den, want, rtol=1e-4, atol=1e-5)


def test_segment_max_and_argmax_first_occurrence():
    data = jnp.asarray([1.0, 3.0, 3.0, 2.0, 5.0])
    seg = jnp.asarray([0, 0, 0, 1, 1])
    mx = segment_max(data, seg, 3)
    np.testing.assert_allclose(np.asarray(mx), [3.0, 5.0, 0.0])
    mxv, idx = segment_argmax(data, seg, 3)
    assert int(idx[0]) == 1  # first of the two 3.0s
    assert int(idx[1]) == 4
    assert np.isneginf(np.asarray(mxv)[2])


def test_ell_max_gather_tie_break_and_gradient():
    import jax

    w = jnp.asarray([0.5, 0.9, 0.9, 0.1])
    nbr = jnp.asarray([[1, 2, 3], [3, 0, 0]])
    mask = jnp.asarray([[True, True, True], [True, False, False]])
    val, winner = ell_max_gather(w, nbr, mask)
    assert int(winner[0]) == 1  # ties -> first in adjacency order
    assert int(winner[1]) == 3
    np.testing.assert_allclose(np.asarray(val), [0.9, 0.1])

    # gradient flows only to the winning destination
    def loss(w):
        v, _ = ell_max_gather(w, nbr, mask)
        return v[0]

    g = np.asarray(jax.grad(loss)(w))
    np.testing.assert_allclose(g, [0.0, 1.0, 0.0, 0.0])


def test_ell2_gather_only_aggregation_and_vjp():
    import jax

    from mpgnn_tpu.ops.spmm import build_ell2_operand, ell2_mean_aggregate

    rng = np.random.default_rng(0)
    N, E, F = 80, 300, 4
    src = rng.integers(0, N, E)
    dst = rng.integers(0, N, E)
    op = build_ell2_operand(src, dst, N)
    h = jnp.asarray(rng.normal(size=(N, F)).astype(np.float32))
    got = np.asarray(ell2_mean_aggregate(op, h))
    want = dense_mean_reference(h, src, dst, N)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    g = jnp.asarray(rng.normal(size=(N, F)).astype(np.float32))
    gp = np.asarray(
        jax.grad(lambda h: jnp.sum(ell2_mean_aggregate(op, h) * g))(h)
    )
    sj, dj = jnp.asarray(src), jnp.asarray(dst)

    def ref(h):
        tot = jax.ops.segment_sum(h[dj], sj, num_segments=N)
        cnt = jax.ops.segment_sum(jnp.ones(E), sj, num_segments=N)
        return tot / jnp.maximum(cnt, 1.0)[:, None]

    gr = np.asarray(jax.grad(lambda h: jnp.sum(ref(h) * g))(h))
    np.testing.assert_allclose(gp, gr, rtol=1e-4, atol=1e-5)
