"""Scatter-free one-hot-block SpMM tests (ops/pallas_spmm.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from mpgnn_tpu.ops.pallas_spmm import (
    build_spmm_blocking,
    onehot_spmm_mean,
    ref_mean,
)


def test_onehot_matches_reference():
    rng = np.random.default_rng(0)
    N, E, F = 300, 900, 8
    src = rng.integers(0, N, E).astype(np.int32)
    dst = rng.integers(0, N, E).astype(np.int32)
    h = jnp.asarray(rng.normal(size=(N, F)).astype(np.float32))
    fwd, bwd = build_spmm_blocking(src, dst, N, block_rows=64)
    got = np.asarray(onehot_spmm_mean(fwd, bwd, h))
    want = np.asarray(ref_mean(h, jnp.asarray(src), jnp.asarray(dst), N))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_onehot_gradient_matches_reference():
    rng = np.random.default_rng(1)
    N, E, F = 200, 600, 4
    src = rng.integers(0, N, E).astype(np.int32)
    dst = rng.integers(0, N, E).astype(np.int32)
    h = jnp.asarray(rng.normal(size=(N, F)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(N, F)).astype(np.float32))
    fwd, bwd = build_spmm_blocking(src, dst, N, block_rows=64)

    gp = np.asarray(jax.grad(lambda h: jnp.sum(onehot_spmm_mean(fwd, bwd, h) * g))(h))
    gr = np.asarray(jax.grad(lambda h: jnp.sum(ref_mean(h, jnp.asarray(src), jnp.asarray(dst), N) * g))(h))
    np.testing.assert_allclose(gp, gr, rtol=1e-4, atol=1e-5)


def test_onehot_empty_rows_zero():
    src = np.array([0, 0], np.int32)
    dst = np.array([3, 4], np.int32)
    h = jnp.asarray(np.ones((8, 4), np.float32))
    fwd, bwd = build_spmm_blocking(src, dst, 8, block_rows=8)
    out = np.asarray(onehot_spmm_mean(fwd, bwd, h))
    assert np.all(out[0] == 1.0)
    assert np.all(out[1:] == 0.0)


def test_onehot_works_under_jit_and_scan():
    rng = np.random.default_rng(2)
    N, E, F = 100, 300, 4
    src = rng.integers(0, N, E).astype(np.int32)
    dst = rng.integers(0, N, E).astype(np.int32)
    h = jnp.asarray(rng.normal(size=(N, F)).astype(np.float32))
    fwd, bwd = build_spmm_blocking(src, dst, N, block_rows=32)

    @jax.jit
    def f(h):
        def body(c, _):
            return c, onehot_spmm_mean(fwd, bwd, h)[0, 0]
        _, ys = jax.lax.scan(body, 0, None, length=3)
        return ys[-1]

    r1 = float(f(h))
    r2 = float(onehot_spmm_mean(fwd, bwd, h)[0, 0])  # outside jit after jit
    np.testing.assert_allclose(r1, r2, rtol=1e-6)
