"""Pallas fused SpMM kernel tests (interpreter mode on CPU; the real-TPU
path is exercised by bench.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from mpgnn_tpu.ops.pallas_spmm import (
    build_spmm_blocking,
    pallas_spmm_mean,
    ref_mean,
)


def test_pallas_spmm_matches_reference():
    rng = np.random.default_rng(0)
    N, E, F = 300, 900, 8
    src = rng.integers(0, N, E).astype(np.int32)
    dst = rng.integers(0, N, E).astype(np.int32)
    h = rng.normal(size=(N, F)).astype(np.float32)
    fwd, bwd = build_spmm_blocking(src, dst, N, block_rows=64)
    got = np.asarray(pallas_spmm_mean(fwd, bwd, True, jnp.asarray(h)))
    want = np.asarray(ref_mean(jnp.asarray(h), jnp.asarray(src), jnp.asarray(dst), N))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_pallas_spmm_gradient_matches_reference():
    rng = np.random.default_rng(1)
    N, E, F = 200, 600, 4
    src = rng.integers(0, N, E).astype(np.int32)
    dst = rng.integers(0, N, E).astype(np.int32)
    h = jnp.asarray(rng.normal(size=(N, F)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(N, F)).astype(np.float32))
    fwd, bwd = build_spmm_blocking(src, dst, N, block_rows=64)

    def loss_pallas(h):
        return jnp.sum(pallas_spmm_mean(fwd, bwd, True, h) * g)

    def loss_ref(h):
        return jnp.sum(ref_mean(h, jnp.asarray(src), jnp.asarray(dst), N) * g)

    gp = np.asarray(jax.grad(loss_pallas)(h))
    gr = np.asarray(jax.grad(loss_ref)(h))
    np.testing.assert_allclose(gp, gr, rtol=1e-4, atol=1e-5)


def test_pallas_spmm_empty_rows_zero():
    src = np.array([0, 0], np.int32)
    dst = np.array([3, 4], np.int32)
    h = jnp.asarray(np.ones((8, 4), np.float32))
    fwd, bwd = build_spmm_blocking(src, dst, 8, block_rows=8)
    out = np.asarray(pallas_spmm_mean(fwd, bwd, True, h))
    assert np.all(out[0] == 1.0)
    assert np.all(out[1:] == 0.0)


def test_onehot_backend_matches_reference():
    from mpgnn_tpu.ops.pallas_spmm import onehot_spmm_mean

    rng = np.random.default_rng(3)
    N, E, F = 300, 900, 8
    src = rng.integers(0, N, E).astype(np.int32)
    dst = rng.integers(0, N, E).astype(np.int32)
    h = jnp.asarray(rng.normal(size=(N, F)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(N, F)).astype(np.float32))
    fwd, bwd = build_spmm_blocking(src, dst, N, block_rows=64)
    got = np.asarray(onehot_spmm_mean(fwd, bwd, h))
    want = np.asarray(ref_mean(h, jnp.asarray(src), jnp.asarray(dst), N))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    gp = np.asarray(jax.grad(lambda h: jnp.sum(onehot_spmm_mean(fwd, bwd, h) * g))(h))
    gr = np.asarray(jax.grad(lambda h: jnp.sum(ref_mean(h, jnp.asarray(src), jnp.asarray(dst), N) * g))(h))
    np.testing.assert_allclose(gp, gr, rtol=1e-4, atol=1e-5)
