"""Sorted-CSR block-one-hot segment kernel (ops/pallas_csr.py): agreement
with the XLA segment reference for values AND gradients, across shapes that
exercise block-boundary padding, empty blocks, zero-degree rows and
multiplicity. Runs in interpret mode on the CPU test platform; the same
code path compiles with Mosaic on TPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpgnn_tpu.ops.pallas_csr import (
    build_csr_blocking,
    csr_mean_aggregate,
    make_csr_aggregate,
    ref_mean,
)


def _rand_graph(n, e, f, seed=0, skew=False):
    rng = np.random.default_rng(seed)
    if skew:
        # power-law-ish: some rows get most edges (exercises multi-tile blocks)
        src = (n * rng.random(e) ** 3).astype(np.int64)
    else:
        src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    x = rng.standard_normal((n, f)).astype(np.float32)
    return src, dst, x


@pytest.mark.parametrize("n,e,f,bm", [
    (100, 400, 8, 32),
    (257, 1000, 16, 64),     # n not a block multiple
    (64, 0, 4, 32),          # no edges at all
    (500, 3000, 16, 128),
    (2000, 9000, 16, 512),   # default block size
])
def test_csr_matches_segment_forward(n, e, f, bm):
    src, dst, x = _rand_graph(n, e, f)
    fwd, bwd = build_csr_blocking(src, dst, n, bm=bm)
    got = csr_mean_aggregate(jnp.asarray(x), fwd, bwd)
    want = ref_mean(jnp.asarray(x), src.astype(np.int32),
                    dst.astype(np.int32), n) if e else jnp.zeros((n, f))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_csr_skewed_degrees():
    src, dst, x = _rand_graph(300, 5000, 8, seed=3, skew=True)
    fwd, bwd = build_csr_blocking(src, dst, 300, bm=64)
    got = csr_mean_aggregate(jnp.asarray(x), fwd, bwd)
    want = ref_mean(jnp.asarray(x), src.astype(np.int32),
                    dst.astype(np.int32), 300)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_csr_gradient_matches_segment():
    src, dst, x = _rand_graph(150, 800, 8, seed=1)
    fwd, bwd = build_csr_blocking(src, dst, 150, bm=32)
    g_out = np.random.default_rng(2).standard_normal((150, 8)).astype(np.float32)

    def loss_csr(x):
        return jnp.vdot(csr_mean_aggregate(x, fwd, bwd), g_out)

    def loss_ref(x):
        return jnp.vdot(
            ref_mean(x, src.astype(np.int32), dst.astype(np.int32), 150),
            g_out,
        )

    gx = jax.grad(loss_csr)(jnp.asarray(x))
    gr = jax.grad(loss_ref)(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gr),
                               rtol=1e-5, atol=1e-5)


def test_csr_under_jit_and_scan():
    """The op must be jittable with blockings as arguments (not embedded
    constants) and usable inside a training-style scan."""
    src, dst, x = _rand_graph(120, 600, 8, seed=4)
    fwd, bwd = build_csr_blocking(src, dst, 120, bm=32)
    agg = make_csr_aggregate(fwd, bwd)

    @jax.jit
    def run(x):
        def step(h, _):
            return agg(h) + 0.1 * h, None
        h, _ = jax.lax.scan(step, x, None, length=3)
        return h

    out = run(jnp.asarray(x))
    h = jnp.asarray(x)
    for _ in range(3):
        h = ref_mean(h, src.astype(np.int32), dst.astype(np.int32), 120) + 0.1 * h
    np.testing.assert_allclose(np.asarray(out), np.asarray(h),
                               rtol=1e-4, atol=1e-4)


def test_csr_zero_degree_rows_zero():
    # row 0 and the last block have no out-edges
    src = np.array([5, 5, 6])
    dst = np.array([1, 2, 3])
    x = np.eye(10, 4, dtype=np.float32)
    fwd, bwd = build_csr_blocking(src, dst, 10, bm=8)
    out = np.asarray(csr_mean_aggregate(jnp.asarray(x), fwd, bwd))
    assert out.shape == (10, 4)
    np.testing.assert_allclose(out[0], 0.0)
    np.testing.assert_allclose(out[7:], 0.0)
    np.testing.assert_allclose(out[6], x[3])
    np.testing.assert_allclose(out[5], 0.5 * (x[1] + x[2]))


def test_rect_blocking_pads_stay_in_gather_range():
    """Rectangular blockings: pad gather indices must be spread within the
    direction's ACTUAL gather source — the fwd blocking gathers from the
    [num_cols] operand, the bwd one from the [num_rows] cotangent. An
    earlier revision spread pads modulo the OUTPUT row space, so bwd pads
    could exceed the cotangent length (silently clamped by XLA onto the
    last row, re-serializing the pad reads the spread exists to avoid)."""
    from mpgnn_tpu.ops.pallas_csr import build_rect_csr_blocking

    rng = np.random.default_rng(0)
    S, T = 96, 4096  # output rows much smaller than the gather space
    rows = rng.integers(0, S, 300)
    cols = rng.integers(0, T, 300)
    w = rng.random(300).astype(np.float32)
    fwd, bwd = build_rect_csr_blocking(rows, cols, w, S, T)
    assert int(np.asarray(fwd.gidx).max()) < T
    # bwd gathers from the [S]-row cotangent: every index (pads included)
    # must stay in range without relying on clamp semantics
    assert int(np.asarray(bwd.gidx).max()) < S
    # pads are spread, not constant: with zero-weight slots excluded, the
    # padded gidx should hit many distinct rows
    bw = np.asarray(bwd.weight)
    pad_idx = np.asarray(bwd.gidx)[:-1][bw == 0.0]
    if len(pad_idx) > 10:
        # spread covers most of the gather space (a constant pad would
        # concentrate every slot on one row's HBM channel)
        assert len(np.unique(pad_idx)) >= min(len(pad_idx), S) // 2
