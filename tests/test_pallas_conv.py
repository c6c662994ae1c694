"""Fused dense RelConv Pallas kernel tests (interpreter mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from mpgnn_tpu.ops.pallas_conv import build_dense_conv_operand, pallas_dense_conv


def _setup(seed=0, N=200, E=700, F=8, H=16):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, N, E).astype(np.int32)
    dst = rng.integers(0, N, E).astype(np.int32)
    h = jnp.asarray(rng.normal(size=(N, F)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(F, H)).astype(np.float32) * 0.3)
    root = jnp.asarray(rng.normal(size=(F, H)).astype(np.float32) * 0.3)
    b = jnp.asarray(rng.normal(size=(H,)).astype(np.float32) * 0.1)
    op = build_dense_conv_operand(src, dst, N, block_rows=64)
    # reference uses the SAME bf16-quantized adjacency so only accumulation
    # order differs (ReLU-boundary sign flips from quantization would
    # otherwise produce spurious large gradient diffs)
    a_f32 = jnp.asarray(np.asarray(op.a, np.float32)[:N])

    def ref(h, w, root, b):
        agg = jnp.dot(a_f32, h.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)
        return jax.nn.relu(agg @ w + h @ root + b)

    return op, (h, w, root, b), ref


def test_fused_conv_matches_reference():
    op, args, ref = _setup()
    got = np.asarray(pallas_dense_conv(op, True, *args))
    want = np.asarray(ref(*args))
    # bf16 adjacency -> ~1e-2 relative tolerance
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_fused_conv_gradients_match_reference():
    op, (h, w, root, b), ref = _setup(1)
    g = jnp.asarray(np.random.default_rng(2).normal(size=ref(h, w, root, b).shape).astype(np.float32))

    def loss_p(h, w, root, b):
        return jnp.sum(pallas_dense_conv(op, True, h, w, root, b) * g)

    def loss_r(h, w, root, b):
        return jnp.sum(ref(h, w, root, b) * g)

    gp = jax.grad(loss_p, argnums=(0, 1, 2, 3))(h, w, root, b)
    gr = jax.grad(loss_r, argnums=(0, 1, 2, 3))(h, w, root, b)
    for a, bb in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb), rtol=3e-2, atol=3e-2)
