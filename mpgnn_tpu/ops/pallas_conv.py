"""Pallas TPU kernel: fused dense-adjacency RelConv.

One grid step computes a whole conv row-block in VMEM without intermediate
HBM round trips:

    out[i*BM:(i+1)*BM] = relu( (A_blk @ h) @ W  +  h_blk @ root  +  b )

with ``A`` the row-normalized (mean) adjacency stored in bf16 — halving the
dominant HBM stream versus the f32 XLA dense path — and f32 MXU
accumulation. The backward pass uses the precomputed ``A^T`` (bf16) so no
transpose is ever materialized (transposing a large HBM array measured ~80x
slower than the GEMM itself), with dW/droot/db as standard small GEMMs.

This is the speed-of-light formulation whenever A_r fits HBM; for larger
graphs use the ``segment`` backend (sorted scatter) or shard edges across
chips (mpgnn_tpu.parallel).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


class DenseConvOperand(NamedTuple):
    a: jax.Array     # [N_pad, N] bf16 row-normalized adjacency
    a_t: jax.Array   # [N_pad, N] bf16 transpose (bwd)
    num_rows: int


def build_dense_conv_operand(
    src: np.ndarray, dst: np.ndarray, num_nodes: int, block_rows: int = 256
) -> DenseConvOperand:
    a = np.zeros((num_nodes, num_nodes), dtype=np.float32)
    np.add.at(a, (np.asarray(src), np.asarray(dst)), 1.0)
    deg = a.sum(axis=1, keepdims=True)
    deg[deg == 0] = 1.0
    a /= deg
    n_pad = -(-num_nodes // block_rows) * block_rows
    ap = np.zeros((n_pad, num_nodes), dtype=np.float32)
    ap[:num_nodes] = a
    at = np.zeros((n_pad, num_nodes), dtype=np.float32)
    at[:num_nodes] = a.T
    return DenseConvOperand(
        a=jnp.asarray(ap, jnp.bfloat16),
        a_t=jnp.asarray(at, jnp.bfloat16),
        num_rows=num_nodes,
    )


def _conv_kernel(a_ref, h_ref, hblk_ref, w_ref, root_ref, b_ref, out_ref, agg_ref):
    agg = jnp.dot(
        a_ref[...], h_ref[...].astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    agg_ref[...] = agg
    z = (
        jnp.dot(agg, w_ref[...], preferred_element_type=jnp.float32)
        + jnp.dot(hblk_ref[...], root_ref[...], preferred_element_type=jnp.float32)
        + b_ref[...]
    )
    out_ref[...] = jnp.maximum(z, 0.0)


def _matmul_kernel(a_ref, h_ref, out_ref):
    out_ref[...] = jnp.dot(
        a_ref[...], h_ref[...].astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )


def _blocked_matmul(a: jax.Array, h: jax.Array, block_rows: int, interpret: bool):
    n_pad, n = a.shape
    f = h.shape[1]
    nb = n_pad // block_rows
    return pl.pallas_call(
        _matmul_kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((block_rows, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_rows, f), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, f), jnp.float32),
        interpret=interpret,
    )(a, h)


def pallas_dense_conv(op: DenseConvOperand, interpret: bool,
                      h, w, root, b):
    """Fused relu((A @ h) @ W + h @ root + b); see module docstring.

    ``op.a``/``op.a_t`` may be jit-traced arrays (they should enter jit as
    arguments — 50MB+ closure constants overflow remote-compile payloads),
    so they are differentiable-position custom_vjp args with discarded
    cotangents."""
    return _conv_prim(op.num_rows, interpret, op.a, op.a_t, h, w, root, b)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _conv_prim(num_rows, interpret, a, a_t, h, w, root, b):
    out, _ = _conv_fwd_impl(num_rows, interpret, a, h, w, root, b)
    return out


def _conv_fwd_impl(num_rows, interpret, a, h, w, root, b):
    n_pad, n = a.shape
    f = h.shape[1]
    hdim = w.shape[1]
    block_rows = 256 if n_pad % 256 == 0 else int(np.gcd(n_pad, 256))
    nb = n_pad // block_rows
    h_pad = jnp.zeros((n_pad, f), h.dtype).at[:n].set(h)
    out, agg = pl.pallas_call(
        _conv_kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((block_rows, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # full h
            pl.BlockSpec((block_rows, f), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # W
            pl.BlockSpec(memory_space=pltpu.VMEM),   # root
            pl.BlockSpec(memory_space=pltpu.VMEM),   # b
        ],
        out_specs=(
            pl.BlockSpec((block_rows, hdim), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, f), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_pad, hdim), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, f), jnp.float32),
        ),
        interpret=interpret,
    )(a, h, h_pad, w, root, b.reshape(1, -1))
    return out[:num_rows], agg[:num_rows]


def _conv_vjp_fwd(num_rows, interpret, a, a_t, h, w, root, b):
    out, agg = _conv_fwd_impl(num_rows, interpret, a, h, w, root, b)
    return out, (a, a_t, h, w, root, out, agg)


def _conv_vjp_bwd(num_rows, interpret, res, g):
    a, a_t, h, w, root, out, agg = res
    dz = jnp.where(out > 0.0, g, 0.0)                      # relu mask
    dW = agg.T @ dz
    db = jnp.sum(dz, axis=0)
    droot = h.T @ dz
    d_agg = dz @ w.T                                       # [N, F]
    n_pad = a.shape[0]
    block_rows = 256 if n_pad % 256 == 0 else int(np.gcd(n_pad, 256))
    dh = _blocked_matmul(a_t, d_agg, block_rows, interpret)
    dh = dh[:num_rows] + dz @ root.T
    # adjacency cotangents are never requested (graph structure is data,
    # not parameters); zeros are DCE'd by XLA
    return jnp.zeros_like(a), jnp.zeros_like(a_t), dh, dW, droot, db


_conv_prim.defvjp(_conv_vjp_fwd, _conv_vjp_bwd)
