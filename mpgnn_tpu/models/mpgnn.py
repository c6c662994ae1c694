"""Metapath GNN models.

``MultiMetapathGNN`` is the functional parity target of the reference's
``MPNetm`` (model.py:179-228): per metapath m, a stack of single-relation
RelConvs (hop j aggregates only relation metapaths[m][j]; first hop maps
input_dim -> hidden, later hops hidden -> hidden), ReLU + Dropout(0.6) after
every hop, per-metapath embeddings concatenated, then
fc1 -> ReLU -> fc2 -> log_softmax.

``RGCNNet`` is the plain RGCN baseline (``Net``, model.py:132-149 /
main_rgcn.py): conv1 applied once then conv2 repeated, each over ALL
relations, ReLU between layers, Linear head, log_softmax.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

from mpgnn_tpu.models.relconv import (
    RelConvParams,
    fast_rgcn_aggregate,
    glorot,
    init_relconv,
    init_relconv_basis,
    init_relconv_block,
    relconv_effective_weight,
    relconv_transform,
)
from mpgnn_tpu.ops.spmm import rel_mean_aggregate


class LinearParams(NamedTuple):
    w: jax.Array
    b: jax.Array


def init_linear(key: jax.Array, in_dim: int, out_dim: int) -> LinearParams:
    """torch.nn.Linear default init: U(-sqrt(1/fan_in), sqrt(1/fan_in))."""
    k1, k2 = jax.random.split(key)
    bound = 1.0 / jnp.sqrt(jnp.asarray(float(in_dim)))
    return LinearParams(
        w=jax.random.uniform(k1, (in_dim, out_dim), minval=-bound, maxval=bound),
        b=jax.random.uniform(k2, (out_dim,), minval=-bound, maxval=bound),
    )


class MPGNNParams(NamedTuple):
    convs: Tuple[Tuple[RelConvParams, ...], ...]  # [metapath][hop]
    fc1: LinearParams
    fc2: LinearParams


def init_mpgnn(
    key: jax.Array,
    input_dim: int,
    hidden_dim: int,
    num_classes: int,
    metapaths: Sequence[Sequence[int]],
    num_bases: int | None = None,
    num_blocks: int | None = None,
) -> MPGNNParams:
    """Parameter layout mirrors MPNetm.__init__ (model.py:186-201): one conv
    stack per metapath; fc1 maps hidden*len(metapaths) -> hidden.

    ``num_bases``/``num_blocks`` select CustomRGCNConv's basis / block-
    diagonal weight decompositions (mp_rgcn_layer.py:120-137) for every hop
    conv. Like the reference ctor's if/elif, ``num_bases`` takes precedence
    when both are set. Blocks require num_blocks | input_dim and hidden_dim
    (the reference asserts the same at mp_rgcn_layer.py:127-128)."""
    def make_conv(k, in_d, out_d):
        if num_bases is not None:
            return init_relconv_basis(k, in_d, out_d, num_bases)
        if num_blocks is not None:
            return init_relconv_block(k, in_d, out_d, num_blocks)
        return init_relconv(k, in_d, out_d)

    keys = jax.random.split(key, len(metapaths) + 2)
    convs = []
    for i, mp in enumerate(metapaths):
        hop_keys = jax.random.split(keys[i], max(len(mp), 1))
        stack = [make_conv(hop_keys[0], input_dim, hidden_dim)]
        for j in range(1, len(mp)):
            stack.append(make_conv(hop_keys[j], hidden_dim, hidden_dim))
        convs.append(tuple(stack))
    fc1 = init_linear(keys[-2], hidden_dim * len(metapaths), hidden_dim)
    fc2 = init_linear(keys[-1], hidden_dim, num_classes)
    return MPGNNParams(convs=tuple(convs), fc1=fc1, fc2=fc2)


def hop_aggregate(h: jax.Array, op: Tuple, num_nodes: int) -> jax.Array:
    """Apply one hop's relation-masked mean aggregation.

    ``op`` is a tagged tuple produced by train.loops.build_hop_arrays:
      ('segment', src, dst, mask[, inv_deg])  — sorted segment-mean
                                     (inv_deg: precomputed 1/deg removes
                                     the count scatter)
      ('ell', nbr, nbr_mask)       — padded neighbor-table gather
      ('ell2', out_nbr, out_w, in_nbr, in_w) — gather-only both directions
      ('dense', adj, adj_t)        — normalized adjacency GEMM (MXU path;
                                     transpose precomputed for the VJP)
      ('onehot', fwd, bwd)         — scatter-free block one-hot batched GEMM
    ('fused', operand, interp) is handled directly in mpgnn_forward (the
    Pallas kernel fuses the whole conv, not just aggregation). All backends
    compute the same mean (zero rows for edgeless sources)."""
    kind = op[0]
    if kind == "segment":
        if len(op) == 5:
            _, src, dst, mask, inv = op
            return rel_mean_aggregate(
                h, src, dst, num_nodes, mask, indices_are_sorted=True,
                inv_count=inv,
            )
        _, src, dst, mask = op
        return rel_mean_aggregate(
            h, src, dst, num_nodes, mask, indices_are_sorted=True
        )
    if kind == "ell":
        from mpgnn_tpu.ops.spmm import ell_mean_aggregate

        _, nbr, nbr_mask = op
        return ell_mean_aggregate(h, nbr, nbr_mask)
    if kind == "dense":
        from mpgnn_tpu.ops.spmm import dense_mean_aggregate

        _, adj, adj_t = op
        return dense_mean_aggregate(adj, adj_t, h)
    if kind == "ell2":
        from mpgnn_tpu.ops.spmm import Ell2Operand, ell2_mean_aggregate

        _, out_nbr, out_w, in_nbr, in_w = op
        return ell2_mean_aggregate(
            Ell2Operand(out_nbr, out_w, in_nbr, in_w), h
        )
    if kind == "pallas":
        from mpgnn_tpu.ops.pallas_spmm import pallas_spmm_mean

        _, fwd, bwd, interpret = op
        return pallas_spmm_mean(fwd, bwd, interpret, h)
    if kind == "csr":
        from mpgnn_tpu.ops.pallas_csr import csr_mean_aggregate

        _, fwd, bwd = op
        if h.dtype == jnp.bfloat16:
            # measured (bench_csr, v5e): bf16 edge rows (32 B) gather SLOWER
            # than f32 (158.8 vs 116.6 ms at 10M edges) — sub-burst-
            # granularity accesses; aggregate in f32, hand back bf16
            return csr_mean_aggregate(
                h.astype(jnp.float32), fwd, bwd
            ).astype(h.dtype)
        return csr_mean_aggregate(h, fwd, bwd)
    if kind == "onehot":
        from mpgnn_tpu.ops.pallas_spmm import onehot_spmm_mean

        _, fwd, bwd = op
        return onehot_spmm_mean(fwd, bwd, h)
    if kind == "halo":
        # node-sharded halo exchange: h must be the padded [P*S, F] array
        # sharded along the mesh axis (train.loops.shard_graph_features)
        from mpgnn_tpu.parallel.halo import (
            HaloPlan,
            halo_sharded_mean_aggregate,
        )

        (_, mesh, axis, block, exchange, round_sizes, csr_statics,
         e_src, e_slot, e_mask, s_idx, s_mask, *csr_arrays) = op
        plan = HaloPlan(
            num_shards=mesh.shape[axis], block=block,
            halo_max=s_idx.shape[2] if exchange == "a2a" else 0,
            edge_max=e_src.shape[1],
            edge_src_local=e_src, edge_dst_slot=e_slot, edge_mask=e_mask,
            send_idx=s_idx, send_mask=s_mask,
            exchange=exchange, round_sizes=round_sizes,
        )
        return halo_sharded_mean_aggregate(
            mesh, h, plan, axis,
            csr_statics=csr_statics,
            csr_arrays=tuple(csr_arrays) if csr_arrays else None,
        )
    raise ValueError(f"unknown hop op {kind!r}")


def precompute_first_hop(
    x: jax.Array,
    hop_ops: Sequence[Sequence[Tuple]],
    compute_dtype=None,
):
    """Per-metapath hop-0 aggregation of the input features.

    The first hop aggregates ``x``, which is constant for a whole training
    run (dropout is applied only AFTER each conv, model.py:210-214), so its
    aggregation is epoch-invariant. Computing it once outside the epoch
    ``lax.scan`` removes hop-0's adjacency read / gather+scatter from every
    epoch on every backend. Returns one array per metapath (None for the
    fused-conv backend, whose kernel owns its aggregation); feed the result
    to ``mpgnn_forward(first_hop_agg=...)``. Numerically identical to the
    uncached path."""
    dt = compute_dtype or x.dtype
    xd = x.astype(dt)
    out = []
    for ops in hop_ops:
        op = ops[0]
        if op[0] == "fused":
            out.append(None)
        else:
            out.append(hop_aggregate(xd, op, x.shape[0]))
    return out


def mpgnn_forward(
    params: MPGNNParams,
    x: jax.Array,
    hop_ops: Sequence[Sequence[Tuple]],   # [metapath][hop] tagged agg inputs
    *,
    dropout_rate: float = 0.6,
    dropout_rng: jax.Array | None = None,
    train: bool = False,
    compute_dtype=None,
    first_hop_agg=None,
) -> jax.Array:
    """Forward pass (parity: MPNetm.forward, model.py:203-228).

    Each (metapath, hop) carries its relation's aggregation operand (see
    ``hop_aggregate``). Dropout is applied after every hop's ReLU during
    training (model.py:210-214).

    ``compute_dtype=jnp.bfloat16`` runs activations and GEMM operands in
    bf16 (params remain f32 outside; the cast's VJP returns f32 grads) while
    the final log_softmax stays f32 for loss stability.

    ``first_hop_agg`` (from ``precompute_first_hop``) substitutes the cached
    epoch-invariant hop-0 aggregation; entries may be None to fall back."""
    dt = compute_dtype or x.dtype
    x = x.astype(dt)

    def cast(p):
        return p.astype(dt)

    num_nodes = x.shape[0]
    embeddings = []
    drop_i = 0
    for i, stack in enumerate(params.convs):
        h = x
        for j, conv in enumerate(stack):
            op = hop_ops[i][j]
            cached = (
                first_hop_agg[i]
                if j == 0 and first_hop_agg is not None
                else None
            )
            if cached is not None:
                h = jax.nn.relu(relconv_transform(conv, cached.astype(dt), h))
            elif op[0] == "fused":
                # fully fused conv kernel (aggregation + transform + relu);
                # decomposed convs feed it their materialized [in, out]
                # weight (numerically identical)
                from mpgnn_tpu.ops.pallas_conv import pallas_dense_conv

                _, operand, interp = op
                h = pallas_dense_conv(
                    operand, interp, h, relconv_effective_weight(conv),
                    conv.root, conv.bias,
                )
            else:
                agg = hop_aggregate(h, op, num_nodes)
                h = jax.nn.relu(relconv_transform(conv, agg, h))
            if train and dropout_rate > 0.0:
                key = jax.random.fold_in(dropout_rng, drop_i)
                keep = jax.random.bernoulli(key, 1.0 - dropout_rate, h.shape)
                h = jnp.where(keep, h / jnp.asarray(1.0 - dropout_rate, dt), 0.0)
            drop_i += 1
        embeddings.append(h)
    h = jnp.concatenate(embeddings, axis=1)
    h = jax.nn.relu(h @ cast(params.fc1.w) + cast(params.fc1.b))
    h = h @ cast(params.fc2.w) + cast(params.fc2.b)
    return jax.nn.log_softmax(h.astype(jnp.float32), axis=1)


# ----------------------------------------------------------- MPNet (2-conv)
class MetapathNetParams(NamedTuple):
    conv1: RelConvParams          # input_dim -> hidden
    conv2: RelConvParams          # hidden -> output, SHARED across hops >= 1
    linear: LinearParams


def init_metapath_net(
    key: jax.Array, input_dim: int, hidden_dim: int, output_dim: int,
    num_classes: int,
) -> MetapathNetParams:
    k1, k2, k3 = jax.random.split(key, 3)
    return MetapathNetParams(
        conv1=init_relconv(k1, input_dim, hidden_dim),
        conv2=init_relconv(k2, hidden_dim, output_dim),
        linear=init_linear(k3, output_dim, num_classes),
    )


def metapath_net_forward(
    params: MetapathNetParams,
    x: jax.Array,
    hop_ops: Sequence[Tuple],
) -> jax.Array:
    """Single-metapath MPNet (model.py:153-176): conv1 on the first hop,
    conv2 SHARED for every later hop, ReLU between layers, Linear head,
    raw logits (no softmax — model.py:174-176 returns h)."""
    num_nodes = x.shape[0]
    h = x
    for j, op in enumerate(hop_ops):
        conv = params.conv1 if j == 0 else params.conv2
        agg = hop_aggregate(h, op, num_nodes)
        h = jax.nn.relu(agg @ conv.weight + h @ conv.root + conv.bias)
    return h @ params.linear.w + params.linear.b


# --------------------------------------------------------------- RGCN baseline
class RGCNConvParams(NamedTuple):
    weight: jax.Array  # [R, in, out]
    root: jax.Array    # [in, out]
    bias: jax.Array    # [out]


class RGCNBasisConvParams(NamedTuple):
    """Basis-decomposed multi-relation conv (mp_rgcn_layer.py:120-123,
    202-204): W_r = sum_b comp[r, b] * bases[b], bases shared across
    relations."""

    comp: jax.Array    # [R, B]
    bases: jax.Array   # [B, in, out]
    root: jax.Array    # [in, out]
    bias: jax.Array    # [out]


class RGCNBlockConvParams(NamedTuple):
    """Block-diagonal multi-relation conv (mp_rgcn_layer.py:125-131,
    209-220): each relation weight is block-diagonal."""

    blocks: jax.Array  # [R, nb, in/nb, out/nb]
    root: jax.Array    # [in, out]
    bias: jax.Array    # [out]


class RGCNNetParams(NamedTuple):
    conv1: RGCNConvParams
    conv2: RGCNConvParams
    linear: LinearParams


def rgcn_effective_weights(conv) -> jax.Array:
    """Materialized per-relation [R, in, out] weights for any RGCN conv
    variant (basis mixture / block-diagonal embedding / plain)."""
    if isinstance(conv, RGCNConvParams):
        return conv.weight
    if isinstance(conv, RGCNBasisConvParams):
        from mpgnn_tpu.models.relconv import basis_weights

        return basis_weights(conv.comp, conv.bases)
    if isinstance(conv, RGCNBlockConvParams):
        r, nb, bin_, bout = conv.blocks.shape
        w = jnp.zeros((r, nb * bin_, nb * bout), conv.blocks.dtype)
        for b in range(nb):  # static tiny loop
            w = w.at[:, b * bin_:(b + 1) * bin_,
                     b * bout:(b + 1) * bout].set(conv.blocks[:, b])
        return w
    raise TypeError(f"unknown RGCN conv param type {type(conv)!r}")


def _init_rgcn_conv(
    key, in_dim, out_dim, num_rel, num_bases=None, num_blocks=None
):
    k1, k2, k3 = jax.random.split(key, 3)
    if num_bases is not None:
        return RGCNBasisConvParams(
            comp=glorot(k3, (num_rel, num_bases)),
            bases=glorot(k1, (num_bases, in_dim, out_dim)),
            root=glorot(k2, (in_dim, out_dim)),
            bias=jnp.zeros((out_dim,), jnp.float32),
        )
    if num_blocks is not None:
        if in_dim % num_blocks or out_dim % num_blocks:
            raise ValueError(
                f"num_blocks={num_blocks} must divide in_dim={in_dim} and "
                f"out_dim={out_dim}"
            )
        return RGCNBlockConvParams(
            blocks=glorot(
                k1,
                (num_rel, num_blocks, in_dim // num_blocks,
                 out_dim // num_blocks),
            ),
            root=glorot(k2, (in_dim, out_dim)),
            bias=jnp.zeros((out_dim,), jnp.float32),
        )
    return RGCNConvParams(
        weight=glorot(k1, (num_rel, in_dim, out_dim)),
        root=glorot(k2, (in_dim, out_dim)),
        bias=jnp.zeros((out_dim,), jnp.float32),
    )


def init_rgcn_net(
    key: jax.Array,
    input_dim: int,
    hidden_dim: int,
    num_rel: int,
    output_dim: int,
    num_classes: int,
    num_bases: int | None = None,
    num_blocks: int | None = None,
) -> RGCNNetParams:
    """``num_bases``/``num_blocks`` select the reference's weight
    decompositions for both conv layers (num_bases wins when both are set,
    mirroring the CustomRGCNConv ctor's if/elif)."""
    if num_bases is not None:
        num_blocks = None
    k1, k2, k3 = jax.random.split(key, 3)
    return RGCNNetParams(
        conv1=_init_rgcn_conv(k1, input_dim, hidden_dim, num_rel,
                              num_bases, num_blocks),
        conv2=_init_rgcn_conv(k2, hidden_dim, output_dim, num_rel,
                              num_bases, num_blocks),
        linear=init_linear(k3, output_dim, num_classes),
    )


def rgcn_net_forward(
    params: RGCNNetParams,
    x: jax.Array,
    src: jax.Array,
    dst: jax.Array,
    edge_type: jax.Array,
    metapath_length: int,
) -> jax.Array:
    """Plain RGCN applied metapath_length times (Net.forward,
    model.py:141-149): conv1 first, conv2 for the remaining layers."""
    num_nodes = x.shape[0]
    h = x
    for layer in range(metapath_length):
        p = params.conv1 if layer == 0 else params.conv2
        agg = fast_rgcn_aggregate(
            h, rgcn_effective_weights(p), src, dst, edge_type, num_nodes
        )
        h = jax.nn.relu(agg + h @ p.root + p.bias)
    h = h @ params.linear.w + params.linear.b
    return jax.nn.log_softmax(h, axis=1)
