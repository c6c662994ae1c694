"""RelConv — the single-relation RGCN convolution.

Functional parity target: reference ``CustomRGCNConv``
(mp_rgcn_layer.py:40-283) with its modified forward that aggregates over
exactly ONE relation per call (mp_rgcn_layer.py:231-246):

    out = mean_aggregate_r(x) @ weight + x @ root + bias

* mean aggregation into the *source* column (flow='target_to_source',
  model.py:137-192), zero rows for edgeless sources (mp_rgcn_layer.py:198)
* glorot(weight), glorot(root), zeros(bias) init (mp_rgcn_layer.py:151-155)
* the reference's stray ``out.squeeze()`` (mp_rgcn_layer.py:246) is NOT
  replicated — it only bites degenerate N=1/out=1 shapes.

Also provides the all-relations-at-once ``fast_rgcn_aggregate`` (parity:
``CustomFastRGCNConv``, mp_rgcn_layer.py:287-357): per-edge typed transform
+ typed-degree-normalized scatter, realized TPU-style as relation-batched
GEMM over edges sorted by type.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from mpgnn_tpu.ops.segment import segment_sum


class RelConvParams(NamedTuple):
    weight: jax.Array  # [in, out]
    root: jax.Array    # [in, out]
    bias: jax.Array    # [out]


def glorot(key: jax.Array, shape, dtype=jnp.float32) -> jax.Array:
    """PyG glorot: U(-s, s), s = sqrt(6 / (fan_in + fan_out))."""
    s = jnp.sqrt(6.0 / (shape[-2] + shape[-1]))
    return jax.random.uniform(key, shape, dtype, minval=-s, maxval=s)


def init_relconv(key: jax.Array, in_dim: int, out_dim: int) -> RelConvParams:
    k1, k2 = jax.random.split(key)
    return RelConvParams(
        weight=glorot(k1, (in_dim, out_dim)),
        root=glorot(k2, (in_dim, out_dim)),
        bias=jnp.zeros((out_dim,), jnp.float32),
    )


def relconv_apply(
    params: RelConvParams, x: jax.Array, aggregated: jax.Array
) -> jax.Array:
    """Apply the conv given the already-aggregated neighbor mean.

    ``aggregated`` is produced by one of the ops backends (segment/ell/dense)
    for the layer's relation. Split from aggregation so the same params work
    under any backend and under vmap over candidates."""
    out = aggregated @ params.weight
    out = out + x @ params.root
    return out + params.bias


def basis_weights(comp: jax.Array, bases: jax.Array) -> jax.Array:
    """Basis-decomposition weights (mp_rgcn_layer.py:120-123, 202-204):
    W_r = sum_b comp[r, b] * basis_b. comp [R, B], bases [B, in, out] ->
    [R, in, out]."""
    return jnp.einsum(
        "rb,bio->rio", comp, bases, preferred_element_type=jnp.float32
    )


def block_diag_apply(
    aggregated: jax.Array, block_weight: jax.Array
) -> jax.Array:
    """Block-diagonal-decomposition transform (mp_rgcn_layer.py:125-131,
    209-220): block_weight [num_blocks, in/num_blocks, out/num_blocks];
    the aggregated features are reshaped into blocks and each block gets its
    own small GEMM (einsum 'abc,bcd->abd' at :219)."""
    nb, bin_, bout = block_weight.shape
    h = aggregated.reshape(-1, nb, bin_)
    out = jnp.einsum(
        "abc,bcd->abd", h.astype(block_weight.dtype), block_weight,
        preferred_element_type=jnp.float32,
    ).astype(aggregated.dtype)
    return out.reshape(-1, nb * bout)


# --------------------------------------------- decomposed single-relation conv
class RelConvBasisParams(NamedTuple):
    """Basis-decomposed RelConv (mp_rgcn_layer.py:120-123): the relation
    weight is a learned mixture of shared bases. A search conv has
    num_relations=1, so ``comp`` is the one relation's coefficient row."""

    comp: jax.Array    # [B] mixture coefficients for this conv's relation
    bases: jax.Array   # [B, in, out]
    root: jax.Array    # [in, out]
    bias: jax.Array    # [out]


class RelConvBlockParams(NamedTuple):
    """Block-diagonal RelConv (mp_rgcn_layer.py:125-131): the relation
    weight is block-diagonal; in/out dims must divide num_blocks."""

    blocks: jax.Array  # [num_blocks, in/nb, out/nb]
    root: jax.Array    # [in, out]
    bias: jax.Array    # [out]


def init_relconv_basis(
    key: jax.Array, in_dim: int, out_dim: int, num_bases: int,
    num_relations: int = 1,
) -> RelConvBasisParams:
    """Init parity with CustomRGCNConv(num_bases=...) reset_parameters
    (mp_rgcn_layer.py:151-155): glorot over the [B, in, out] basis stack,
    glorot over the [R, B] comp matrix (fan R+B — R=1 for search convs),
    glorot(root), zeros(bias)."""
    k1, k2, k3 = jax.random.split(key, 3)
    comp = glorot(k2, (num_relations, num_bases))[0]
    return RelConvBasisParams(
        comp=comp,
        bases=glorot(k1, (num_bases, in_dim, out_dim)),
        root=glorot(k3, (in_dim, out_dim)),
        bias=jnp.zeros((out_dim,), jnp.float32),
    )


def init_relconv_block(
    key: jax.Array, in_dim: int, out_dim: int, num_blocks: int
) -> RelConvBlockParams:
    """Init parity with CustomRGCNConv(num_blocks=...) (mp_rgcn_layer.py:
    125-131): weight [R=1, nb, in/nb, out/nb] glorot (fan over the last two
    dims), glorot(root), zeros(bias)."""
    if in_dim % num_blocks or out_dim % num_blocks:
        raise ValueError(
            f"num_blocks={num_blocks} must divide both in_dim={in_dim} and "
            f"out_dim={out_dim} (mp_rgcn_layer.py:127-128 asserts the same)"
        )
    k1, k2 = jax.random.split(key)
    return RelConvBlockParams(
        blocks=glorot(
            k1, (num_blocks, in_dim // num_blocks, out_dim // num_blocks)
        ),
        root=glorot(k2, (in_dim, out_dim)),
        bias=jnp.zeros((out_dim,), jnp.float32),
    )


def relconv_effective_weight(conv) -> jax.Array:
    """The conv's materialized [in, out] relation weight (any param type).

    For the plain conv this is ``weight`` itself; basis mixes the bases;
    block embeds the blocks on the diagonal of a dense [in, out] matrix.
    Used where a backend needs a single dense weight (e.g. the fused Pallas
    conv kernel); numerically identical to the decomposed apply."""
    if isinstance(conv, RelConvParams):
        return conv.weight
    if isinstance(conv, RelConvBasisParams):
        return jnp.einsum(
            "b,bio->io", conv.comp, conv.bases,
            preferred_element_type=jnp.float32,
        )
    if isinstance(conv, RelConvBlockParams):
        nb, bin_, bout = conv.blocks.shape
        w = jnp.zeros((nb * bin_, nb * bout), conv.blocks.dtype)
        for b in range(nb):  # static tiny loop (nb is a Python int)
            w = w.at[b * bin_:(b + 1) * bin_, b * bout:(b + 1) * bout].set(
                conv.blocks[b]
            )
        return w
    raise TypeError(f"unknown conv param type {type(conv)!r}")


def relconv_transform(conv, aggregated: jax.Array, h: jax.Array) -> jax.Array:
    """Pre-activation conv output for any RelConv param variant:

        aggregated @ W_r  +  h @ root  +  bias

    where W_r is the plain weight, the basis mixture (materialized — one
    [in, out] einsum, negligible next to the [N, in] GEMM), or the
    block-diagonal transform (applied blockwise per mp_rgcn_layer.py:219,
    which is cheaper than materializing the dense equivalent)."""
    dt = h.dtype
    if isinstance(conv, RelConvParams):
        out = aggregated @ conv.weight.astype(dt)
    elif isinstance(conv, RelConvBasisParams):
        w = relconv_effective_weight(conv).astype(dt)
        out = aggregated @ w
    elif isinstance(conv, RelConvBlockParams):
        out = block_diag_apply(aggregated, conv.blocks)
    else:
        raise TypeError(f"unknown conv param type {type(conv)!r}")
    return out + h @ conv.root.astype(dt) + conv.bias.astype(dt)


def fast_rgcn_aggregate(
    x: jax.Array,
    weights: jax.Array,      # [R, in, out] per-relation transforms
    src: jax.Array,          # [E] aggregation targets (source column)
    dst: jax.Array,          # [E] message origins (destination column)
    edge_type: jax.Array,    # [E]
    num_nodes: int,
    mask: Optional[jax.Array] = None,
) -> jax.Array:
    """All-relations RGCN message pass (CustomFastRGCNConv parity).

    Computes sum_r mean_{(i,r,d)} x[d] @ W_r into row i, with the typed-degree
    normalization of mp_rgcn_layer.py:346-357 (per-(node, relation) counts,
    clamped to >= 1). Per-edge transform is a batched GEMM over gathered
    features — edges should be pre-sorted by type so XLA tiles the gather of
    ``weights[edge_type]`` efficiently."""
    if mask is None:
        mask = jnp.ones_like(src, dtype=bool)
    msgs = jnp.einsum(
        "ef,efo->eo", x[dst], weights[edge_type],
        preferred_element_type=jnp.float32,
    )
    # typed-degree normalization: count edges per (target, type)
    num_rel = weights.shape[0]
    combo = src * num_rel + edge_type
    counts = segment_sum(
        mask.astype(x.dtype), combo, num_nodes * num_rel
    )
    norm = 1.0 / jnp.maximum(counts[combo], 1.0)
    msgs = msgs * (norm * mask.astype(x.dtype))[:, None]
    return segment_sum(msgs, src, num_nodes)
