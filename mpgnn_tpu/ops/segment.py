"""Segment reductions with masking — XLA building blocks.

These are the functional equivalents of ``torch_scatter.scatter`` (reduce =
sum / mean / max) used by the reference's message passing
(mp_rgcn_layer.py:277-279, 346-357). All shapes are static; padding edges are
neutralized via masks rather than dynamic slicing so everything jits.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def segment_sum(
    data: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    indices_are_sorted: bool = False,
) -> jax.Array:
    return jax.ops.segment_sum(
        data, segment_ids, num_segments=num_segments,
        indices_are_sorted=indices_are_sorted,
    )


def segment_mean(
    data: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    indices_are_sorted: bool = False,
) -> jax.Array:
    """Mean with empty segments mapping to 0 (PyG scatter-mean parity:
    sources with no edges of the selected relation produce a zero row,
    mp_rgcn_layer.py:198)."""
    total = segment_sum(data, segment_ids, num_segments, indices_are_sorted)
    ones = jnp.ones(data.shape[: segment_ids.ndim], dtype=data.dtype)
    count = segment_sum(ones, segment_ids, num_segments, indices_are_sorted)
    count = jnp.maximum(count, 1.0)
    return total / count.reshape(count.shape + (1,) * (total.ndim - count.ndim))


def masked_segment_mean(
    data: jax.Array,
    segment_ids: jax.Array,
    mask: jax.Array,
    num_segments: int,
    indices_are_sorted: bool = False,
) -> jax.Array:
    """Mean over valid (mask=True) entries only; empty segments -> 0.

    This is the padded-batch workhorse: a ``[R, E_max]`` relation batch runs
    under vmap with each row's padding masked out."""
    m = mask.astype(data.dtype)
    data = data * m.reshape(m.shape + (1,) * (data.ndim - m.ndim))
    total = segment_sum(data, segment_ids, num_segments, indices_are_sorted)
    # counts accumulate in f32 even when data is bf16 — bf16 integers are
    # exact only up to 256, below plausible max degrees
    count = segment_sum(
        mask.astype(jnp.float32), segment_ids, num_segments, indices_are_sorted
    )
    inv = (1.0 / jnp.maximum(count, 1.0)).astype(data.dtype)
    return total * inv.reshape(inv.shape + (1,) * (total.ndim - inv.ndim))


def segment_max(
    data: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    mask: Optional[jax.Array] = None,
    fill: float = 0.0,
) -> jax.Array:
    """Max per segment; empty segments -> ``fill``."""
    if mask is not None:
        neg = jnp.asarray(-jnp.inf, dtype=data.dtype)
        data = jnp.where(mask, data, neg)
    out = jax.ops.segment_max(data, segment_ids, num_segments=num_segments)
    return jnp.where(jnp.isneginf(out), jnp.asarray(fill, out.dtype), out)


def segment_argmax(
    data: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    mask: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """(max value, index of winning element) per segment.

    Tie-breaking follows FIRST occurrence in `data` order, matching
    ``torch.argmax`` over the reference's adjacency-list order
    (model.py:85). Returns index into ``data``; empty segments give value
    -inf and index 0."""
    n = data.shape[0]
    if mask is not None:
        data = jnp.where(mask, data, -jnp.inf)
    maxv = jax.ops.segment_max(data, segment_ids, num_segments=num_segments)
    is_max = data == maxv[segment_ids]
    if mask is not None:
        is_max = is_max & mask
    pos = jnp.arange(n, dtype=jnp.int32)
    cand = jnp.where(is_max, pos, n)
    first = jax.ops.segment_min(cand, segment_ids, num_segments=num_segments)
    first = jnp.where(first >= n, 0, first)
    return maxv, first


@partial(jax.jit, static_argnames=("num_segments",))
def segment_count(segment_ids: jax.Array, num_segments: int) -> jax.Array:
    return segment_sum(
        jnp.ones_like(segment_ids, dtype=jnp.float32), segment_ids, num_segments
    )
