"""Batched candidate-metapath evaluation — vmap over candidates.

The reference evaluates each discovered metapath by training a separate
MPNetm for 1000 epochs, fanning candidates out over MPI ranks
(main.py:1444-1459). Here candidates of equal length become a leading vmap
axis: parameters [C, ...], per-hop edge arrays [C, L, E_max], one jitted
scan trains EVERY candidate simultaneously — the TPU analog of the process
pool, with the batch axis keeping the MXU fed.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mpgnn_tpu.config import MPGNNConfig
from mpgnn_tpu.graph.hetero import HeteroGraph, NodeSplit
from mpgnn_tpu.models.mpgnn import init_mpgnn
from mpgnn_tpu.train.loops import make_optimizer
from mpgnn_tpu.train.metrics import macro_f1


def _stack_hop_edges(graph: HeteroGraph, paths: List[List[int]], pad: int = 128):
    """[C, L, E_max] padded src/dst/mask for same-length candidate paths."""
    C, L = len(paths), len(paths[0])
    e_max = max(int(graph.rel_counts[r]) for p in paths for r in p)
    e_max = max(pad, -(-e_max // pad) * pad)
    src = np.full((C, L, e_max), graph.num_nodes - 1, dtype=np.int32)
    dst = np.zeros((C, L, e_max), dtype=np.int32)
    mask = np.zeros((C, L, e_max), dtype=bool)
    for c, p in enumerate(paths):
        for j, r in enumerate(p):
            s, d = graph.rel_edges_csr(int(r))
            n = len(s)
            src[c, j, :n], dst[c, j, :n], mask[c, j, :n] = s, d, True
    return jnp.asarray(src), jnp.asarray(dst), jnp.asarray(mask)


def evaluate_candidates(
    graph: HeteroGraph,
    paths: Sequence[Sequence[int]],
    split: NodeSplit,
    num_classes: int,
    cfg: Optional[MPGNNConfig] = None,
    seed: int = 0,
    x_override: Optional[np.ndarray] = None,
) -> Dict[str, float]:
    """Train one single-metapath MPGNN per candidate, ALL candidates at once
    (grouped by length), returning {str(path): last-epoch val macro-F1} —
    the quantity mpgnn_parallel_multiple returns (main.py:1117-1134)."""
    cfg = cfg or MPGNNConfig()
    paths = [list(p) for p in paths]
    x = jnp.asarray(x_override if x_override is not None else graph.x)
    train_idx = jnp.asarray(split.train_idx)
    train_y = jnp.asarray(split.train_y)
    val_idx = jnp.asarray(split.val_idx)
    val_y = jnp.asarray(split.val_y)

    by_len: Dict[int, List[List[int]]] = {}
    for p in paths:
        by_len.setdefault(len(p), []).append(p)

    out: Dict[str, float] = {}
    for L, group in sorted(by_len.items()):
        src, dst, mask = _stack_hop_edges(graph, group)
        C = len(group)
        keys = jax.random.split(jax.random.PRNGKey(seed), C)

        def init_one(key):
            return init_mpgnn(key, graph.feat_dim, cfg.hidden_dim,
                              num_classes, [[0] * L])

        params0 = jax.vmap(init_one)(keys)
        tx = make_optimizer(cfg)

        def forward(p, src_c, dst_c, mask_c, rng, train):
            h = x
            for j in range(L):
                conv = p.convs[0][j]
                m = mask_c[j].astype(h.dtype)
                contrib = h[dst_c[j]] * m[:, None]
                tot = jax.ops.segment_sum(
                    contrib, src_c[j], num_segments=graph.num_nodes,
                    indices_are_sorted=True,
                )
                cnt = jax.ops.segment_sum(
                    m, src_c[j], num_segments=graph.num_nodes,
                    indices_are_sorted=True,
                )
                agg = tot / jnp.maximum(cnt, 1.0)[:, None]
                h = jax.nn.relu(agg @ conv.weight + h @ conv.root + conv.bias)
                if train and cfg.dropout > 0:
                    k = jax.random.fold_in(rng, j)
                    keep = jax.random.bernoulli(k, 1 - cfg.dropout, h.shape)
                    h = jnp.where(keep, h / (1 - cfg.dropout), 0.0)
            h = jax.nn.relu(h @ p.fc1.w + p.fc1.b)
            h = h @ p.fc2.w + p.fc2.b
            return jax.nn.log_softmax(h, axis=1)

        def train_one(p0, src_c, dst_c, mask_c, drop_key):
            def loss_fn(p, rng):
                logp = forward(p, src_c, dst_c, mask_c, rng, True)[train_idx]
                return -jnp.mean(
                    jnp.take_along_axis(logp, train_y[:, None], axis=1)
                )

            def epoch(carry, e):
                p, st = carry
                rng = jax.random.fold_in(drop_key, e)
                loss, g = jax.value_and_grad(loss_fn)(p, rng)
                upd, st = tx.update(g, st, p)
                p = optax.apply_updates(p, upd)
                return (p, st), loss

            (p, _), _ = jax.lax.scan(
                epoch, (p0, tx.init(p0)), jnp.arange(cfg.epochs)
            )
            outp = forward(p, src_c, dst_c, mask_c, drop_key, False)
            preds = jnp.argmax(outp, axis=1)
            return macro_f1(preds[val_idx], val_y, num_classes)

        drop_keys = jax.vmap(jax.random.fold_in, (None, 0))(
            jax.random.PRNGKey(seed + 1), jnp.arange(C)
        )
        val_f1 = jax.jit(jax.vmap(train_one))(
            params0, src, dst, mask, drop_keys
        )
        for p, f in zip(group, np.asarray(val_f1)):
            out[str(p)] = float(f)
    return out
