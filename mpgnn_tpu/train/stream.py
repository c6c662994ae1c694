"""Out-of-core MPGNN training over a PartitionedHeteroGraph.

Cluster-GCN-style subgraph SGD (the reference has no analog — it replicates
the full graph per MPI rank and cannot exceed host memory): each step draws
a fixed group of node blocks, takes the padded induced subgraph, and runs a
normal full-graph MPGNN step on it. TPU mapping:

* subgraph node/edge buckets are pow2-padded, so the entire training run
  compiles O(#distinct buckets) step programs, not O(#groups);
* the step itself is the same jitted fwd+bwd+Adam program family as
  ``train_mpgnn`` (loss masked to the group's train nodes);
* only the sampled blocks' feature rows are gathered host-side per group —
  ``x`` may be an ``np.memmap``, so peak host memory is O(subgraph), not
  O(graph).

Predictions for the final metrics are assembled per group (every node
appears in exactly one group), so evaluation is also O(subgraph) memory.
Cut edges between groups are dropped — the standard Cluster-GCN
approximation; raise ``blocks_per_step`` to shrink it
(``PartitionedHeteroGraph.edge_cut_fraction``).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mpgnn_tpu.config import MPGNNConfig
from mpgnn_tpu.graph.hetero import NodeSplit
from mpgnn_tpu.graph.partition import PartitionedHeteroGraph, Subgraph
from mpgnn_tpu.models.mpgnn import init_mpgnn, mpgnn_forward
from mpgnn_tpu.train.loops import (
    MPGNNTrainResult,
    build_hop_arrays,
    make_optimizer,
    retag_hop_ops,
    split_hop_ops,
)
from mpgnn_tpu.train.metrics import macro_f1_np


def _group_blocks(
    num_parts: int, blocks_per_step: int, rng: np.random.Generator
) -> List[List[int]]:
    order = rng.permutation(num_parts)
    q = max(1, blocks_per_step)
    return [sorted(order[i : i + q].tolist()) for i in range(0, num_parts, q)]


def train_mpgnn_clustered(
    pgraph: PartitionedHeteroGraph,
    metapaths: Sequence[Sequence[int]],
    split: NodeSplit,
    num_classes: int,
    cfg: Optional[MPGNNConfig] = None,
    blocks_per_step: int = 2,
    seed: int = 0,
    backend: str = "segment",
    halo_hops: Optional[int] = None,
) -> MPGNNTrainResult:
    """Train an MPGNN with subgraph SGD; evaluate group-wise.

    Hyperparameters follow ``train_mpgnn`` (Adam 0.01 / wd 5e-4 / NLL /
    dropout 0.6 — main.py:1117-1134 semantics); ``cfg.epochs`` epochs, each
    visiting every block group once in random order.

    ``halo_hops`` defaults to the longest metapath: every core node's
    receptive field is complete, so gradients and predictions are EXACT and
    the only approximation left is the mini-batch noise itself. Pass 0 for
    the pure Cluster-GCN cut-edge regime (smaller subgraphs, some signal
    loss)."""
    cfg = cfg or MPGNNConfig()
    metapaths = [list(mp) for mp in metapaths]
    if halo_hops is None:
        halo_hops = max((len(mp) for mp in metapaths), default=0)
    rng = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed)
    init_key, drop_key = jax.random.split(key)

    params = init_mpgnn(
        init_key, pgraph.feat_dim, cfg.hidden_dim, num_classes, metapaths
    )
    tx = make_optimizer(cfg)
    opt_state = tx.init(params)
    compute_dtype = (
        jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    )

    # global label / split-membership vectors (host)
    y_full = np.zeros(pgraph.num_nodes, dtype=np.int32)
    in_train = np.zeros(pgraph.num_nodes, dtype=bool)
    y_full[np.asarray(split.train_idx)] = np.asarray(split.train_y)
    in_train[np.asarray(split.train_idx)] = True
    y_full[np.asarray(split.val_idx)] = np.asarray(split.val_y)
    y_full[np.asarray(split.test_idx)] = np.asarray(split.test_y)

    @jax.jit
    def step(params, opt_state, x, hop_data, tmask, y, rng_step):
        def loss_fn(p):
            ops = retag_hop_ops(step_kinds[0], hop_data)
            out = mpgnn_forward(
                p, x, ops, dropout_rate=cfg.dropout, dropout_rng=rng_step,
                train=True, compute_dtype=compute_dtype,
            )
            per = -jnp.take_along_axis(out, y[:, None], axis=1)[:, 0]
            w = tmask.astype(jnp.float32)
            return jnp.sum(per * w) / jnp.maximum(jnp.sum(w), 1.0)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def predict(params, x, hop_data):
        ops = retag_hop_ops(step_kinds[0], hop_data)
        out = mpgnn_forward(
            params, x, ops, train=False, compute_dtype=compute_dtype
        )
        return jnp.argmax(out, axis=1)

    # step_kinds is a one-slot mutable closure: hop kinds are identical for
    # every subgraph with the 'segment'/'ell' backends (tags only), so the
    # jit caches key purely on array shapes (pow2 buckets).
    step_kinds = [None]

    def sub_arrays(sub: Subgraph):
        hop_ops = build_hop_arrays(sub.graph, metapaths, backend=backend)
        kinds, data = split_hop_ops(hop_ops)
        step_kinds[0] = kinds
        tmask = in_train[sub.nodes] & sub.core_mask
        y = y_full[sub.nodes]
        return (
            jnp.asarray(sub.graph.x), data,
            jnp.asarray(tmask), jnp.asarray(y.astype(np.int32)),
        )

    # fixed grouping (drawn once) -> the subgraph cache and the compiled
    # step set stay small; epoch order is reshuffled every epoch
    groups = _group_blocks(pgraph.num_parts, blocks_per_step, rng)
    prepared = []
    for g in groups:
        sub = pgraph.subgraph(g, halo_hops=halo_hops)
        prepared.append((sub, sub_arrays(sub)))

    last_loss = 0.0
    it = 0
    for _epoch in range(cfg.epochs):
        for gi in rng.permutation(len(prepared)):
            sub, (x, data, tmask, y) = prepared[gi]
            params, opt_state, loss = step(
                params, opt_state, x, data, tmask, y,
                jax.random.fold_in(drop_key, it),
            )
            it += 1
        last_loss = float(loss)

    # ---------------------------------------------------- group-wise eval
    preds = np.zeros(pgraph.num_nodes, dtype=np.int64)
    for sub, (x, data, _tmask, _y) in prepared:
        p = np.asarray(predict(params, x, data))
        core = sub.core_mask          # every node is core in exactly 1 group
        preds[sub.nodes[core]] = p[core]

    def f1(idx, y):
        idx = np.asarray(idx)
        return float(macro_f1_np(preds[idx], np.asarray(y), num_classes))

    return MPGNNTrainResult(
        params=params,
        val_f1=f1(split.val_idx, split.val_y),
        test_f1=f1(split.test_idx, split.test_y),
        train_f1=f1(split.train_idx, split.train_y),
        final_loss=last_loss,
    )
