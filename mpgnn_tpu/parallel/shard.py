"""Sharded compute paths: edge-partitioned aggregation and the multi-chip
MPGNN training step.

Design (SURVEY §5 long-context analog, BASELINE north star): the graph's
edge lists are partitioned across the 'data' mesh axis; each device computes
a local masked segment-sum into full-width [N, F] partials; a single
``psum`` over ICI merges partial sums and degree counts before the mean
normalization. The GEMM side (conv weight / root / MLP head) is sharded over
the 'model' axis so hidden dimensions scale with chips. XLA/GSPMD inserts
the all-gathers/reduce-scatters; no hand-written NCCL/MPI analog exists or
is needed.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mpgnn_tpu.config import MPGNNConfig
from mpgnn_tpu.graph.hetero import HeteroGraph, NodeSplit
from mpgnn_tpu.models.mpgnn import MPGNNParams, init_mpgnn
from mpgnn_tpu.train.loops import make_optimizer


# ----------------------------------------------- explicit shard_map version
def edge_partitioned_aggregate(
    mesh: Mesh,
    x: jax.Array,
    src: jax.Array,
    dst: jax.Array,
    mask: jax.Array,
    num_nodes: int,
    axis: str = "data",
) -> jax.Array:
    """Mean aggregation with edges sharded across ``axis``.

    Each device reduces its local edge shard into full [N, F] partial sums,
    then one psum over ICI merges sums and counts (the halo-free
    "partial-aggregate + all-reduce" scheme — communication volume is
    O(N*F) per device independent of edge count)."""
    shard_map = jax.shard_map

    def local(x_full, src_l, dst_l, mask_l):
        m = mask_l.astype(x_full.dtype)
        contrib = x_full[dst_l] * m[:, None]
        total = jax.ops.segment_sum(contrib, src_l, num_segments=num_nodes)
        count = jax.ops.segment_sum(m, src_l, num_segments=num_nodes)
        total = jax.lax.psum(total, axis)
        count = jax.lax.psum(count, axis)
        return total / jnp.maximum(count, 1.0)[:, None]

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis)),
        out_specs=P(),
    )(x, src, dst, mask)


def shard_edges(
    arr: np.ndarray, mesh: Mesh, axis: str = "data"
) -> Tuple[np.ndarray, int]:
    """Pad an edge array so its length divides the axis size."""
    n_shards = mesh.shape[axis]
    E = arr.shape[0]
    pad = (-E) % n_shards
    if pad:
        arr = np.concatenate([arr, np.zeros((pad,) + arr.shape[1:], arr.dtype)])
    return arr, pad


# --------------------------------------------------- sharded training step
def build_sharded_train_step(
    mesh: Mesh,
    graph: HeteroGraph,
    metapaths: Sequence[Sequence[int]],
    split: NodeSplit,
    num_classes: int,
    cfg: Optional[MPGNNConfig] = None,
    seed: int = 0,
    init_params=None,
    init_opt_state=None,
):
    """One full multi-chip MPGNN training step, jit-compiled over the mesh.

    ``init_params`` / ``init_opt_state`` (host pytrees, e.g. from an elastic
    checkpoint) override the fresh initialization — they are placed onto
    THIS mesh's shardings, which is what makes resuming on a different
    device count work (parallel/elastic.py).

    Shardings:
      * per-hop edge arrays   -> P('data')   (edge partitioning)
      * conv weight/root out  -> P(None, 'model') (tensor parallel hidden)
      * fc1 in-dim            -> P('model', None)
      * x, indices, fc2       -> replicated

    Aggregation uses the explicit shard_map psum path; the GEMMs rely on
    GSPMD to place collectives. Returns (step_fn, params, opt_state,
    device_args) where ``step_fn(params, opt_state, rng) -> (params,
    opt_state, loss)``."""
    cfg = cfg or MPGNNConfig()
    metapaths = [list(m) for m in metapaths]
    num_nodes = graph.num_nodes

    repl = NamedSharding(mesh, P())
    edge_sh = NamedSharding(mesh, P("data"))

    # hop arrays, padded to divide the data axis
    hop_src: List[List[jax.Array]] = []
    hop_dst: List[List[jax.Array]] = []
    hop_mask: List[List[jax.Array]] = []
    for mp in metapaths:
        ss, dd, mm = [], [], []
        for rel in mp:
            s, d = graph.rel_edges(int(rel))
            m = np.ones(len(s), dtype=bool)
            s, _ = shard_edges(s.astype(np.int32), mesh)
            d, _ = shard_edges(d.astype(np.int32), mesh)
            m, _ = shard_edges(m, mesh)
            ss.append(jax.device_put(s, edge_sh))
            dd.append(jax.device_put(d, edge_sh))
            mm.append(jax.device_put(m, edge_sh))
        hop_src.append(ss)
        hop_dst.append(dd)
        hop_mask.append(mm)

    x = jax.device_put(jnp.asarray(graph.x), repl)
    train_idx = jax.device_put(jnp.asarray(split.train_idx), repl)
    train_y = jax.device_put(jnp.asarray(split.train_y), repl)

    if init_params is not None:
        params = jax.tree_util.tree_map(jnp.asarray, init_params)
    else:
        params = init_mpgnn(
            jax.random.PRNGKey(seed), graph.feat_dim, cfg.hidden_dim,
            num_classes, metapaths,
        )

    def param_sharding(p: MPGNNParams) -> MPGNNParams:
        def conv_sh(c):
            return type(c)(
                weight=NamedSharding(mesh, P(None, "model")),
                root=NamedSharding(mesh, P(None, "model")),
                bias=NamedSharding(mesh, P("model")),
            )
        convs = tuple(tuple(conv_sh(c) for c in stack) for stack in p.convs)
        fc1 = type(p.fc1)(
            w=NamedSharding(mesh, P("model", None)), b=repl
        )
        fc2 = type(p.fc2)(w=repl, b=repl)
        return MPGNNParams(convs=convs, fc1=fc1, fc2=fc2)

    p_sh = param_sharding(params)
    params = jax.tree_util.tree_map(
        lambda a, s: jax.device_put(a, s), params, p_sh,
        is_leaf=lambda a: isinstance(a, jnp.ndarray),
    )
    tx = make_optimizer(cfg)
    opt_state = tx.init(params)      # sharded via params' placements
    if init_opt_state is not None:
        # restore values; re-place only mesh-sharded leaves (eager tx.init
        # leaves like Adam's scalar `count` are uncommitted on the default
        # device — committing those to one device would conflict with the
        # mesh under jit)
        def _restore(fresh, saved):
            if hasattr(fresh, "sharding") and isinstance(
                fresh.sharding, NamedSharding
            ):
                return jax.device_put(jnp.asarray(saved), fresh.sharding)
            return jnp.asarray(saved)

        opt_state = jax.tree_util.tree_map(_restore, opt_state, init_opt_state)

    def forward(p: MPGNNParams, rng, train: bool):
        embeddings = []
        drop_i = 0
        for i, stack in enumerate(p.convs):
            h = x
            for j, conv in enumerate(stack):
                agg = edge_partitioned_aggregate(
                    mesh, h, hop_src[i][j], hop_dst[i][j], hop_mask[i][j],
                    num_nodes,
                )
                h = jax.nn.relu(agg @ conv.weight + h @ conv.root + conv.bias)
                if train and cfg.dropout > 0:
                    key = jax.random.fold_in(rng, drop_i)
                    keep = jax.random.bernoulli(key, 1 - cfg.dropout, h.shape)
                    h = jnp.where(keep, h / (1 - cfg.dropout), 0.0)
                drop_i += 1
            embeddings.append(h)
        h = jnp.concatenate(embeddings, axis=1)
        h = jax.nn.relu(h @ p.fc1.w + p.fc1.b)
        h = h @ p.fc2.w + p.fc2.b
        return jax.nn.log_softmax(h, axis=1)

    def loss_fn(p, rng):
        logp = forward(p, rng, True)[train_idx]
        return -jnp.mean(jnp.take_along_axis(logp, train_y[:, None], axis=1))

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step_fn(p, opt_st, rng):
        loss, grads = jax.value_and_grad(loss_fn)(p, rng)
        updates, opt_st = tx.update(grads, opt_st, p)
        p = optax.apply_updates(p, updates)
        return p, opt_st, loss

    return step_fn, params, opt_state


# ------------------------------------------ sharded relation sweep (hop 0)
def sharded_flat_sweep_args(mesh: Mesh, *arrays, axis: str = "rel"):
    """Place relation-sweep batch arrays with the leading (relation) axis
    sharded across the mesh — the TPU-native version of the reference's
    np.array_split over MPI ranks (main.py:1319). The sweep itself
    (search.scoring._flat_sweep) is already vmapped over that axis; jit +
    GSPMD then runs each device's relation shard locally with no
    communication (the sweep is embarrassingly parallel, like the
    reference's fan-out)."""
    sh = NamedSharding(mesh, P(axis))
    pad_to = mesh.shape[axis]
    out = []
    for a in arrays:
        a = np.asarray(a)
        R = a.shape[0]
        pad = (-R) % pad_to
        if pad:
            a = np.concatenate([a, np.repeat(a[-1:], pad, axis=0)])
        out.append(jax.device_put(a, sh))
    return out
