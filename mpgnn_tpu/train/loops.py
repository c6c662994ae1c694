"""Jitted MPGNN training — whole runs as single device programs.

Parity target: the reference's metapath-evaluation harness
(mpgnn_parallel_multiple / mpgnn_parallel_multiple_x, main.py:1117-1160):
1000 epochs of full-graph Adam(lr=0.01, weight_decay=5e-4) NLL training of an
MPNetm, returning the last-epoch validation macro-F1 (and test macro-F1 when
testing). Note: the reference's "best model" bookkeeping aliases the live
model object (main.py:1124-1126 — ``best_model = mpgnn_model`` binds the same
nn.Module), so its final metrics ARE the last-epoch model's; we reproduce
that (track_best=False) and offer true best-epoch tracking as an opt-in.

The per-epoch loop is a lax.scan: no host round trips, one compiled program
per (shape-signature) candidate metapath.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mpgnn_tpu.config import MPGNNConfig
from mpgnn_tpu.graph.hetero import HeteroGraph, NodeSplit
from mpgnn_tpu.models.mpgnn import (
    MPGNNParams,
    init_mpgnn,
    mpgnn_forward,
    precompute_first_hop,
)
from mpgnn_tpu.ops.spmm import dense_adjacency
from mpgnn_tpu.train.metrics import macro_f1


def _round_up(n: int, m: int = 128) -> int:
    return max(m, -(-n // m) * m)


# Fallback 'auto' dense budget when the device does not report memory stats
# (e.g. the CPU backend): conservative for a 16 GiB v5e.
AUTO_DENSE_BUDGET_BYTES = 4 << 30
# Fraction of the device's FREE HBM 'auto' lets the dense (A, A^T) pairs
# occupy — the rest stays for activations, params, optimizer state and the
# vmapped eval batches.
AUTO_DENSE_FREE_FRACTION = 0.4
# 'auto' edge-count cutover from the segment (XLA scatter) path to the
# Pallas sorted-CSR kernel, for single-model training here and the batched
# final eval (batch_eval.resolve_eval_backend): measured crossover on v5e —
# the scatter collapses to 0.8 GB/s around 10M edges while csr holds, and
# below ~1M edges/relation the blocking build isn't worth the host time.
CSR_EDGE_CUTOVER = 1_000_000


def auto_dense_budget_bytes(device=None) -> int:
    """Dense-backend byte budget derived from the device's ACTUAL free HBM.

    Uses ``device.memory_stats()`` (PJRT: bytes_limit / bytes_in_use) when
    the backend reports it; otherwise the conservative static fallback. The
    round-1 hard-coded 4 GiB both starved big-HBM chips and oversubscribed
    busy ones."""
    try:
        dev = device or jax.devices()[0]
        stats = dev.memory_stats()
        if stats:
            limit = stats.get("bytes_limit") or stats.get(
                "bytes_reservable_limit"
            )
            used = stats.get("bytes_in_use", 0)
            if limit:
                return int((int(limit) - int(used)) * AUTO_DENSE_FREE_FRACTION)
    except Exception:
        pass
    return AUTO_DENSE_BUDGET_BYTES


def resolve_backend(
    backend: str,
    graph: HeteroGraph,
    metapaths: Sequence[Sequence[int]],
    budget_bytes: Optional[int] = None,
) -> str:
    """Resolve the 'auto' aggregation backend for a concrete workload.

    dense turns each hop into one MXU GEMM and measured fastest at
    reference scale (docs/DESIGN.md §2), but costs 2·Ru·N²·4 bytes of
    precomputed (A, A^T); past the budget (derived from the device's free
    HBM, ``auto_dense_budget_bytes``) the O(E) segment path wins by
    default. Explicit backends pass through unchanged."""
    if backend != "auto":
        return backend
    if budget_bytes is None:
        budget_bytes = auto_dense_budget_bytes()
    uniq = {int(r) for mp in metapaths for r in mp}
    dense_bytes = 2 * len(uniq) * graph.num_nodes * graph.num_nodes * 4
    if dense_bytes <= budget_bytes:
        return "dense"
    # past dense: XLA's scatter-add degrades catastrophically with edge
    # count (0.8 GB/s at 10M edges, benchmarks/micro_agg.py) — the Pallas
    # sorted-CSR kernel wins 7x there; below ~1M edges per relation the
    # segment path is fine and skips the host-side blocking build
    max_e = max((int(graph.rel_counts[r]) for r in uniq), default=0)
    return "csr" if max_e >= CSR_EDGE_CUTOVER else "segment"


def build_hop_arrays(
    graph: HeteroGraph,
    metapaths: Sequence[Sequence[int]],
    pad_multiple: int = 128,
    backend: str = "segment",
    mesh=None,
    mesh_axis: str = "nodes",
    halo_exchange: str = "a2a",
    halo_local: str = "auto",
):
    """Per-(metapath, hop) aggregation operands for the relations on a path,
    as tagged tuples consumed by models.mpgnn.hop_aggregate.

    Backends (same math, different TPU mappings):
      * 'segment' — src-sorted padded edge arrays -> sorted segment-mean.
      * 'ell'     — padded neighbor tables -> dense gather + masked mean.
      * 'ell2'    — paired out/in tables, gather-only in BOTH directions
                    (transposed-table VJP; no scatter anywhere).
      * 'dense'   — precomputed row-normalized adjacency -> one MXU GEMM
                    per hop; fastest whenever A_r fits HBM. Adjacencies are
                    cached per relation and shared across hops/candidates.
      * 'halo'    — NODE-SHARDED aggregation over ``mesh``: node features
                    block-partitioned along ``mesh_axis``, boundary features
                    exchanged with one all_to_all (parallel/halo.py). For
                    graphs whose [N, F] state exceeds one chip's HBM.
                    Requires ``mesh``; x must be padded+sharded (see
                    ``shard_graph_features``).
    """
    if backend == "halo" and mesh is None:
        raise ValueError("backend='halo' requires a mesh")
    hop_ops: List[List[tuple]] = []
    dense_cache: dict = getattr(graph, "_dense_cache", None) or {}
    graph._dense_cache = dense_cache
    for mp in metapaths:
        ops = []
        for rel in mp:
            rel = int(rel)
            if backend == "segment":
                s, d = graph.rel_edges_csr(rel)
                n = len(s)
                e_pad = _round_up(n, pad_multiple)
                # index counts at a multiple of 1024 put XLA's row gather
                # on a ~92 Mrows/s strategy instead of ~203 (measured,
                # docs/DESIGN.md §2 round 3); one more pad block keeps
                # h[dst] on the fast path
                if e_pad % 1024 == 0:
                    e_pad += pad_multiple
                sp = np.full(e_pad, graph.num_nodes - 1, dtype=np.int32)
                dp = np.zeros(e_pad, dtype=np.int32)
                mk = np.zeros(e_pad, dtype=bool)
                sp[:n], dp[:n], mk[:n] = s, d, True
                # 1/deg is graph-static: shipping it removes the per-epoch
                # count scatter (half the scatter work per hop)
                deg = np.bincount(s, minlength=graph.num_nodes)
                inv = (1.0 / np.maximum(deg, 1)).astype(np.float32)
                ops.append(
                    ("segment", jnp.asarray(sp), jnp.asarray(dp),
                     jnp.asarray(mk), jnp.asarray(inv))
                )
            elif backend == "ell":
                nbr, mask = graph.neighbor_table(rel)
                ops.append(("ell", jnp.asarray(nbr), jnp.asarray(mask)))
            elif backend == "ell2":
                # gather-only in BOTH directions (transposed-table VJP) —
                # no scatter anywhere; candidate when XLA scatter-add is
                # the bottleneck
                from mpgnn_tpu.ops.spmm import build_ell2_operand

                key = ("ell2", rel)
                if key not in dense_cache:
                    s, d = graph.rel_edges(rel)
                    dense_cache[key] = build_ell2_operand(
                        s, d, graph.num_nodes
                    )
                op2 = dense_cache[key]
                ops.append(
                    ("ell2", op2.out_nbr, op2.out_w, op2.in_nbr, op2.in_w)
                )
            elif backend == "dense":
                if rel not in dense_cache:
                    s, d = graph.rel_edges(rel)
                    dense_cache[rel] = dense_adjacency(s, d, graph.num_nodes)
                adj, adj_t = dense_cache[rel]
                ops.append(("dense", adj, adj_t))
            elif backend == "pallas":
                # fused dense conv kernel (bf16 adjacency on the MXU)
                from mpgnn_tpu.ops.pallas_conv import build_dense_conv_operand

                key = ("fused", rel)
                if key not in dense_cache:
                    s, d = graph.rel_edges(rel)
                    dense_cache[key] = build_dense_conv_operand(
                        s, d, graph.num_nodes
                    )
                interp = jax.devices()[0].platform not in ("tpu",)
                ops.append(("fused", dense_cache[key], interp))
            elif backend == "onehot":
                from mpgnn_tpu.ops.pallas_spmm import build_spmm_blocking

                key = ("pallas", rel)
                if key not in dense_cache:
                    s, d = graph.rel_edges(rel)
                    dense_cache[key] = build_spmm_blocking(s, d, graph.num_nodes)
                fwd, bwd = dense_cache[key]
                ops.append(("onehot", fwd, bwd))
            elif backend == "csr":
                # Pallas sorted-CSR block-one-hot kernel: XLA row gather +
                # MXU segment reduction, no scatter in either direction
                # (ops/pallas_csr.py; measured 7x the segment path at
                # N=500k/E=10M/F=16 on v5e)
                from mpgnn_tpu.ops.pallas_csr import build_csr_blocking

                key = ("csr", rel)
                if key not in dense_cache:
                    s, d = graph.rel_edges(rel)
                    dense_cache[key] = build_csr_blocking(
                        s, d, graph.num_nodes
                    )
                fwd, bwd = dense_cache[key]
                ops.append(("csr", fwd, bwd))
            elif backend == "halo":
                from mpgnn_tpu.parallel.halo import (
                    build_halo_csr_operands,
                    build_halo_plan,
                )

                n_shards = mesh.shape[mesh_axis]
                key = ("halo", rel, n_shards, halo_exchange)
                if key not in dense_cache:
                    s, d = graph.rel_edges(rel)
                    dense_cache[key] = build_halo_plan(
                        s, d, graph.num_nodes, n_shards,
                        exchange=halo_exchange,
                    )
                plan = dense_cache[key]
                csr_statics, csr_arrays = None, ()
                # 'auto': same per-relation crossover as resolve_backend —
                # the real-chip anchor (benchmarks/HALO_REAL.json) measured
                # segment-local halo at 7.33x plain csr vs 1.05x for
                # csr-local at north-star shapes; small relations keep the
                # segment path and skip the host-side blocking build
                local = halo_local
                if local == "auto":
                    local = (
                        "csr"
                        if int(graph.rel_counts[rel]) >= CSR_EDGE_CUTOVER
                        else "segment"
                    )
                if local == "csr":
                    ck = key + ("csr",)
                    if ck not in dense_cache:
                        dense_cache[ck] = build_halo_csr_operands(plan)
                    csr_statics, csr_arrays = dense_cache[ck]
                ops.append(
                    ("halo", mesh, mesh_axis, plan.block,
                     plan.exchange, plan.round_sizes, csr_statics,
                     plan.edge_src_local, plan.edge_dst_slot,
                     plan.edge_mask, plan.send_idx, plan.send_mask,
                     *csr_arrays)
                )
            else:
                raise ValueError(f"unknown backend {backend!r}")
        hop_ops.append(ops)
    return hop_ops


def split_hop_ops(hop_ops):
    """Split tagged hop ops into (static kinds, dynamic array pytrees).

    Large operands (dense adjacencies, fused-kernel A/A^T) must enter jit as
    ARGUMENTS — embedded constants bloat the serialized HLO and break
    remote-compile payload limits. Static metadata (kind tags, fused
    num_rows/interpret, onehot blockings with their eager incidence) stays
    closure-side."""
    def split_op(op):
        if op[0] == "onehot":
            return op, ()
        if op[0] == "fused":
            _, operand, interp = op
            return ("fused", operand.num_rows, interp), (operand.a, operand.a_t)
        if op[0] == "halo":
            # (mesh, axis, block, exchange, round_sizes, csr_statics) are
            # static/hashable; the plan's per-shard arrays (5, +8 when the
            # csr local path is on) travel as jit arguments
            return tuple(op[:7]), tuple(op[7:])
        return op[0], tuple(op[1:])

    kinds = [[split_op(op)[0] for op in ops] for ops in hop_ops]
    data = [[split_op(op)[1] for op in ops] for ops in hop_ops]
    return kinds, data


def retag_hop_ops(hop_kinds, hop_data):
    """Rebuild tagged hop ops inside a trace from static kinds + arg data."""
    from mpgnn_tpu.ops.pallas_conv import DenseConvOperand

    out = []
    for krow, drow in zip(hop_kinds, hop_data):
        r = []
        for k, d in zip(krow, drow):
            if isinstance(k, tuple) and k[0] == "fused":
                _, num_rows, interp = k
                a, a_t = d
                r.append(("fused", DenseConvOperand(a, a_t, num_rows), interp))
            elif isinstance(k, tuple) and k[0] == "halo":
                r.append(tuple(k) + tuple(d))
            elif isinstance(k, tuple):
                r.append(k)
            else:
                r.append((k,) + tuple(d))
        out.append(r)
    return out


@dataclasses.dataclass
class MPGNNTrainResult:
    params: MPGNNParams
    val_f1: float
    test_f1: float
    train_f1: float
    final_loss: float


def _kinds_key(hop_kinds) -> tuple:
    return tuple(
        tuple(k if isinstance(k, str) else tuple(k) for k in row)
        for row in hop_kinds
    )


from functools import lru_cache as _lru_cache  # noqa: E402


@_lru_cache(maxsize=64)
def _train_program(
    kinds_key: tuple,
    epochs: int,
    lr: float,
    weight_decay: float,
    dropout: float,
    track_best: bool,
    num_classes: int,
    compute_dtype_name: str,
):
    """One jitted whole-run training program per static signature.

    ``train_mpgnn`` used to build a fresh ``@jax.jit`` closure per call, so
    back-to-back candidate trainings (the search's greedy final phase,
    serial evals) re-traced identical programs every time. Hoisting the
    program into an lru-cached factory makes a repeat call a pure jit-cache
    hit; every run-specific value (params, operands, splits, dropout key,
    class weights) enters as an argument."""
    from mpgnn_tpu.config import MPGNNConfig as _Cfg

    tx = make_optimizer(_Cfg(lr=lr, weight_decay=weight_decay))
    compute_dtype = (
        jnp.bfloat16 if compute_dtype_name == "bfloat16" else jnp.float32
    )

    @jax.jit
    def run(params0, hop_data, x, train_idx, train_y, val_idx, val_y,
            test_idx, test_y, drop_key, cw):
        ops = retag_hop_ops(kinds_key, hop_data)
        # Hop-0 aggregates the constant input features: compute it ONCE here
        # (outside the epoch scan) and reuse it in all `epochs` iterations.
        first_aggs = precompute_first_hop(x, ops, compute_dtype)

        def loss_fn(params, rng):
            out = mpgnn_forward(
                params, x, ops,
                dropout_rate=dropout, dropout_rng=rng, train=True,
                compute_dtype=compute_dtype, first_hop_agg=first_aggs,
            )
            logp = out[train_idx]
            per = -jnp.take_along_axis(logp, train_y[:, None], axis=1)[:, 0]
            w = cw[train_y]
            return jnp.sum(per * w) / jnp.sum(w)

        def eval_metrics(params):
            out = mpgnn_forward(
                params, x, ops, train=False, compute_dtype=compute_dtype,
                first_hop_agg=first_aggs,
            )
            preds = jnp.argmax(out, axis=1)
            return (
                macro_f1(preds[train_idx], train_y, num_classes),
                macro_f1(preds[val_idx], val_y, num_classes),
                macro_f1(preds[test_idx], test_y, num_classes),
            )

        def epoch_step(carry, epoch):
            params, opt_state, best_val, best_params = carry
            rng = jax.random.fold_in(drop_key, epoch)
            loss, grads = jax.value_and_grad(loss_fn)(params, rng)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            if track_best:
                _, val_f1, _ = eval_metrics(params)
                better = val_f1 > best_val
                best_val = jnp.where(better, val_f1, best_val)
                best_params = jax.tree_util.tree_map(
                    lambda b, p: jnp.where(better, p, b), best_params, params
                )
            return (params, opt_state, best_val, best_params), loss

        opt_state = tx.init(params0)
        carry0 = (params0, opt_state, jnp.asarray(0.0), params0)
        (params, _, best_val, best_params), losses = jax.lax.scan(
            epoch_step, carry0, jnp.arange(epochs)
        )
        eval_params = best_params if track_best else params
        train_f1, val_f1, test_f1 = eval_metrics(eval_params)
        return eval_params, train_f1, val_f1, test_f1, losses[-1]

    return run


def make_dropout_key(threefry_key, seed: int, impl: str = "auto"):
    """Dropout-mask key per MPGNNConfig.dropout_rng.

    'rbg' (XLA hardware RngBitGenerator) removes the threefry mask
    generation that measured ~32% of a dense training epoch on v5e
    (docs/DESIGN.md §2); parameter init always stays threefry, so swapping
    the dropout stream never changes initial weights."""
    if impl == "auto":
        impl = "rbg" if jax.default_backend() == "tpu" else "threefry"
    if impl == "rbg":
        return jax.random.key(np.uint32(seed), impl="rbg")
    return threefry_key


def make_optimizer(cfg: MPGNNConfig) -> optax.GradientTransformation:
    """torch.optim.Adam(lr, weight_decay) parity: L2 decay is added to the
    gradient BEFORE the Adam moment updates (not AdamW)."""
    return optax.chain(
        optax.add_decayed_weights(cfg.weight_decay),
        optax.adam(cfg.lr),
    )


def train_mpgnn(
    graph: HeteroGraph,
    metapaths: Sequence[Sequence[int]],
    split: NodeSplit,
    num_classes: int,
    cfg: Optional[MPGNNConfig] = None,
    seed: int = 0,
    track_best: bool = False,
    x_override: Optional[np.ndarray] = None,
    backend: Optional[str] = None,
    class_weighted: bool = False,
    mesh=None,
    mesh_axis: str = "nodes",
) -> MPGNNTrainResult:
    """Train an MPGNN on the given metapath set; full-graph, jitted scan.

    Mirrors mpgnn_parallel_multiple (main.py:1117-1134): NLL on train_idx
    (class weights are computed but NOT applied in the reference,
    main.py:1065 — ``class_weighted=True`` opts into applying the balanced
    weights, as the reference's RGCN baseline does at main_rgcn.py:379),
    Adam(0.01, wd=5e-4), 1000 epochs, dropout 0.6.

    ``backend`` (default: ``cfg.backend``) may be 'auto' — resolved per
    workload by ``resolve_backend``. ``backend='halo'`` with a ``mesh``
    trains NODE-SHARDED: features, every activation and each hop's halo
    exchange stay block-partitioned along ``mesh_axis`` (parallel/halo.py)
    — the same model, loss, decompositions, first-hop caching and dropout
    semantics as the single-device path, for graphs whose node state
    exceeds one chip's HBM."""
    cfg = cfg or MPGNNConfig()
    metapaths = [list(mp) for mp in metapaths]
    backend = resolve_backend(backend or cfg.backend, graph, metapaths)
    if backend == "halo":
        if mesh is None:
            raise ValueError("backend='halo' requires mesh=")
        from mpgnn_tpu.parallel.halo import shard_graph_features

        x = shard_graph_features(
            np.asarray(x_override if x_override is not None else graph.x),
            mesh, mesh_axis,
        )
    else:
        x = jnp.asarray(x_override if x_override is not None else graph.x)
    hop_ops = build_hop_arrays(
        graph, metapaths, backend=backend, mesh=mesh, mesh_axis=mesh_axis,
        halo_exchange=cfg.halo_exchange, halo_local=cfg.halo_local,
    )
    # Split tagged ops into a static kind structure + a dynamic array pytree:
    # large operands (e.g. dense adjacencies) must enter jit as ARGUMENTS,
    # not closure constants — embedded constants bloat the serialized HLO
    # (and break remote-compile payload limits).
    # pallas ops carry static blocking metadata -> stay closure-side; other
    # backends' operands travel as jit arguments.
    hop_kinds, hop_data = split_hop_ops(hop_ops)

    key = jax.random.PRNGKey(seed)
    init_key, drop_key = jax.random.split(key)
    params0 = init_mpgnn(
        init_key, graph.feat_dim, cfg.hidden_dim, num_classes, metapaths,
        num_bases=cfg.num_bases, num_blocks=cfg.num_blocks,
    )
    drop_key = make_dropout_key(drop_key, seed, cfg.dropout_rng)

    if class_weighted:
        counts = np.bincount(np.asarray(split.train_y), minlength=num_classes)
        counts = np.maximum(counts, 1)
        cw = jnp.asarray(
            len(split.train_y) / (num_classes * counts), dtype=jnp.float32
        )
    else:
        # uniform weights reduce to the plain mean (sum(per)/n) exactly
        cw = jnp.ones((num_classes,), jnp.float32)

    split_arrays = [
        jnp.asarray(a) for a in (
            split.train_idx, split.train_y, split.val_idx, split.val_y,
            split.test_idx, split.test_y,
        )
    ]
    if backend == "halo":
        # commit shardings up front: plan arrays block-sharded (leading
        # axis = shard), everything else replicated across the mesh
        from jax.sharding import NamedSharding, PartitionSpec as _P

        row = NamedSharding(mesh, _P(mesh_axis))
        repl = NamedSharding(mesh, _P())
        hop_data = jax.tree_util.tree_map(
            lambda a: jax.device_put(a, row), hop_data
        )
        params0 = jax.device_put(params0, repl)
        split_arrays = [jax.device_put(a, repl) for a in split_arrays]
        cw = jax.device_put(cw, repl)

    run = _train_program(
        _kinds_key(hop_kinds), cfg.epochs, cfg.lr, cfg.weight_decay,
        cfg.dropout, track_best, num_classes, cfg.compute_dtype,
    )
    params, train_f1, val_f1, test_f1, last_loss = run(
        params0, hop_data, x, *split_arrays, drop_key, cw,
    )
    return MPGNNTrainResult(
        params=params,
        val_f1=float(val_f1),
        test_f1=float(test_f1),
        train_f1=float(train_f1),
        final_loss=float(last_loss),
    )


def evaluate_mpgnn(
    graph: HeteroGraph,
    metapaths: Sequence[Sequence[int]],
    params: MPGNNParams,
    idx: np.ndarray,
    y: np.ndarray,
    num_classes: int,
    x_override: Optional[np.ndarray] = None,
) -> Tuple[float, np.ndarray]:
    x = jnp.asarray(x_override if x_override is not None else graph.x)
    hop_ops = build_hop_arrays(graph, [list(m) for m in metapaths])
    out = mpgnn_forward(params, x, hop_ops, train=False)
    preds = jnp.argmax(out, axis=1)
    f1 = macro_f1(preds[jnp.asarray(idx)], jnp.asarray(y), num_classes)
    return float(f1), np.asarray(preds)
