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


def _tree_nbytes(tree) -> int:
    return sum(
        int(a.nbytes) for a in jax.tree_util.tree_leaves(tree)
        if hasattr(a, "nbytes")
    )


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
    resident: Optional[bool] = None,
    halo_relations: Optional[Sequence[int]] = None,
    report: Optional[dict] = None,
    fused: bool = False,
) -> MPGNNTrainResult:
    """Train an MPGNN with subgraph SGD; evaluate group-wise.

    Hyperparameters follow ``train_mpgnn`` (Adam 0.01 / wd 5e-4 / NLL /
    dropout 0.6 — main.py:1117-1134 semantics); ``cfg.epochs`` epochs, each
    visiting every block group once in random order.

    ``halo_hops`` defaults to the longest metapath: every core node's
    receptive field is complete, so gradients and predictions are EXACT and
    the only approximation left is the mini-batch noise itself. Pass 0 for
    the pure Cluster-GCN cut-edge regime (smaller subgraphs, some signal
    loss).

    ``halo_relations``: restrict halo expansion to these relation types
    (default: the union of the trained metapaths' relations — for a FIXED
    metapath only those relations carry receptive field, see
    ``PartitionedHeteroGraph.subgraph``). Pass an explicit list (or all
    relations) to widen.

    ``report``: optional dict filled with observability stats (per-group
    real sizes, metapath-edge counts, phase walls, transfer bytes, device
    peak memory when the backend exposes it).

    ``fused=True`` (requires ``backend='segment'``) runs the ENTIRE
    training — every epoch, every group visit — as ONE jitted device
    program: group operands are padded to common pow2 buckets, stacked on
    a leading group axis, and a scan over (epoch, permuted group) slices
    each visit's operands on device. On dispatch-latency-heavy links
    (this image's TPU tunnel charges ~1 s per host->device dispatch,
    which dominated the 100M-edge run's 128 per-step dispatches) this is
    the difference between dispatch-bound and compute-bound training.
    Group order and the dropout-step counter match the streaming mode;
    dropout MASKS differ (they are drawn at the common padded shape), so
    results are statistically — not bit — identical to streaming.

    ``resident`` controls where prepared group operands live between steps:
    True pins every group's arrays in HBM once (fastest when they fit);
    False streams each step's operands host->device with a one-group
    lookahead prefetch (``jax.device_put`` is async, so the next group's
    transfer overlaps the current step's compute) — peak HBM is then
    O(one subgraph), the whole point of out-of-core training on
    beyond-HBM graphs. Default None picks resident only when all groups
    fit comfortably in the device budget."""
    import time

    cfg = cfg or MPGNNConfig()
    metapaths = [list(mp) for mp in metapaths]
    if halo_hops is None:
        halo_hops = max((len(mp) for mp in metapaths), default=0)
    if halo_relations is None:
        halo_relations = sorted(set(r for mp in metapaths for r in mp))
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
        """HOST-side operand tuple for one group (numpy leaves): transfer
        policy (resident pin vs per-step streaming) is decided below.
        build_hop_arrays returns device (jnp) leaves — pull them back to
        host so streaming mode really holds only the in-flight groups in
        HBM (the leaves re-upload via the prefetching device_put)."""
        if fused and backend == "csr":
            # the fused path rebuilds blockings at a COMMON layout from
            # the raw subgraph edges — building per-group layouts here
            # would double the dominant host prep cost for nothing
            step_kinds[0] = [["csr"] * len(mp) for mp in metapaths]
            data = None
        else:
            hop_ops = build_hop_arrays(
                sub.graph, metapaths, backend=backend
            )
            kinds, data = split_hop_ops(hop_ops)
            step_kinds[0] = kinds
            data = jax.tree_util.tree_map(np.asarray, data)
        tmask = in_train[sub.nodes] & sub.core_mask
        y = y_full[sub.nodes]
        return (
            np.asarray(sub.graph.x, dtype=np.float32), data,
            tmask, y.astype(np.int32),
        )

    # fixed grouping (drawn once) -> the subgraph cache and the compiled
    # step set stay small; epoch order is reshuffled every epoch
    t_prep = time.time()
    groups = _group_blocks(pgraph.num_parts, blocks_per_step, rng)
    prepared = []
    for g in groups:
        sub = pgraph.subgraph(
            g, halo_hops=halo_hops, halo_relations=halo_relations
        )
        prepared.append((sub, sub_arrays(sub)))
    mp_rels = sorted(set(r for mp in metapaths for r in mp))
    if report is not None:
        report["groups"] = [
            {
                "blocks": list(map(int, g)),
                "real_nodes": int(sub.num_real_nodes),
                "real_edges": int(sub.num_real_edges),
                "pad_nodes": int(len(sub.nodes)),
                "mp_edges": int(sum(
                    int(sub.graph.rel_counts[r]) for r in mp_rels
                )),
                "host_bytes": _tree_nbytes(arrs),
            }
            for g, (sub, arrs) in zip(groups, prepared)
        ]
        report["prep_s"] = round(time.time() - t_prep, 1)
        report["halo_hops"] = int(halo_hops)
        report["halo_relations"] = list(map(int, halo_relations))

    if fused:
        if any(k not in ("segment", "csr")
               for row in (step_kinds[0] or []) for k in row):
            raise ValueError("fused=True requires backend segment or csr")
        return _train_fused(
            pgraph, prepared, cfg, tx, params, opt_state, drop_key, rng,
            compute_dtype, split, num_classes, step_kinds[0], report,
            metapaths,
        )

    if resident is None:
        # pin everything on device only when it clearly fits; streaming is
        # the out-of-core path this subsystem exists for
        from mpgnn_tpu.train.loops import auto_dense_budget_bytes

        try:
            budget = auto_dense_budget_bytes()
        except Exception:
            budget = 4 << 30
        resident = sum(_tree_nbytes(a) for _, a in prepared) < 0.5 * budget

    if resident:
        prepared = [
            (sub, jax.device_put(arrs)) for sub, arrs in prepared
        ]
        fetch = release = lambda gi: prepared[gi][1]
    else:
        # one-group lookahead prefetch: device_put is async, so group k+1's
        # host->device transfer rides under group k's step compute; buffers
        # are dropped after use so peak HBM stays O(one subgraph)
        inflight: dict = {}

        def fetch(gi):
            if gi not in inflight:
                inflight[gi] = jax.device_put(prepared[gi][1])
            return inflight[gi]

        def release(gi):
            inflight.pop(gi, None)

    last_loss = 0.0
    it = 0
    t_train = time.time()
    for _epoch in range(cfg.epochs):
        order = rng.permutation(len(prepared))
        for oi, gi in enumerate(order):
            x, data, tmask, y = fetch(gi)
            if oi + 1 < len(order):
                fetch(order[oi + 1])        # prefetch the next group
            params, opt_state, loss = step(
                params, opt_state, x, data, jnp.asarray(tmask),
                jnp.asarray(y), jax.random.fold_in(drop_key, it),
            )
            release(gi)
            it += 1
        last_loss = float(loss)
    if report is not None:
        jax.block_until_ready(params)
        report["train_s"] = round(time.time() - t_train, 1)
        report["epochs"] = int(cfg.epochs)
        report["steps"] = it
        report["resident"] = bool(resident)
        report["mp_edges_per_epoch"] = int(
            sum(g["mp_edges"] for g in report.get("groups", []))
        )
        try:
            ms = jax.devices()[0].memory_stats() or {}
            report["device_peak_bytes"] = int(
                ms.get("peak_bytes_in_use", 0)
            )
        except Exception:
            pass

    # ---------------------------------------------------- group-wise eval
    t_eval = time.time()
    preds = np.zeros(pgraph.num_nodes, dtype=np.int64)
    for gi, (sub, _arrs) in enumerate(prepared):
        x, data, _tmask, _y = fetch(gi)
        p = np.asarray(predict(params, x, data))
        release(gi)
        core = sub.core_mask          # every node is core in exactly 1 group
        preds[sub.nodes[core]] = p[core]
    if report is not None:
        report["eval_s"] = round(time.time() - t_eval, 1)

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


def _pad_stack_csr(blks, n_max: int, bm: int):
    """Pad per-group CsrBlockings (built at COMMON num_rows=n_max and
    block size bm) to common (T_max, EP_max) and stack their leaves on a
    leading group axis. Appended pad tiles target the LAST block (every
    blocking's final real tile already does, so the kernel's fresh-zero
    logic never re-zeros) with zero weights — their contribution is 0."""
    from mpgnn_tpu.ops.pallas_csr import _LANE, _SUB

    t_max = max(b.local.shape[0] for b in blks)
    ep_max = max(b.weight.shape[0] for b in blks)
    nb = max(1, -(-n_max // bm))
    G = len(blks)
    gidx = np.zeros((G, ep_max + 1), np.int32)
    local = np.zeros((G, t_max, _SUB, _LANE), np.int32)
    weight = np.zeros((G, ep_max), np.float32)
    tile_block = np.full((G, t_max), nb - 1, np.int32)
    for g, b in enumerate(blks):
        t, ep = b.local.shape[0], b.weight.shape[0]
        # spread pad gather slots over the row space (HBM channel spread)
        gidx[g] = np.arange(ep_max + 1, dtype=np.int64) % n_max
        gidx[g, : ep + 1] = np.asarray(b.gidx)
        local[g, :t] = np.asarray(b.local)
        weight[g, :ep] = np.asarray(b.weight)
        tile_block[g, :t] = np.asarray(b.tile_block)
    return gidx, local, weight, tile_block


def _train_fused(
    pgraph, prepared, cfg, tx, params, opt_state, drop_key, rng,
    compute_dtype, split, num_classes, kinds, report, metapaths,
):
    """Whole-run-as-one-program clustered training (see
    ``train_mpgnn_clustered(fused=True)``): group operands padded to
    common pow2 buckets, stacked on a leading group axis, and a
    scan-over-(epoch, permuted group) slices each visit's operands ON
    DEVICE — a handful of epoch-blocked dispatches total.

    backend='segment' stacks the raw edge arrays (XLA sorted-segment
    scatter per visit — compute-bound by the scatter's ~0.8 GB/s strategy
    at wide stacks); backend='csr' rebuilds each group's blockings at a
    COMMON (num_rows=n_max, bm) layout and stacks those — the
    scatter-free kernel at streaming-dispatch-free cadence, the fast path
    for beyond-HBM graphs behind a high-latency dispatch link."""
    import time

    from mpgnn_tpu.models.mpgnn import mpgnn_forward
    from mpgnn_tpu.train.loops import retag_hop_ops
    from mpgnn_tpu.train.metrics import macro_f1_np

    t0 = time.time()
    G = len(prepared)
    F = prepared[0][1][0].shape[1]
    n_max = max(arrs[0].shape[0] for _, arrs in prepared)
    xs = np.zeros((G, n_max, F), np.float32)
    tms = np.zeros((G, n_max), bool)
    yss = np.zeros((G, n_max), np.int32)
    for g, (_sub, (x, _d, tm, y)) in enumerate(prepared):
        n = x.shape[0]
        xs[g, :n] = x
        tms[g, :n] = tm
        yss[g, :n] = y
    csr_mode = kinds[0][0] == "csr"
    data_stk = []
    csr_statics = {}
    if csr_mode:
        from mpgnn_tpu.ops.pallas_csr import _ET, build_csr_blocking

        bm = 512
        csr_statics = {"bm": bm, "et": _ET}
        for p, mp in enumerate(metapaths):
            prow = []
            for h, rel in enumerate(mp):
                fwds, bwds = [], []
                for _sub, _arrs in prepared:
                    s, d = _sub.graph.rel_edges(int(rel))
                    f_b, b_b = build_csr_blocking(
                        s, d, n_max, bm=bm, dedup="never"
                    )
                    fwds.append(f_b)
                    bwds.append(b_b)
                prow.append((_pad_stack_csr(fwds, n_max, bm),
                             _pad_stack_csr(bwds, n_max, bm)))
            data_stk.append(prow)
    else:
        for p, row in enumerate(kinds):
            prow = []
            for h in range(len(row)):
                e_max = max(
                    arrs[1][p][h][0].shape[0] for _, arrs in prepared
                )
                src = np.full((G, e_max), n_max - 1, np.int32)  # pad node
                dst = np.zeros((G, e_max), np.int32)
                mk = np.zeros((G, e_max), bool)
                inv = np.zeros((G, n_max), np.float32)
                for g, (_sub, (_x, d, _tm, _y)) in enumerate(prepared):
                    s_g, d_g, m_g, i_g = d[p][h]
                    e, n = s_g.shape[0], i_g.shape[0]
                    src[g, :e], dst[g, :e], mk[g, :e] = s_g, d_g, m_g
                    inv[g, :n] = i_g
                prow.append((src, dst, mk, inv))
            data_stk.append(prow)
    perms = np.stack(
        [rng.permutation(G) for _ in range(cfg.epochs)]
    ).astype(np.int32)

    def slice_ops(data, gi):
        if csr_mode:
            from mpgnn_tpu.ops.pallas_csr import CsrBlocking

            def blk(leaves):
                gx, lc, wt, tb = (leaf[gi] for leaf in leaves)
                return CsrBlocking(gx, lc, wt, tb, n_max,
                                   csr_statics["bm"], csr_statics["et"])

            return [
                [(blk(fw), blk(bw)) for fw, bw in row] for row in data
            ]
        return [
            [tuple(leaf[gi] for leaf in hop) for hop in row]
            for row in data
        ]

    @jax.jit
    def run_block(params, opt_state, xs, data, tms, yss, its, gis):
        def visit(carry, it_gi):
            p, st, _ = carry
            it, gi = it_gi
            ops = retag_hop_ops(kinds, slice_ops(data, gi))
            x, tm, y = xs[gi], tms[gi], yss[gi]

            def loss_fn(p):
                out = mpgnn_forward(
                    p, x, ops, dropout_rate=cfg.dropout,
                    dropout_rng=jax.random.fold_in(drop_key, it),
                    train=True, compute_dtype=compute_dtype,
                )
                per = -jnp.take_along_axis(out, y[:, None], axis=1)[:, 0]
                w = tm.astype(jnp.float32)
                return jnp.sum(per * w) / jnp.maximum(jnp.sum(w), 1.0)

            loss, grads = jax.value_and_grad(loss_fn)(p)
            upd, st = tx.update(grads, st, p)
            return (optax.apply_updates(p, upd), st, loss), None

        (p, st, loss), _ = jax.lax.scan(
            visit, (params, opt_state, jnp.float32(0.0)), (its, gis),
        )
        return p, st, loss

    @jax.jit
    def run_eval(p, xs, data):
        def pred_one(_, gi):
            ops = retag_hop_ops(kinds, slice_ops(data, gi))
            out = mpgnn_forward(
                p, xs[gi], ops, train=False, compute_dtype=compute_dtype
            )
            return None, jnp.argmax(out, axis=1)

        _, preds = jax.lax.scan(
            pred_one, None, jnp.arange(G, dtype=jnp.int32)
        )
        return preds

    # epoch-BLOCKED dispatches with the (params, Adam) carry on device:
    # one giant all-epochs dispatch crashed the TPU tunnel worker at 100M-
    # edge scale (the round-4 long-dispatch pathology the csr eval's
    # _csr_epoch_blocks designed out); ~2 epochs per dispatch keeps each
    # device program seconds-long while still amortizing dispatch latency
    # 2G-fold vs per-step streaming. Identical training stream: the
    # (it, gi) sequence is just split at block boundaries.
    t_stack = time.time()
    operands = jax.device_put((xs, data_stk, tms, yss))
    jax.block_until_ready(operands)
    t_up = time.time()
    epb = max(1, min(2, cfg.epochs))
    flat_its = np.arange(perms.size, dtype=np.int32)
    flat_gis = perms.reshape(-1)
    p_dev, st_dev = jax.device_put((params, opt_state))
    last_loss = 0.0
    pos = 0
    block = epb * G
    t_first = None
    while pos < perms.size:
        # equal-size blocks guaranteed by slicing whole epochs
        # (perms.size = epochs * G, block = epb * G); a shorter tail from
        # odd epochs just compiles one extra signature
        its = jnp.asarray(flat_its[pos: pos + block])
        gis = jnp.asarray(flat_gis[pos: pos + block])
        p_dev, st_dev, last_loss = run_block(
            p_dev, st_dev, *operands, its, gis
        )
        if t_first is None:
            jax.block_until_ready(last_loss)
            t_first = time.time()
        pos += block
    jax.block_until_ready(last_loss)
    t_steady = time.time()
    params_f = p_dev
    preds_g = np.asarray(run_eval(p_dev, operands[0], operands[1]))
    if report is not None:
        report["stack_build_s"] = round(t_stack - t0, 1)
        report["upload_s"] = round(t_up - t_stack, 1)
        report["first_block_s"] = round(t_first - t_up, 1)
        report["steady_blocks_s"] = round(t_steady - t_first, 1)
        report["eval_dispatch_s"] = round(time.time() - t_steady, 1)
    if report is not None:
        report["train_s"] = round(time.time() - t0, 1)
        report["fused"] = True
        report["epochs"] = int(cfg.epochs)
        report["steps"] = int(perms.size)
        report["stacked_bytes"] = int(
            xs.nbytes + tms.nbytes + yss.nbytes
            + _tree_nbytes(data_stk)
        )
        report["mp_edges_per_epoch"] = int(sum(
            g["mp_edges"] for g in report.get("groups", [])
        ))
        try:
            ms = jax.devices()[0].memory_stats() or {}
            report["device_peak_bytes"] = int(ms.get("peak_bytes_in_use", 0))
        except Exception:
            pass

    preds = np.zeros(pgraph.num_nodes, dtype=np.int64)
    for g, (sub, _arrs) in enumerate(prepared):
        core = sub.core_mask
        # preds_g rows are at the COMMON padded width n_max; each group's
        # masks/node maps live at its own (smaller) n_pad — slice first
        preds[sub.nodes[core]] = preds_g[g][: len(core)][core]

    def f1(idx, y):
        idx = np.asarray(idx)
        return float(macro_f1_np(preds[idx], np.asarray(y), num_classes))

    return MPGNNTrainResult(
        params=params_f,
        val_f1=f1(split.val_idx, split.val_y),
        test_f1=f1(split.test_idx, split.test_y),
        train_f1=f1(split.train_idx, split.train_y),
        final_loss=float(last_loss),
    )
