"""Benchmark harness — run on the real TPU by the driver.

HEADLINE (``value``): full-graph MPGNN training throughput at the
north-star scale — 200k nodes / 10M edges / hidden 64 under
backend='auto' (the Pallas sorted-CSR path) — the flagship hot loop
(SURVEY §3.1 hot loop #1: per-relation mean aggregation + GEMMs +
backward + Adam as one jitted lax.scan program). ``vs_baseline`` = our
edges/s over an equivalent torch-CPU training loop at the SAME workload
(the reference runs torch-CPU; torch_geometric is unavailable here, so
the baseline is an independent torch implementation of the same math:
index_add scatter-mean + dense GEMMs).

Also emitted: the reference-scale toy number (5k nodes, like the shipped
dataset) under ``toy_5k``; a 10M-edge aggregation roofline block; and a
step-level utilization decomposition (gather / csr kernel / GEMMs+head)
against the measured same-shape XLA gather rate and the HBM byte floor.

Prints exactly ONE JSON line on stdout.
"""

import json
import sys
import time

import numpy as np

EPOCHS_TPU = 1000  # the reference trains 1000 epochs per candidate (main.py:1121)
EPOCHS_TORCH = 12
HIDDEN = 64
METAPATH = [1, 0]


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_graph():
    from mpgnn_tpu.graph.generate import generate_synthetic_graph
    from mpgnn_tpu.graph.hetero import HeteroGraph

    g = generate_synthetic_graph(5000, 7, "red-red-blue", seed=0)
    graph = HeteroGraph(
        g["node_features"].astype(np.float32), g["src"], g["dst"], g["rel"],
        num_relations=4, labels=g["labels"],
    )
    return graph, g["labels"]


def bench_jax(graph, labels):
    """Steady-state training throughput: the full EPOCHS_TPU-epoch jitted
    training program (forward + backward + Adam + weight decay + dropout,
    identical to the reference's per-candidate training loop), timed on its
    second invocation so one-time compile and host->device transfer latency
    (large and variable over the TPU tunnel) are excluded — matching how the
    program runs inside the search (compiled once, invoked per candidate)."""
    import jax
    import jax.numpy as jnp
    import optax

    from mpgnn_tpu.config import MPGNNConfig
    from mpgnn_tpu.graph.io import split_nodes
    from mpgnn_tpu.models.mpgnn import init_mpgnn, mpgnn_forward
    from mpgnn_tpu.train.loops import (
        build_hop_arrays,
        make_optimizer,
        retag_hop_ops,
        split_hop_ops,
    )

    split = split_nodes(labels)
    cfg = MPGNNConfig(epochs=EPOCHS_TPU, hidden_dim=HIDDEN)
    edges_per_epoch = sum(int(graph.rel_counts[r]) for r in METAPATH)
    x = jnp.asarray(graph.x)
    train_idx = jnp.asarray(split.train_idx)
    train_y = jnp.asarray(split.train_y)
    params0 = init_mpgnn(
        jax.random.PRNGKey(0), graph.feat_dim, HIDDEN, 2, [METAPATH]
    )
    tx = make_optimizer(cfg)
    from mpgnn_tpu.train.loops import make_dropout_key

    drop_key = make_dropout_key(jax.random.PRNGKey(1), 1, "auto")

    import os

    backends = ("segment", "ell", "dense", "pallas") if os.environ.get(
        "BENCH_ALL_BACKENDS"
    ) else ("segment", "dense")
    best = (0.0, None)
    for backend in backends:
      for dt in (jnp.float32, jnp.bfloat16):
        if backend == "pallas" and dt == jnp.bfloat16:
            continue  # fused kernel already runs its adjacency in bf16
        hop_ops = build_hop_arrays(graph, [METAPATH], backend=backend)
        kinds, data = split_hop_ops(hop_ops)

        def retag(d):
            return retag_hop_ops(kinds, d)

        def loss_fn(p, rng, ops, first_aggs):
            out = mpgnn_forward(
                p, x, ops, dropout_rate=cfg.dropout,
                dropout_rng=rng, train=True, compute_dtype=dt,
                first_hop_agg=first_aggs,
            )
            logp = out[train_idx]
            return -jnp.mean(jnp.take_along_axis(logp, train_y[:, None], 1))

        @jax.jit
        def run(p, d):
            ops = retag(d)
            from mpgnn_tpu.models.mpgnn import precompute_first_hop

            first_aggs = precompute_first_hop(x, ops, dt)

            def epoch(carry, e):
                p, st = carry
                loss, g = jax.value_and_grad(loss_fn)(
                    p, jax.random.fold_in(drop_key, e), ops, first_aggs
                )
                upd, st = tx.update(g, st, p)
                return (optax.apply_updates(p, upd), st), loss

            (p, _), losses = jax.lax.scan(
                epoch, (p, tx.init(p)), jnp.arange(cfg.epochs)
            )
            return p, losses[-1]

        tag = f"{backend}/{jnp.dtype(dt).name}"
        t0 = time.time()
        p, l = run(params0, data)
        jax.block_until_ready(l)
        log(f"[{tag}] compile+first run: {time.time()-t0:.1f}s "
            f"on {jax.devices()[0]} (loss {float(l):.4f})")
        # best of 3 timed invocations: each is the whole 1000-epoch program,
        # so the spread is tunnel/dispatch noise, not warmup
        wall = float("inf")
        for _ in range(3):
            t0 = time.time()
            p, l = run(params0, data)
            jax.block_until_ready(l)
            wall = min(wall, time.time() - t0)
        eps = EPOCHS_TPU * edges_per_epoch / wall
        log(f"[{tag}] {EPOCHS_TPU} epochs in {wall:.3f}s -> "
            f"{eps/1e6:.2f}M edges/s")
        if eps > best[0]:
            best = (eps, tag)
    log(f"best backend: {best[1]}")
    return best[0]


def bench_torch(graph, labels, metapath=None, epochs=None, hidden=None):
    """Equivalent torch-CPU training step (independent implementation of the
    same conv math the reference's PyG stack executes)."""
    import torch
    import torch.nn.functional as F

    metapath = metapath if metapath is not None else METAPATH
    epochs = epochs if epochs is not None else EPOCHS_TORCH
    HID = hidden if hidden is not None else HIDDEN
    torch.manual_seed(0)
    N, feat = graph.num_nodes, graph.feat_dim
    x = torch.from_numpy(graph.x)
    from mpgnn_tpu.graph.io import split_nodes

    split = split_nodes(labels)
    train_idx = torch.from_numpy(split.train_idx)
    train_y = torch.from_numpy(split.train_y)

    hops = []
    for r in metapath:
        s, d = graph.rel_edges(r)
        hops.append((torch.from_numpy(s.astype(np.int64)),
                     torch.from_numpy(d.astype(np.int64))))

    class Conv(torch.nn.Module):
        def __init__(self, i, o):
            super().__init__()
            self.w = torch.nn.Parameter(torch.randn(i, o) * (6 / (i + o)) ** 0.5)
            self.root = torch.nn.Parameter(torch.randn(i, o) * (6 / (i + o)) ** 0.5)
            self.b = torch.nn.Parameter(torch.zeros(o))

        def forward(self, h, src, dst):
            agg = torch.zeros(N, h.shape[1])
            agg.index_add_(0, src, h[dst])
            cnt = torch.zeros(N).index_add_(0, src, torch.ones(len(src)))
            agg = agg / cnt.clamp(min=1.0).unsqueeze(-1)
            return agg @ self.w + h @ self.root + self.b

    class Model(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.convs = torch.nn.ModuleList(
                [Conv(feat, HID)]
                + [Conv(HID, HID) for _ in metapath[1:]]
            )
            self.fc1 = torch.nn.Linear(HID, HID)
            self.fc2 = torch.nn.Linear(HID, 2)
            self.drop = torch.nn.Dropout(0.6)

        def forward(self, x):
            h = x
            for conv, (s, d) in zip(self.convs, hops):
                h = self.drop(torch.relu(conv(h, s, d)))
            h = torch.relu(self.fc1(h))
            return torch.log_softmax(self.fc2(h), dim=1)

    model = Model()
    opt = torch.optim.Adam(model.parameters(), lr=0.01, weight_decay=5e-4)
    # warmup
    for _ in range(2):
        opt.zero_grad()
        loss = F.nll_loss(model(x)[train_idx], train_y)
        loss.backward()
        opt.step()
    t0 = time.time()
    for _ in range(epochs):
        opt.zero_grad()
        loss = F.nll_loss(model(x)[train_idx], train_y)
        loss.backward()
        opt.step()
    dt = time.time() - t0
    edges_per_epoch = sum(int(graph.rel_counts[r]) for r in metapath)
    eps = epochs * edges_per_epoch / dt
    log(f"torch-cpu: {epochs} epochs in {dt:.2f}s -> {eps/1e6:.3f}M edges/s")
    return eps


# v5e default; per-device-kind peak HBM bandwidth for the roofline columns
HBM_PEAK_GBS = {
    "TPU v4": 1228.0, "TPU v5 lite": 819.0, "TPU v5": 2765.0,
    "TPU v5p": 2765.0, "TPU v6 lite": 1640.0, "TPU v6e": 1640.0,
}


def _timed_scan(step, init, iters=10):
    """Median-free min-of-2 timing of ``iters`` dependent steps inside ONE
    jitted scan (tunnel-safe: per-dispatch latency is ~ms and
    block_until_ready does not block on this image — a scalar readback
    does; methodology of benchmarks/bench_gather_roofline.py)."""
    import jax

    @jax.jit
    def run(c):
        def body(c, _):
            return step(c), 0

        c, _ = jax.lax.scan(body, c, None, length=iters)
        return jax.tree_util.tree_map(lambda a: a.ravel()[0], c)

    _ = jax.tree_util.tree_map(float, run(init))
    t0 = time.perf_counter()
    _ = jax.tree_util.tree_map(float, run(init))
    return (time.perf_counter() - t0) / iters


def bench_step_utilization(graph, metapath, hidden, epoch_ms):
    """Whole-train-step utilization (VERDICT r3 item 6): decompose the
    north-star csr training epoch into phases and give 'fast' an honest
    denominator — the aggregation gather against the MEASURED same-shape
    XLA random-gather rate (not the theoretical HBM peak), and the whole
    epoch against its HBM byte floor.

    Phases (each timed as dependent steps in one jitted scan):
      agg_fwd     csr_mean_aggregate forward (gather + Pallas one-hot MXU)
      agg_bwd     the VJP kernel on the destination-sorted blocking
      gather_fwd  the XLA row gather alone (the kernel's known wall)
      gather_ref  a random gather of the same index count / row width —
                  the measured roofline this chip gives the primitive today
      gemm_head   the epoch minus aggregation: conv GEMMs + fc head + nll
                  backward + Adam (aggregations replaced by constants)
    """
    import jax
    import jax.numpy as jnp
    import optax

    from mpgnn_tpu.ops.pallas_csr import (
        _gather_cols,
        _gather_weighted,
        csr_mean_aggregate,
    )

    dev = jax.devices()[0]
    peak = next(
        (v for k, v in HBM_PEAK_GBS.items() if k in str(dev.device_kind)),
        819.0,
    )
    N, H = graph.num_nodes, hidden
    rel = int(metapath[-1])  # the in-scan hop (hop 0 is cached outside)
    fwd, bwd = graph._dense_cache[("csr", rel)]
    rng = np.random.default_rng(0)
    h0 = jnp.asarray(rng.standard_normal((N, H)).astype(np.float32))

    def dep(x, out):
        return x + jnp.sum(out, axis=0)[None, :] * 1e-30

    out = {}
    t_fwd = _timed_scan(lambda h: dep(h, csr_mean_aggregate(h, fwd, bwd)), h0)
    t_bwd = _timed_scan(lambda h: dep(h, csr_mean_aggregate(h, bwd, fwd)), h0)
    t_gat = _timed_scan(
        lambda h: dep(h, _gather_weighted(fwd, h)[:, :H]), h0
    )
    ep_f = int(fwd.weight.shape[0])
    ep_b = int(bwd.weight.shape[0])
    # same-count random gather at the same (padded) row width: the rate
    # XLA gives the primitive on this chip today — the honest roofline
    fp = _gather_cols(H, jnp.float32)
    xp = jnp.asarray(rng.standard_normal((N, fp)).astype(np.float32))
    ridx = jnp.asarray(rng.integers(0, N, size=ep_f + 1).astype(np.int32))
    t_ref = _timed_scan(lambda x: dep(x, x[ridx][:ep_f]), xp)

    # gemm+head+optimizer share = the RESIDUAL of the measured epoch after
    # the directly measured aggregation phases. (A standalone GEMM-chain
    # probe measured ~15x the real share — a 49 ms forward for ~3 ms of
    # GEMEs under a params-carry dependent scan, an XLA scheduling artifact
    # of the probe, not the program — so the residual is the honest number;
    # its components measured individually: conv GEMM chain ~3 ms, head
    # ~3 ms at these shapes.)
    t_gemm = max(epoch_ms / 1e3 - t_fwd - t_bwd, 0.0)

    sum_ms = (t_fwd + t_bwd + t_gemm) * 1e3
    # whole-epoch HBM byte floor: both aggregation gathers stream their
    # 256B-padded rows once, the two [N, H] aggregation outputs are
    # written, and the conv/head GEMM chain reads+writes ~8 [N, H]-sized
    # activations/grads across forward+backward
    floor = (ep_f + ep_b) * fp * 4 + 2 * N * H * 4 + 8 * N * H * 4
    gbs = floor / (epoch_ms / 1e3) / 1e9
    out = {
        "whole_epoch_ms": round(epoch_ms, 2),
        "agg_fwd_ms": round(t_fwd * 1e3, 2),
        "agg_bwd_ms": round(t_bwd * 1e3, 2),
        "gather_fwd_ms": round(t_gat * 1e3, 2),
        "gather_ref_same_shape_ms": round(t_ref * 1e3, 2),
        "gemm_head_residual_ms": round(t_gemm * 1e3, 2),
        "gather_mrows_s": round(ep_f / t_gat / 1e6, 1),
        "gather_ref_mrows_s": round(ep_f / t_ref / 1e6, 1),
        "gather_pct_of_measured_roofline": round(100 * t_ref / t_gat, 1),
        "epoch_floor_bytes": floor,
        "epoch_gbs_floor": round(gbs, 1),
        "pct_hbm_peak": round(100 * gbs / peak, 1),
    }
    log(f"[step-util] epoch {epoch_ms:.1f} ms = agg_fwd {t_fwd*1e3:.1f} + "
        f"agg_bwd {t_bwd*1e3:.1f} + gemm/head residual {t_gemm*1e3:.1f}; "
        f"gather "
        f"{out['gather_mrows_s']}M rows/s = "
        f"{out['gather_pct_of_measured_roofline']}% of same-shape XLA "
        f"gather; whole step {gbs:.1f} GB/s floor "
        f"({out['pct_hbm_peak']}% of {peak:.0f} GB/s)")
    return out


def bench_sweep_utilization(folder="data/powerlaw_kg", rounds=3):
    """Bag-sweep utilization at KG scale (VERDICT r4 item 1): the hop-1 bag
    sweep — the KG search's dominant compute phase (223.1s + 493.3s of the
    237-relation search vs ~126s final eval) — gets the same treatment as
    the training step: measure the real per-restart-round wall on the REAL
    hop-1 workload (the 237-relation power-law KG, compact segment form),
    then decompose one epoch into neighbor-table streaming, argmax/segment
    reduction, backward, and optimizer via same-shape probe programs, with
    the measured contiguous-stream rate of the same operand bytes as the
    roofline denominator.

    The workload is constructed exactly as the search engine does for the
    hop-0 survivor state (engine.py hop loop; reference fan-out
    main.py:853-917, 1400-1408): build_dictionaries + create_bags +
    connected_relations on the planted path's first eval relation, then
    ``score_bag_tasks`` with a bounded restart budget and the stats hook.
    """
    import os

    import jax
    import jax.numpy as jnp

    from mpgnn_tpu.config import ScorerConfig
    from mpgnn_tpu.graph.io import load_fb15k237
    from mpgnn_tpu.search import bags as bagmod
    from mpgnn_tpu.search.scoring import _seg_first_max, score_bag_tasks

    if not os.path.isdir(folder):
        return {"error": f"{folder} not present"}
    with open(os.path.join(folder, "metapath.dat")) as fh:
        planted = [int(v) for v in fh.read().splitlines()[1].split()]
    t0 = time.time()
    graph, labels, _, label_nodes = load_fb15k237(
        os.path.join(folder, "node.dat"),
        os.path.join(folder, "link.dat"),
        os.path.join(folder, "label.dat"),
    )
    N = graph.num_nodes
    node_labels = np.zeros(N, dtype=np.float32)
    node_labels[np.asarray(label_nodes)] = np.asarray(labels, np.float32)
    # the hop-0 survivor state (planted path's first eval relation — the
    # search's measured hop-0 survivor on this dataset, BASELINE.md r4)
    rel0 = planted[-1]
    edge_dict, dest_dict = bagmod.build_dictionaries(
        graph, rel0, [int(v) for v in label_nodes], node_labels
    )
    bag_list, bag_labels = bagmod.create_bags(edge_dict, dest_dict, 0.9)
    members = sorted(set(m for b in bag_list for m in b))
    rels = bagmod.connected_relations(graph, bag_members=members)
    tasks = [(0, rels, bag_list, bag_labels)]
    log(f"[sweep-util] hop-1 workload: {len(rels)} relations x "
        f"{len(bag_list)} bags on rel {rel0} "
        f"(prep {time.time()-t0:.1f}s)")

    stats = []
    cfg = ScorerConfig(max_restarts=rounds)
    t0 = time.time()
    score_bag_tasks(graph, tasks, cfg, np.random.default_rng(0), stats=stats)
    sweep_wall = time.time() - t0
    seg_chunks = [c for c in stats if c["mode"] == "seg"]
    if not seg_chunks:
        return {"error": "no segment-form chunk at this scale",
                "chunks": stats}
    c = max(seg_chunks, key=lambda c: c["R"] * c["E"])
    R, E, C, P, B, F = c["R"], c["E"], c["C"], c["P"], c["B"], c["F"]
    epochs = c["epochs"]
    # per-epoch wall from the real rounds (post-compile min; each round is
    # ~epochs scan steps + 1 unrolled final epoch + its extra grad step)
    dev_rounds = c["device_round_s"][1:] or c["device_round_s"]
    per_epoch = min(dev_rounds) / (epochs + 1)

    # ---- same-shape probes (gather timing is pattern-insensitive on this
    # chip — benchmarks/GATHER_ROOFLINE.json — so synthetic operands of the
    # chunk's exact shapes measure the same program costs)
    rng = np.random.default_rng(0)
    d = dict(
        src=jnp.asarray(np.sort(rng.integers(0, C, (R, E)), 1).astype(np.int32)),
        dst=jnp.asarray(rng.integers(0, C, (R, E)).astype(np.int32)),
        em=jnp.asarray(np.ones((R, E), bool)),
        mn=jnp.asarray(rng.integers(0, C, (R, P)).astype(np.int32)),
        mb=jnp.asarray(np.sort(rng.integers(0, B, (R, P)), 1).astype(np.int32)),
        mm=jnp.asarray(np.ones((R, P), bool)),
        x=jnp.asarray(rng.standard_normal((R, C, F)).astype(np.float32)),
        lab=jnp.asarray(rng.uniform(size=(R, B)).astype(np.float32)),
        keep=jnp.asarray(np.ones((R, B), np.float32)),
        u=jnp.asarray(rng.uniform(-0.1, 0.1, (R, F)).astype(np.float32)),
    )
    w0 = jnp.asarray(rng.uniform(0, 1, (R, C)).astype(np.float32))

    def fwd_one(w_r, u_r, src_r, dst_r, em_r, mn_r, mb_r, mm_r, lab_r,
                keep_r, x_r):
        lin = x_r @ u_r
        vals = jnp.where(em_r, w_r[dst_r] * lin[src_r], -jnp.inf)
        _, win_e, has = _seg_first_max(vals, src_r, em_r, C)
        member_value = jnp.where(has, w_r[dst_r[win_e]] * lin, 0.0)
        mvals = jnp.where(mm_r, member_value[mn_r], -jnp.inf)
        _, win_m, bhas = _seg_first_max(mvals, mb_r, mm_r, B)
        pred = jnp.where(bhas, mvals[win_m], 0.0)
        return jnp.sum((pred - lab_r) ** 2 * keep_r)

    def loss_all(w):
        return jnp.sum(jax.vmap(fwd_one)(
            w, d["u"], d["src"], d["dst"], d["em"], d["mn"], d["mb"],
            d["mm"], d["lab"], d["keep"], d["x"],
        ))

    # neighbor-table streaming alone: the [R, E] gathers + the [R, C, F]
    # lin GEMV, no argmax/segment machinery
    def stream_all(w):
        def one(w_r, u_r, src_r, dst_r, em_r, x_r):
            lin = x_r @ u_r
            vals = w_r[dst_r] * lin[src_r]
            return jnp.sum(jnp.where(em_r, vals, 0.0))
        return jnp.sum(jax.vmap(one)(
            w, d["u"], d["src"], d["dst"], d["em"], d["x"],
        ))

    # contiguous read of the same persistent operand bytes — the rate the
    # chip gives an ideal single pass over everything an epoch must touch
    def ref_all(w):
        def one(src_r, dst_r, em_r, mn_r, mb_r, mm_r, x_r):
            ints = (jnp.sum(src_r) + jnp.sum(dst_r) + jnp.sum(mn_r)
                    + jnp.sum(mb_r))
            bools = jnp.sum(em_r) + jnp.sum(mm_r)
            return ints.astype(jnp.float32) + bools + jnp.sum(x_r)
        return jnp.sum(jax.vmap(one)(
            d["src"], d["dst"], d["em"], d["mn"], d["mb"], d["mm"], d["x"],
        )) + jnp.sum(w) * 1e-30

    def dep(w, s):
        return w + s * 1e-30

    t_fwd = _timed_scan(lambda w: dep(w, loss_all(w)), w0)
    t_fb = _timed_scan(
        lambda w: w + jax.grad(loss_all)(w) * 1e-30
        + loss_all(w) * 1e-30, w0,
    )
    t_stream = _timed_scan(lambda w: dep(w, stream_all(w)), w0)
    t_ref = _timed_scan(lambda w: dep(w, ref_all(w)), w0)

    table_bytes = R * (E * 9 + P * 9 + C * F * 4)
    floor_ms = 2 * t_ref * 1e3  # fwd + bwd each stream the tables once
    out = {
        "workload": {
            "folder": folder, "relations": len(rels),
            "bags": len(bag_list), "rounds_measured": rounds,
            "sweep_wall_s": round(sweep_wall, 1),
            "chunks": [
                {k: c2[k] for k in ("mode", "R", "E", "C", "P", "B")}
                for c2 in stats
            ],
        },
        "chunk": {"R": R, "E": E, "C": C, "P": P, "B": B, "F": F},
        "per_epoch_ms": round(per_epoch * 1e3, 3),
        "round_ms": round(min(dev_rounds) * 1e3, 1),
        "probe_fwd_ms": round(t_fwd * 1e3, 3),
        "probe_fwd_bwd_ms": round(t_fb * 1e3, 3),
        "probe_stream_ms": round(t_stream * 1e3, 3),
        "probe_stream_ref_ms": round(t_ref * 1e3, 3),
        "split_ms": {
            "stream": round(t_stream * 1e3, 3),
            "argmax_segmax": round((t_fwd - t_stream) * 1e3, 3),
            "backward": round((t_fb - t_fwd) * 1e3, 3),
            "optimizer_rest": round((per_epoch - t_fb) * 1e3, 3),
        },
        "table_bytes_per_epoch": table_bytes,
        "stream_gbs": round(table_bytes / t_ref / 1e9, 1),
        "epoch_floor_ms": round(floor_ms, 3),
        "pct_of_measured_stream_roofline": round(
            100 * floor_ms / (per_epoch * 1e3), 1
        ),
    }
    log(f"[sweep-util] chunk R={R} E={E} C={C} P={P}: epoch "
        f"{per_epoch*1e3:.2f} ms = stream {t_stream*1e3:.2f} + segmax "
        f"{(t_fwd-t_stream)*1e3:.2f} + bwd {(t_fb-t_fwd)*1e3:.2f} + "
        f"opt/rest {(per_epoch-t_fb)*1e3:.2f}; 2x-stream floor "
        f"{floor_ms:.2f} ms = {out['pct_of_measured_stream_roofline']}% "
        f"of the epoch ({out['stream_gbs']} GB/s contiguous)")
    return out


def bench_agg_roofline(n=500_000, e=10_000_000, f=16, iters=20):
    """North-star-scale aggregation roofline (VERDICT r1 'what's weak' #1):
    effective GB/s and %-of-HBM-peak of the sorted-CSR Pallas kernel and the
    XLA segment path at N=500k/E=10M — the scale where the toy training
    bench's dense backend cannot run and scatter cost dominates. Bytes moved
    is the gather-read + write floor E*F*4 (indices and the [N,F] output are
    second-order)."""
    import jax
    import jax.numpy as jnp

    from mpgnn_tpu.ops.pallas_csr import build_csr_blocking, csr_mean_aggregate

    dev = jax.devices()[0]
    peak = next(
        (v for k, v in HBM_PEAK_GBS.items() if k in str(dev.device_kind)),
        819.0,
    )
    rng = np.random.default_rng(0)
    src = np.sort(rng.integers(0, n, size=e))
    dst = rng.integers(0, n, size=e)
    x_d = jnp.asarray(rng.standard_normal((n, f)).astype(np.float32))
    inv_d = jnp.asarray(
        (1.0 / np.maximum(np.bincount(src, minlength=n), 1)).astype(np.float32)
    )
    src_d = jnp.asarray(src.astype(np.int32))
    dst_d = jnp.asarray(dst.astype(np.int32))
    t0 = time.time()
    fwd, bwd = build_csr_blocking(src, dst, n)
    log(f"[agg-roofline] blocking build {time.time()-t0:.1f}s")

    def timed(step, *consts):
        # dependent scan: tunnel dispatch is ~ms and block_until_ready does
        # not block on this image, so chain iterations inside ONE program
        @jax.jit
        def run(c, *consts):
            def body(c, _):
                return step(c, *consts), 0
            c, _ = jax.lax.scan(body, c, None, length=iters)
            return c.ravel()[0]

        float(run(x_d, *consts))
        t0 = time.perf_counter()
        float(run(x_d, *consts))
        return (time.perf_counter() - t0) / iters

    def dep(x, out):
        return x + jnp.sum(out, axis=0)[None, :] * 1e-30

    def seg_step(x):
        tot = jax.ops.segment_sum(
            x[dst_d], src_d, num_segments=n, indices_are_sorted=True
        )
        return dep(x, tot * inv_d[:, None])

    def csr_step(x, fwd, bwd):
        return dep(x, csr_mean_aggregate(x, fwd, bwd))

    out = {}
    for tag, t in (
        ("segment", timed(seg_step)),
        ("csr", timed(csr_step, fwd, bwd)),
    ):
        gbs = e * f * 4 / t / 1e9
        out[tag] = {
            "edges_per_s": round(e / t, 1),
            "gbps": round(gbs, 1),
            "pct_hbm_peak": round(100 * gbs / peak, 1),
        }
        log(f"[agg-roofline/{tag}] {t*1e3:.1f} ms -> {e/t/1e6:.1f}M edges/s, "
            f"{gbs:.1f} GB/s ({100*gbs/peak:.1f}% of {peak:.0f} GB/s peak)")
    out.update({"n": n, "e": e, "f": f, "hbm_peak_gbs": peak,
                "device_kind": str(dev.device_kind)})
    return out


def bench_train_at_scale(n=200_000, avg_deg=50, epochs=100, hidden=HIDDEN):
    """End-to-end TRAINING throughput at the BASELINE north-star scale
    (200k nodes / 10M edges heterogeneous, VERDICT r2 item 5): the full
    2-hop MPGNN epoch scan (forward + backward + Adam + dropout + hop-0
    caching) under backend='auto' — which resolves to the Pallas sorted-CSR
    kernel past 1M edges/relation — vs the round-1 segment path."""
    import jax
    import jax.numpy as jnp
    import optax

    from mpgnn_tpu.config import MPGNNConfig
    from mpgnn_tpu.graph.hetero import HeteroGraph
    from mpgnn_tpu.graph.io import split_nodes
    from mpgnn_tpu.models.mpgnn import (
        init_mpgnn,
        mpgnn_forward,
        precompute_first_hop,
    )
    from mpgnn_tpu.train.loops import (
        build_hop_arrays,
        make_dropout_key,
        make_optimizer,
        resolve_backend,
        retag_hop_ops,
        split_hop_ops,
    )

    rng = np.random.default_rng(0)
    e = n * avg_deg
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    rel = rng.integers(0, 4, e)
    x = rng.normal(size=(n, 16)).astype(np.float32)
    labels = rng.integers(0, 2, n)
    graph = HeteroGraph(x, src, dst, rel, num_relations=4)
    split = split_nodes(labels)
    metapath = [0, 1]
    cfg = MPGNNConfig(epochs=epochs, hidden_dim=hidden)
    edges_per_epoch = sum(int(graph.rel_counts[r]) for r in metapath)
    xj = jnp.asarray(x)
    train_idx = jnp.asarray(split.train_idx)
    train_y = jnp.asarray(split.train_y)
    params0 = init_mpgnn(jax.random.PRNGKey(0), 16, hidden, 2, [metapath])
    tx = make_optimizer(cfg)
    key = make_dropout_key(jax.random.PRNGKey(1), 1, "auto")

    auto = resolve_backend("auto", graph, [metapath])
    out = {"n": n, "e": e, "hidden": hidden, "epochs": epochs,
           "auto_resolves_to": auto}
    for backend in (auto, "segment"):
        t0 = time.time()
        hop_ops = build_hop_arrays(graph, [metapath], backend=backend)
        kinds, data = split_hop_ops(hop_ops)
        log(f"[train-at-scale/{backend}] hop-op build {time.time()-t0:.1f}s")

        def loss_fn(p, rng_, ops, fa):
            o = mpgnn_forward(
                p, xj, ops, dropout_rate=cfg.dropout, dropout_rng=rng_,
                train=True, first_hop_agg=fa,
            )
            logp = o[train_idx]
            return -jnp.mean(jnp.take_along_axis(logp, train_y[:, None], 1))

        @jax.jit
        def run(p, d):
            ops = retag_hop_ops(kinds, d)
            fa = precompute_first_hop(xj, ops, jnp.float32)

            def epoch(carry, ei):
                p, st = carry
                loss, g = jax.value_and_grad(loss_fn)(
                    p, jax.random.fold_in(key, ei), ops, fa
                )
                upd, st = tx.update(g, st, p)
                return (optax.apply_updates(p, upd), st), loss

            (p, _), losses = jax.lax.scan(
                epoch, (p, tx.init(p)), jnp.arange(cfg.epochs)
            )
            return losses[-1]

        t0 = time.time()
        l = float(run(params0, data))
        log(f"[train-at-scale/{backend}] compile+first: {time.time()-t0:.1f}s "
            f"(loss {l:.4f})")
        wall = float("inf")
        for _ in range(2):
            t0 = time.time()
            l = float(run(params0, data))
            wall = min(wall, time.time() - t0)
        eps = epochs * edges_per_epoch / wall
        out[backend] = {"edges_per_s": round(eps, 1), "wall_s": round(wall, 2)}
        log(f"[train-at-scale/{backend}] {epochs} epochs in {wall:.2f}s -> "
            f"{eps/1e6:.1f}M edges/s")
        if backend == auto == "csr":
            # step-level utilization against honest denominators
            # (VERDICT r3 item 6)
            try:
                out["step_utilization"] = bench_step_utilization(
                    graph, metapath, hidden, wall / epochs * 1e3
                )
            except Exception as exc:
                log(f"[step-util] failed: {exc!r}")
                out["step_utilization"] = {"error": repr(exc)}
    # torch-CPU at the SAME scale: the honest vs_baseline for the headline
    # (the reference's own stack at the north-star workload)
    try:
        t0 = time.time()
        eps_t = bench_torch(graph, labels, metapath,
                            epochs=2, hidden=hidden)
        out["torch_cpu_edges_per_s"] = round(eps_t, 1)
        log(f"[train-at-scale/torch-cpu] measured in {time.time()-t0:.1f}s")
    except Exception as exc:
        log(f"[train-at-scale/torch-cpu] failed: {exc!r}")
        out["torch_cpu_edges_per_s"] = None
    return out


def main():
    from mpgnn_tpu.utils.prof import enable_compilation_cache

    enable_compilation_cache()
    graph, labels = build_graph()
    log(f"graph: {graph}")
    eps_jax = bench_jax(graph, labels)
    eps_torch = bench_torch(graph, labels)
    try:
        agg = bench_agg_roofline()
    except Exception as exc:  # roofline section is additive, never fatal
        log(f"[agg-roofline] failed: {exc!r}")
        agg = {"error": repr(exc)}
    try:
        scale = bench_train_at_scale()
    except Exception as exc:  # additive, never fatal
        log(f"[train-at-scale] failed: {exc!r}")
        scale = {"error": repr(exc)}
    try:
        sweep = bench_sweep_utilization()
    except Exception as exc:  # additive, never fatal
        log(f"[sweep-util] failed: {exc!r}")
        sweep = {"error": repr(exc)}

    # HEADLINE = the north-star-scale training number (N=200k / E=10M /
    # hidden=64 under backend='auto'), not the 5k-node toy — the toy's
    # dense backend cannot even run at the scale the framework targets
    # (VERDICT r3 item 6). vs_baseline = torch-CPU at the SAME workload.
    auto_key = scale.get("auto_resolves_to")
    ns = scale.get(auto_key, {}) if auto_key else {}
    value = ns.get("edges_per_s")
    eps_torch_scale = scale.get("torch_cpu_edges_per_s")
    payload = {
        "metric": "mpgnn_train_at_scale_edges_per_s",
        "value": value,
        "unit": "edges/s",
        "vs_baseline": (
            round(value / eps_torch_scale, 2)
            if value and eps_torch_scale else None
        ),
        "toy_5k": {
            "edges_per_s": round(eps_jax, 1),
            "vs_torch_cpu": round(eps_jax / eps_torch, 2),
        },
        "agg_roofline_10m_edges": agg,
        "train_at_scale_10m_edges": scale,
        "sweep_utilization_kg237": sweep,
    }
    if value is None:  # at-scale section failed: fall back to the toy
        payload["metric"] = "mpgnn_train_edges_per_s"
        payload["value"] = round(eps_jax, 1)
        payload["vs_baseline"] = round(eps_jax / eps_torch, 2)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
