"""Distributed tests on the simulated 8-device CPU mesh (SURVEY §4 layer d)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpgnn_tpu.graph.hetero import HeteroGraph
from mpgnn_tpu.graph.io import split_nodes
from mpgnn_tpu.parallel import (
    build_sharded_train_step,
    edge_partitioned_aggregate,
    make_mesh,
    shard_edges,
)
from mpgnn_tpu.ops import rel_mean_aggregate


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest should provide 8 CPU devices"
    return make_mesh((4, 2), ("data", "model"))


def test_edge_partitioned_aggregate_matches_single_device(mesh):
    rng = np.random.default_rng(0)
    N, E, F = 64, 500, 8
    src = rng.integers(0, N, E).astype(np.int32)
    dst = rng.integers(0, N, E).astype(np.int32)
    x = rng.normal(size=(N, F)).astype(np.float32)
    mask = np.ones(E, dtype=bool)

    want = np.asarray(
        rel_mean_aggregate(jnp.asarray(x), jnp.asarray(src), jnp.asarray(dst), N)
    )
    src_p, _ = shard_edges(src, mesh)
    dst_p, _ = shard_edges(dst, mesh)
    mask_p, _ = shard_edges(mask, mesh)
    got = np.asarray(
        edge_partitioned_aggregate(
            mesh, jnp.asarray(x), jnp.asarray(src_p), jnp.asarray(dst_p),
            jnp.asarray(mask_p), N,
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_sharded_train_step_runs_and_learns(mesh):
    rng = np.random.default_rng(1)
    N, E = 128, 600
    src = rng.integers(0, N, E)
    dst = rng.integers(0, N, E)
    rel = rng.integers(0, 2, E)
    x = rng.normal(size=(N, 4)).astype(np.float32)
    labels = rng.integers(0, 2, N)
    g = HeteroGraph(x, src, dst, rel, num_relations=2)
    split = split_nodes(labels)

    from mpgnn_tpu.config import MPGNNConfig

    step, params, opt_state = build_sharded_train_step(
        mesh, g, [[0, 1]], split, num_classes=2,
        cfg=MPGNNConfig(hidden_dim=16, epochs=1),
    )
    rngk = jax.random.PRNGKey(0)
    losses = []
    for i in range(5):
        params, opt_state, loss = step(params, opt_state, jax.random.fold_in(rngk, i))
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] + 1e-3  # moving, not diverging


def test_sharded_relation_sweep_matches_unsharded():
    """The relation sweep sharded over a 'rel' mesh axis produces the same
    losses as the single-device sweep (the reference's np.array_split
    fan-out, main.py:1319, as a sharding annotation)."""
    from mpgnn_tpu.parallel import make_mesh, sharded_flat_sweep_args
    from mpgnn_tpu.search.scoring import _flat_sweep

    rng = np.random.default_rng(0)
    R, N, D = 8, 64, 4
    nbr = rng.integers(0, N, (R, N, D)).astype(np.int32)
    mask = rng.random((R, N, D)) > 0.3
    w0 = rng.random((R, N)).astype(np.float32)
    lmask = (rng.random((R, N)) > 0.5).astype(np.float32)
    y = rng.random(N).astype(np.float32)

    w_ref, loss_ref = _flat_sweep(
        jnp.asarray(w0), jnp.asarray(nbr), jnp.asarray(mask),
        jnp.asarray(lmask), jnp.asarray(y), epochs=5, lr=0.1,
    )

    mesh = make_mesh((8,), ("rel",))
    w0s, nbrs, masks, lmasks = sharded_flat_sweep_args(
        mesh, w0, nbr, mask, lmask
    )
    w_sh, loss_sh = _flat_sweep(
        w0s, nbrs, masks, lmasks, jnp.asarray(y), epochs=5, lr=0.1,
    )
    np.testing.assert_allclose(
        np.asarray(loss_ref), np.asarray(loss_sh), rtol=1e-5, atol=1e-6
    )


def test_halo_sharded_aggregate_matches_reference():
    """Node-sharded aggregation with halo all_to_all == single-device mean
    (nodes block-partitioned, features never replicated)."""
    import jax.numpy as jnp

    from mpgnn_tpu.parallel.halo import (
        build_halo_plan,
        halo_sharded_mean_aggregate,
        pad_node_features,
    )
    from mpgnn_tpu.parallel import make_mesh
    from mpgnn_tpu.ops import rel_mean_aggregate

    rng = np.random.default_rng(3)
    N, E, F, Pn = 100, 700, 8, 4
    src = rng.integers(0, N, E).astype(np.int64)
    dst = rng.integers(0, N, E).astype(np.int64)
    x = rng.normal(size=(N, F)).astype(np.float32)

    plan = build_halo_plan(src, dst, N, Pn)
    mesh = make_mesh((Pn,), ("nodes",), jax.devices()[:Pn])
    x_pad = pad_node_features(x, plan)
    from jax.sharding import NamedSharding, PartitionSpec

    x_sh = jax.device_put(x_pad, NamedSharding(mesh, PartitionSpec("nodes")))
    got = np.asarray(halo_sharded_mean_aggregate(mesh, x_sh, plan))[:N]
    want = np.asarray(
        rel_mean_aggregate(jnp.asarray(x), jnp.asarray(src), jnp.asarray(dst), N)
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_halo_sharded_aggregate_bf16_high_degree():
    """bf16 halo aggregation must stay accurate for hub nodes: the segment
    sums/counts accumulate in f32 (a bf16 segment_sum cannot represent
    counts >256 — means at degree 1000 measured ~1.59 vs true ~1.08 before
    the fix)."""
    from jax.sharding import NamedSharding, PartitionSpec

    from mpgnn_tpu.parallel import make_mesh
    from mpgnn_tpu.parallel.halo import (
        build_halo_plan,
        halo_sharded_mean_aggregate,
        pad_node_features,
    )

    rng = np.random.default_rng(11)
    N, F, Pn, DEG = 64, 8, 4, 1000
    # node 0 has 1000 in-plan edges spread over all shards' nodes
    src = np.zeros(DEG, np.int64)
    dst = rng.integers(0, N, DEG).astype(np.int64)
    x = (rng.random((N, F)).astype(np.float32) + 0.6).astype(jnp.bfloat16)

    plan = build_halo_plan(src, dst, N, Pn)
    mesh = make_mesh((Pn,), ("nodes",), jax.devices()[:Pn])
    x_sh = jax.device_put(
        pad_node_features(np.asarray(x), plan),
        NamedSharding(mesh, PartitionSpec("nodes")),
    )
    got = np.asarray(
        halo_sharded_mean_aggregate(mesh, x_sh, plan), dtype=np.float32
    )[0]
    want = np.asarray(x, np.float32)[dst].mean(axis=0)
    # inputs are bf16-rounded but accumulation is exact -> ~1e-2 agreement
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_halo_ppermute_exchange_matches_a2a():
    """plan.exchange='ppermute' (P-1 ring rounds, per-round buffer sizes)
    computes the identical aggregation as the all_to_all plan and the
    single-device reference."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec

    from mpgnn_tpu.ops import rel_mean_aggregate
    from mpgnn_tpu.parallel import make_mesh
    from mpgnn_tpu.parallel.halo import (
        build_halo_plan,
        halo_sharded_mean_aggregate,
        pad_node_features,
    )

    rng = np.random.default_rng(7)
    N, E, F, Pn = 120, 900, 8, 4
    src = rng.integers(0, N, E).astype(np.int64)
    dst = rng.integers(0, N, E).astype(np.int64)
    x = rng.normal(size=(N, F)).astype(np.float32)

    mesh = make_mesh((Pn,), ("nodes",), jax.devices()[:Pn])
    want = np.asarray(
        rel_mean_aggregate(jnp.asarray(x), jnp.asarray(src), jnp.asarray(dst), N)
    )
    for exchange in ("a2a", "ppermute"):
        plan = build_halo_plan(src, dst, N, Pn, exchange=exchange)
        x_sh = jax.device_put(
            pad_node_features(x, plan),
            NamedSharding(mesh, PartitionSpec("nodes")),
        )
        got = np.asarray(halo_sharded_mean_aggregate(mesh, x_sh, plan))[:N]
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6,
                                   err_msg=exchange)


def test_halo_volume_ppermute_beats_a2a_on_skew():
    """One hot (q, p) pair inflates EVERY a2a buffer to the global max;
    the ring plan pads per round only — wire bytes must drop, and the
    accounting must bound the useful volume correctly."""
    from mpgnn_tpu.parallel.halo import build_halo_plan, halo_volume

    rng = np.random.default_rng(0)
    N, Pn = 4096, 8
    S = N // Pn
    # skew: shard 0's nodes read MANY distinct nodes of shard 1; all other
    # pairs exchange a handful of rows
    hot_src = rng.integers(0, S, 3000)                # owned by shard 0
    hot_dst = rng.integers(S, 2 * S, 3000)            # owned by shard 1
    bg_src = rng.integers(0, N, 400)
    bg_dst = rng.integers(0, N, 400)
    src = np.concatenate([hot_src, bg_src])
    dst = np.concatenate([hot_dst, bg_dst])

    a2a = build_halo_plan(src, dst, N, Pn, exchange="a2a")
    ring = build_halo_plan(src, dst, N, Pn, exchange="ppermute")
    va, vr = halo_volume(a2a, 16), halo_volume(ring, 16)
    assert va["useful_rows"] == vr["useful_rows"]
    assert vr["wire_rows"] >= vr["useful_rows"]
    # a2a pads all P*(P-1) pairs to the hot pair's size; the ring pads only
    # the hot pair's round (measured 2.8x fewer wire rows on this skew)
    assert va["wire_rows"] > 2 * vr["wire_rows"]
    assert vr["utilization"] > va["utilization"]


def test_locality_reorder_preserves_training():
    """BFS-clustered relabeling (graph/partition.py::locality_reorder) is
    aggregation-invariant: the relabeled graph + remapped split produce the
    same mean aggregation (row-permuted) and smaller-or-equal halos."""
    import jax.numpy as jnp

    from mpgnn_tpu.graph.hetero import HeteroGraph
    from mpgnn_tpu.graph.partition import locality_reorder
    from mpgnn_tpu.ops import rel_mean_aggregate
    from mpgnn_tpu.parallel.halo import build_halo_plan, halo_volume

    rng = np.random.default_rng(4)
    N, F = 400, 6
    # two interleaved communities: file ids alternate, so contiguous blocks
    # cut almost every edge until reordered
    comm = np.arange(N) % 2
    members = [np.nonzero(comm == c)[0] for c in (0, 1)]
    src = np.concatenate([rng.choice(members[c], 1200) for c in (0, 1)])
    dst = np.concatenate([rng.choice(members[c], 1200) for c in (0, 1)])
    rel = np.zeros(len(src), np.int32)
    x = rng.normal(size=(N, F)).astype(np.float32)
    labels = rng.integers(0, 2, N)
    graph = HeteroGraph(x, src, dst, rel, num_relations=1, labels=labels)

    graph2, _, old_of_new = locality_reorder(graph)
    # permutation is valid and features/labels follow it
    assert sorted(old_of_new) == list(range(N))
    np.testing.assert_array_equal(graph2.x, x[old_of_new])
    np.testing.assert_array_equal(graph2.labels, labels[old_of_new])

    # aggregation equals the original, row-permuted
    s2, d2 = graph2.rel_edges(0)
    got = np.asarray(rel_mean_aggregate(
        jnp.asarray(graph2.x), jnp.asarray(s2), jnp.asarray(d2), N
    ))
    s1, d1 = graph.rel_edges(0)
    want = np.asarray(rel_mean_aggregate(
        jnp.asarray(x), jnp.asarray(s1), jnp.asarray(d1), N
    ))[old_of_new]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    # halos shrink: reordering co-locates the communities
    before = halo_volume(build_halo_plan(s1, d1, N, 4), 16)
    after = halo_volume(build_halo_plan(s2, d2, N, 4), 16)
    assert after["useful_rows"] < before["useful_rows"]


def test_halo_csr_local_matches_segment_local():
    """The scatter-free csr local aggregation (per-shard rectangular Pallas
    blockings over concat(local, halo)) computes the identical node-sharded
    mean as the XLA segment path, for both exchanges, values AND gradients."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec

    from mpgnn_tpu.parallel import make_mesh
    from mpgnn_tpu.parallel.halo import (
        build_halo_csr_operands,
        build_halo_plan,
        halo_sharded_mean_aggregate,
        pad_node_features,
    )

    rng = np.random.default_rng(13)
    N, E, F, Pn = 140, 900, 8, 4
    src = rng.integers(0, N, E).astype(np.int64)
    dst = rng.integers(0, N, E).astype(np.int64)
    x = rng.normal(size=(N, F)).astype(np.float32)
    mesh = make_mesh((Pn,), ("nodes",), jax.devices()[:Pn])

    for exchange in ("a2a", "ppermute"):
        plan = build_halo_plan(src, dst, N, Pn, exchange=exchange)
        x_sh = jax.device_put(
            pad_node_features(x, plan),
            NamedSharding(mesh, PartitionSpec("nodes")),
        )
        statics, arrays = build_halo_csr_operands(plan)

        def seg(x_sh):
            return halo_sharded_mean_aggregate(mesh, x_sh, plan)

        def csr(x_sh):
            return halo_sharded_mean_aggregate(
                mesh, x_sh, plan, csr_statics=statics, csr_arrays=arrays
            )

        a = np.asarray(jax.jit(seg)(x_sh))
        b = np.asarray(jax.jit(csr)(x_sh))
        np.testing.assert_allclose(b, a, rtol=1e-4, atol=1e-5,
                                   err_msg=exchange)

        ga = np.asarray(jax.grad(lambda x: jnp.sum(seg(x) ** 2))(x_sh))
        gb = np.asarray(jax.grad(lambda x: jnp.sum(csr(x) ** 2))(x_sh))
        np.testing.assert_allclose(gb, ga, rtol=1e-4, atol=1e-5,
                                   err_msg=exchange + " grad")


def test_halo_plan_padded_rows_zero():
    from mpgnn_tpu.parallel.halo import (
        build_halo_plan,
        halo_sharded_mean_aggregate,
        pad_node_features,
    )
    from mpgnn_tpu.parallel import make_mesh
    from jax.sharding import NamedSharding, PartitionSpec

    src = np.array([0, 5])
    dst = np.array([5, 0])
    x = np.ones((7, 4), np.float32)       # N=7 pads to 8 with 4 shards
    plan = build_halo_plan(src, dst, 7, 4)
    mesh = make_mesh((4,), ("nodes",), jax.devices()[:4])
    x_sh = jax.device_put(
        pad_node_features(x, plan), NamedSharding(mesh, PartitionSpec("nodes"))
    )
    out = np.asarray(halo_sharded_mean_aggregate(mesh, x_sh, plan))
    assert np.all(out[0] == 1.0) and np.all(out[5] == 1.0)
    assert np.all(out[1:5] == 0.0) and np.all(out[6:] == 0.0)


def _toy_hetero(seed=5, N=96, E=500, F=4, R=3, C=2):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, N, E)
    dst = rng.integers(0, N, E)
    rel = rng.integers(0, R, E)
    x = rng.normal(size=(N, F)).astype(np.float32)
    labels = rng.integers(0, C, N)
    g = HeteroGraph(x, src, dst, rel, num_relations=R)
    return g, split_nodes(labels)


@pytest.mark.slow
def test_node_sharded_train_step_matches_replicated():
    """The node-sharded step (REAL model: multi-metapath concat head) gives
    the same loss trajectory as the single-device mpgnn_forward trainer."""
    from mpgnn_tpu.config import MPGNNConfig
    from mpgnn_tpu.parallel import make_mesh
    from mpgnn_tpu.parallel.halo import build_node_sharded_train_step

    g, split = _toy_hetero()
    mps = [[0, 1], [2, 0]]
    cfg = MPGNNConfig(hidden_dim=8, dropout=0.0)

    mesh = make_mesh((4,), ("nodes",), jax.devices()[:4])
    step, params, opt_state, x_sh = build_node_sharded_train_step(
        mesh, g, mps, split, 2, cfg, seed=0
    )
    losses = []
    k = jax.random.PRNGKey(0)
    for i in range(3):
        params, opt_state, loss = step(params, opt_state, x_sh,
                                       jax.random.fold_in(k, i))
        losses.append(float(loss))
    assert np.isfinite(losses).all()

    # replicated single-device trajectory with the same initial params
    import jax.numpy as jnp
    import optax

    from mpgnn_tpu.models.mpgnn import init_mpgnn, mpgnn_forward
    from mpgnn_tpu.train.loops import build_hop_arrays, make_optimizer

    p0 = init_mpgnn(jax.random.PRNGKey(0), 4, 8, 2, mps)
    ops = build_hop_arrays(g, mps, pad_multiple=8)
    tx = make_optimizer(cfg)
    st = tx.init(p0)
    ref_losses = []
    ti = jnp.asarray(split.train_idx)
    ty = jnp.asarray(split.train_y)
    p = p0
    for i in range(3):
        def lf(p):
            out = mpgnn_forward(p, jnp.asarray(g.x), ops, train=False)
            return -jnp.mean(jnp.take_along_axis(out[ti], ty[:, None], 1))
        loss, grads = jax.value_and_grad(lf)(p)
        upd, st = tx.update(grads, st, p)
        p = optax.apply_updates(p, upd)
        ref_losses.append(float(loss))
    np.testing.assert_allclose(losses, ref_losses, rtol=1e-4, atol=1e-5)


def test_train_mpgnn_halo_backend_matches_single_device():
    """train_mpgnn(backend='halo', mesh=...) — the node-sharded whole-run
    trainer — matches the replicated segment backend on loss AND metrics."""
    from mpgnn_tpu.config import MPGNNConfig
    from mpgnn_tpu.parallel import make_mesh
    from mpgnn_tpu.train.loops import train_mpgnn

    g, split = _toy_hetero(seed=7)
    mps = [[0, 1], [2]]
    cfg = MPGNNConfig(hidden_dim=8, epochs=5, dropout=0.0)

    ref = train_mpgnn(g, mps, split, 2, cfg, seed=3, backend="segment")
    mesh = make_mesh((4,), ("nodes",), jax.devices()[:4])
    got = train_mpgnn(
        g, mps, split, 2, cfg, seed=3, backend="halo", mesh=mesh
    )
    np.testing.assert_allclose(got.final_loss, ref.final_loss,
                               rtol=1e-4, atol=1e-5)
    assert got.val_f1 == ref.val_f1
    assert got.test_f1 == ref.test_f1


def test_train_mpgnn_halo_ppermute_matches_a2a():
    """cfg.halo_exchange='ppermute' (ring rounds, per-round buffer sizes)
    threads through train_mpgnn and produces the identical training run as
    the all_to_all exchange."""
    from mpgnn_tpu.config import MPGNNConfig
    from mpgnn_tpu.parallel import make_mesh
    from mpgnn_tpu.train.loops import train_mpgnn

    g, split = _toy_hetero(seed=11)
    mps = [[0, 1]]
    mesh = make_mesh((4,), ("nodes",), jax.devices()[:4])
    a = train_mpgnn(
        g, mps, split, 2, MPGNNConfig(hidden_dim=8, epochs=5, dropout=0.0),
        seed=3, backend="halo", mesh=mesh,
    )
    b = train_mpgnn(
        g, mps, split, 2,
        MPGNNConfig(hidden_dim=8, epochs=5, dropout=0.0,
                    halo_exchange="ppermute"),
        seed=3, backend="halo", mesh=mesh,
    )
    np.testing.assert_allclose(b.final_loss, a.final_loss,
                               rtol=1e-5, atol=1e-6)
    assert b.val_f1 == a.val_f1 and b.test_f1 == a.test_f1


def test_train_mpgnn_halo_csr_local_matches_segment_local():
    """cfg.halo_local='csr' (scatter-free per-shard local aggregation)
    trains to the same result as the XLA segment-local halo path."""
    from mpgnn_tpu.config import MPGNNConfig
    from mpgnn_tpu.parallel import make_mesh
    from mpgnn_tpu.train.loops import train_mpgnn

    g, split = _toy_hetero(seed=15)
    mps = [[0, 1]]
    mesh = make_mesh((4,), ("nodes",), jax.devices()[:4])
    a = train_mpgnn(
        g, mps, split, 2, MPGNNConfig(hidden_dim=8, epochs=5, dropout=0.0),
        seed=3, backend="halo", mesh=mesh,
    )
    b = train_mpgnn(
        g, mps, split, 2,
        MPGNNConfig(hidden_dim=8, epochs=5, dropout=0.0, halo_local="csr"),
        seed=3, backend="halo", mesh=mesh,
    )
    np.testing.assert_allclose(b.final_loss, a.final_loss,
                               rtol=1e-4, atol=1e-5)
    assert b.val_f1 == a.val_f1 and b.test_f1 == a.test_f1


def test_halo_local_auto_resolves_by_relation_size(monkeypatch):
    """halo_local='auto' (the default) picks the csr local kernel for
    relations past CSR_EDGE_CUTOVER and the segment path below — the
    real-chip anchor (benchmarks/HALO_REAL.json) measured 1.05x vs 7.33x
    halo overhead for the two at north-star shapes. The op tuple carries
    csr statics (index 6) only on the csr path."""
    from mpgnn_tpu.parallel import make_mesh
    from mpgnn_tpu.train import loops

    g, _split = _toy_hetero(seed=21)
    mesh = make_mesh((4,), ("nodes",), jax.devices()[:4])

    def statics_of(ops):
        assert ops[0][0][0] == "halo"
        return ops[0][0][6]

    # every toy relation is far below the real cutover -> segment local
    ops = loops.build_hop_arrays(
        g, [[0]], backend="halo", mesh=mesh, halo_local="auto"
    )
    assert statics_of(ops) is None
    # lower the cutover below the toy edge count -> csr local
    monkeypatch.setattr(loops, "CSR_EDGE_CUTOVER", 1)
    ops = loops.build_hop_arrays(
        g, [[0]], backend="halo", mesh=mesh, halo_local="auto"
    )
    assert statics_of(ops) is not None


def test_train_mpgnn_halo_decomposed_and_bf16():
    """Node-sharded training composes with the basis decomposition,
    class-weighted NLL and the bf16 compute dtype (smoke: finite loss)."""
    from mpgnn_tpu.config import MPGNNConfig
    from mpgnn_tpu.parallel import make_mesh
    from mpgnn_tpu.train.loops import train_mpgnn

    g, split = _toy_hetero(seed=9)
    mesh = make_mesh((4,), ("nodes",), jax.devices()[:4])
    cfg = MPGNNConfig(hidden_dim=8, epochs=3, dropout=0.6, num_bases=2,
                      compute_dtype="bfloat16")
    res = train_mpgnn(
        g, [[0, 1]], split, 2, cfg, seed=0, backend="halo", mesh=mesh,
        class_weighted=True,
    )
    assert np.isfinite(res.final_loss)
    assert 0.0 <= res.val_f1 <= 1.0


def test_halo_csr_local_kernel_independent_of_collective():
    """Overlap evidence (VERDICT r3 item 4): in the split csr halo path the
    LOCAL kernel's inputs must not (transitively) depend on any collective
    output — only the halo-contribution kernel waits on the exchange — so
    the latency-hiding scheduler is free to run local aggregation DURING
    the ppermute ring / all_to_all. Verified by taint analysis on the
    shard_map body jaxpr."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec

    from mpgnn_tpu.parallel.halo import (
        build_halo_csr_operands,
        build_halo_plan,
        halo_sharded_mean_aggregate,
        pad_node_features,
    )
    from mpgnn_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(0)
    N, Pn = 512, 4
    src, dst = rng.integers(0, N, 4000), rng.integers(0, N, 4000)
    mesh = make_mesh((Pn,), ("nodes",), jax.devices()[:Pn])
    for exchange in ("ppermute", "a2a"):
        plan = build_halo_plan(src, dst, N, Pn, exchange=exchange)
        statics, arrays = build_halo_csr_operands(plan)
        x = pad_node_features(rng.normal(size=(N, 8)).astype(np.float32), plan)
        x_sh = jax.device_put(
            x, NamedSharding(mesh, PartitionSpec("nodes"))
        )

        def fn(x):
            return halo_sharded_mean_aggregate(
                mesh, x, plan, csr_statics=statics, csr_arrays=arrays
            )

        jaxpr = jax.make_jaxpr(fn)(x_sh).jaxpr
        body = next(
            e.params["jaxpr"] for e in jaxpr.eqns
            if "shard_map" in e.primitive.name
        )
        collectives = ("ppermute", "all_to_all", "all_gather")
        tainted = set()
        kernel_taints = []
        for eqn in body.eqns:
            name = eqn.primitive.name
            in_tainted = any(
                getattr(v, "count", None) is not None and v in tainted
                for v in eqn.invars
            )
            if name == "custom_vjp_call":
                kernel_taints.append(in_tainted)
            if name in collectives or in_tainted:
                tainted.update(eqn.outvars)
        assert len(kernel_taints) == 2, (exchange, kernel_taints)
        # kernel 1 = local block: independent of every collective output;
        # kernel 2 = halo contribution: downstream of the exchange
        assert kernel_taints[0] is False, exchange
        assert kernel_taints[1] is True, exchange
