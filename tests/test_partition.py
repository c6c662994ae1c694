"""Partitioned-graph / out-of-core subgraph training tests."""

import numpy as np
import pytest

from mpgnn_tpu.config import MPGNNConfig
from mpgnn_tpu.graph.generate import generate_synthetic_graph
from mpgnn_tpu.graph.hetero import HeteroGraph
from mpgnn_tpu.graph.io import split_nodes
from mpgnn_tpu.graph.partition import PartitionedHeteroGraph, partition_nodes
from mpgnn_tpu.train.stream import train_mpgnn_clustered


@pytest.fixture(scope="module")
def planted():
    g = generate_synthetic_graph(800, 4, "red-red-blue", seed=7)
    graph = HeteroGraph(
        g["node_features"].astype(np.float32), g["src"], g["dst"], g["rel"],
        num_relations=4, labels=g["labels"],
    )
    return graph, g


def test_partition_covers_all_nodes_balanced(planted):
    graph, _ = planted
    part = partition_nodes(graph.num_nodes, 4, graph.edge_src, seed=0)
    assert part.shape == (graph.num_nodes,)
    counts = np.bincount(part, minlength=4)
    assert counts.sum() == graph.num_nodes
    assert counts.max() - counts.min() <= graph.num_nodes // 4  # balanced
    # degree balance: block loads within 2x of each other
    deg = np.bincount(graph.edge_src, minlength=graph.num_nodes)
    loads = np.asarray([deg[part == b].sum() for b in range(4)])
    assert loads.max() <= 2 * max(loads.min(), 1)


def test_subgraph_is_exact_induced_subgraph(planted):
    graph, _ = planted
    pg = PartitionedHeteroGraph.from_graph(graph, 4, seed=0)
    sub = pg.subgraph([0, 2])
    nodes = set(pg.block_nodes(0).tolist()) | set(pg.block_nodes(2).tolist())
    assert sub.num_real_nodes == len(nodes)
    # expected induced edges (global ids)
    keep = np.isin(graph.edge_src, list(nodes)) & np.isin(
        graph.edge_dst, list(nodes)
    )
    assert sub.num_real_edges == int(keep.sum())
    # local edges map back to exactly the induced global edge multiset
    g = sub.graph
    real = g.edge_type[: sub.num_real_edges] < pg.num_relations
    assert bool(real.all())
    glo_s = sub.nodes[g.edge_src[: sub.num_real_edges]]
    glo_d = sub.nodes[g.edge_dst[: sub.num_real_edges]]
    got = sorted(zip(glo_s, glo_d, g.edge_type[: sub.num_real_edges]))
    want = sorted(zip(
        graph.edge_src[keep], graph.edge_dst[keep], graph.edge_type[keep]
    ))
    assert got == want
    # padding edges live on the dedicated pad relation only
    assert (g.edge_type[sub.num_real_edges:] == pg.num_relations).all()
    # features of real rows match the global rows
    np.testing.assert_array_equal(
        g.x[: sub.num_real_nodes], graph.x[sub.nodes[: sub.num_real_nodes]]
    )


def test_union_of_all_blocks_recovers_full_graph(planted):
    graph, _ = planted
    pg = PartitionedHeteroGraph.from_graph(graph, 3, seed=1)
    sub = pg.subgraph([0, 1, 2])
    assert sub.num_real_nodes == graph.num_nodes
    assert sub.num_real_edges == graph.num_edges
    assert pg.subgraph([0, 1, 2]) is sub  # cached


def test_memmap_features_never_materialized(tmp_path, planted):
    graph, _ = planted
    mm_path = tmp_path / "x.bin"
    mm = np.memmap(mm_path, dtype=np.float32, mode="w+", shape=graph.x.shape)
    mm[:] = graph.x
    mm.flush()
    x = np.memmap(mm_path, dtype=np.float32, mode="r", shape=graph.x.shape)
    pg = PartitionedHeteroGraph(
        x, graph.edge_src, graph.edge_dst, graph.edge_type,
        graph.num_relations, num_parts=4, labels=graph.labels, seed=0,
    )
    sub = pg.subgraph([1])
    assert isinstance(sub.graph.x, np.ndarray)
    np.testing.assert_array_equal(
        sub.graph.x[: sub.num_real_nodes],
        graph.x[sub.nodes[: sub.num_real_nodes]],
    )


def test_clustered_training_recovers_planted_metapath(planted):
    graph, g = planted
    split = split_nodes(g["labels"])
    pg = PartitionedHeteroGraph.from_graph(graph, 4, seed=0)
    res = train_mpgnn_clustered(
        pg, [g["metapath_relations"]], split, 2,
        MPGNNConfig(epochs=60, hidden_dim=32), blocks_per_step=2, seed=0,
    )
    # default halo = metapath length -> receptive fields complete; quality
    # should match full-graph training
    assert res.val_f1 > 0.95
    assert res.test_f1 > 0.9


def test_halo_subgraph_forward_matches_full_graph(planted):
    """Core-node predictions on a halo-expanded subgraph are EXACTLY the
    full-graph predictions (receptive fields complete)."""
    import jax
    import jax.numpy as jnp

    from mpgnn_tpu.models.mpgnn import init_mpgnn, mpgnn_forward
    from mpgnn_tpu.train.loops import build_hop_arrays

    graph, g = planted
    mp = [list(g["metapath_relations"])]
    params = init_mpgnn(jax.random.PRNGKey(3), graph.feat_dim, 16, 2, mp)
    full = np.asarray(mpgnn_forward(
        params, jnp.asarray(graph.x), build_hop_arrays(graph, mp),
        train=False,
    ))

    pg = PartitionedHeteroGraph.from_graph(graph, 4, seed=0)
    sub = pg.subgraph([1, 3], halo_hops=len(mp[0]))
    out = np.asarray(mpgnn_forward(
        params, jnp.asarray(sub.graph.x),
        build_hop_arrays(sub.graph, mp), train=False,
    ))
    core = sub.core_mask
    np.testing.assert_allclose(
        out[core], full[sub.nodes[core]], rtol=1e-5, atol=1e-5
    )
    # halo-0 subgraph does NOT match (cut edges change aggregation)
    sub0 = pg.subgraph([1, 3], halo_hops=0)
    out0 = np.asarray(mpgnn_forward(
        params, jnp.asarray(sub0.graph.x),
        build_hop_arrays(sub0.graph, mp), train=False,
    ))
    assert not np.allclose(
        out0[sub0.core_mask], full[sub0.nodes[sub0.core_mask]],
        rtol=1e-5, atol=1e-5,
    )


def test_edge_cut_fraction_monotone(planted):
    graph, _ = planted
    pg = PartitionedHeteroGraph.from_graph(graph, 4, seed=0)
    cuts = [pg.edge_cut_fraction(q) for q in (1, 2, 4)]
    assert cuts[0] >= cuts[1] >= cuts[2]
    assert cuts[2] == pytest.approx(0.0)


@pytest.mark.slow
def test_fused_clustered_matches_streaming_quality():
    """fused=True (whole run as one device program) reaches the same
    planted-task quality as the streamed per-step mode — same group
    order and dropout counter, masks drawn at the common padded shape."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from mpgnn_tpu.config import MPGNNConfig
    from mpgnn_tpu.graph.generate import generate_synthetic_graph
    from mpgnn_tpu.graph.io import split_nodes
    from mpgnn_tpu.graph.partition import PartitionedHeteroGraph
    from mpgnn_tpu.train.stream import train_mpgnn_clustered

    # 5 parts with blocks_per_step=2 -> a 2+2+1 grouping whose subgraphs
    # land in DIFFERENT pow2 node buckets (regression: the fused eval's
    # common-width prediction rows must be sliced back to each group's
    # own n_pad before the core-mask scatter)
    g = generate_synthetic_graph(3000, 6, "red-red-blue", seed=2)
    pg = PartitionedHeteroGraph(
        g["node_features"].astype(np.float32), g["src"], g["dst"],
        g["rel"], 4, 5, labels=g["labels"],
    )
    split = split_nodes(g["labels"])
    mp = [g["metapath_relations"]]
    cfg = MPGNNConfig(epochs=40, hidden_dim=16)
    r_stream = train_mpgnn_clustered(pg, mp, split, 2, cfg, fused=False)
    r_fused = train_mpgnn_clustered(pg, mp, split, 2, cfg, fused=True)
    assert r_fused.test_f1 >= r_stream.test_f1 - 0.05
    assert r_fused.test_f1 >= 0.9
    # fused csr: common-layout stacked blockings, scatter-free visits
    r_csr = train_mpgnn_clustered(
        pg, mp, split, 2, cfg, backend="csr", fused=True
    )
    assert r_csr.test_f1 >= r_stream.test_f1 - 0.05
    assert r_csr.test_f1 >= 0.9
