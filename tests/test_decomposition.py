"""num_bases / num_blocks weight decompositions (reference CustomRGCNConv,
mp_rgcn_layer.py:120-137, 202-220) as usable model features, plus the
HBM-aware 'auto' backend and batched-eval backend honesty (round-2 VERDICT
items 6 and 8)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpgnn_tpu.config import MPGNNConfig
from mpgnn_tpu.graph.generate import generate_synthetic_graph
from mpgnn_tpu.graph.hetero import HeteroGraph
from mpgnn_tpu.graph.io import split_nodes
from mpgnn_tpu.models.mpgnn import (
    MPGNNParams,
    init_mpgnn,
    init_rgcn_net,
    mpgnn_forward,
    rgcn_effective_weights,
)
from mpgnn_tpu.models.relconv import (
    RelConvBasisParams,
    RelConvBlockParams,
    RelConvParams,
    relconv_effective_weight,
)
from mpgnn_tpu.train.loops import build_hop_arrays, train_mpgnn


@pytest.fixture(scope="module")
def planted():
    g = generate_synthetic_graph(400, 4, "red-red-blue", seed=7)
    graph = HeteroGraph(
        g["node_features"].astype(np.float32), g["src"], g["dst"], g["rel"],
        num_relations=4, labels=g["labels"],
    )
    return graph, g


def _materialized(params: MPGNNParams) -> MPGNNParams:
    """Plain-conv params with each decomposed weight materialized dense."""
    convs = tuple(
        tuple(
            RelConvParams(
                weight=relconv_effective_weight(c), root=c.root, bias=c.bias
            )
            for c in stack
        )
        for stack in params.convs
    )
    return params._replace(convs=convs)


@pytest.mark.parametrize("kw", [{"num_bases": 3}, {"num_blocks": 2}])
def test_decomposed_forward_matches_materialized_dense(planted, kw):
    graph, _ = planted
    paths = [[1, 0], [2]]
    params = init_mpgnn(
        jax.random.PRNGKey(0), graph.feat_dim, 16, 2, paths, **kw
    )
    # param types reflect the decomposition
    want = RelConvBasisParams if "num_bases" in kw else RelConvBlockParams
    assert all(isinstance(c, want) for s in params.convs for c in s)
    hop_ops = build_hop_arrays(graph, paths, backend="segment")
    out_dec = mpgnn_forward(params, jnp.asarray(graph.x), hop_ops)
    out_dense = mpgnn_forward(
        _materialized(params), jnp.asarray(graph.x), hop_ops
    )
    np.testing.assert_allclose(
        np.asarray(out_dec), np.asarray(out_dense), atol=1e-5
    )


def test_bases_take_precedence_like_reference_ctor(planted):
    graph, _ = planted
    p = init_mpgnn(
        jax.random.PRNGKey(0), graph.feat_dim, 16, 2, [[0]],
        num_bases=2, num_blocks=2,
    )
    assert isinstance(p.convs[0][0], RelConvBasisParams)


def test_block_divisibility_error():
    with pytest.raises(ValueError, match="num_blocks"):
        init_mpgnn(jax.random.PRNGKey(0), 3, 16, 2, [[0]], num_blocks=2)


@pytest.mark.parametrize("kw", [{"num_bases": 2}, {"num_blocks": 2}])
def test_train_mpgnn_with_decomposition(planted, kw):
    graph, g = planted
    split = split_nodes(g["labels"])
    cfg = MPGNNConfig(epochs=120, hidden_dim=16, **kw)
    res = train_mpgnn(graph, [[1, 0]], split, 2, cfg, seed=0)
    assert np.isfinite(res.final_loss)
    # the planted metapath is [1, 0]: even tiny decomposed models separate it
    assert res.val_f1 > 0.8


@pytest.mark.parametrize("kw", [{"num_bases": 2}, {"num_blocks": 2}])
def test_rgcn_baseline_with_decomposition(planted, kw):
    from mpgnn_tpu.rgcn_baseline import train_rgcn_baseline

    graph, g = planted
    split = split_nodes(g["labels"])
    res = train_rgcn_baseline(
        graph, g["labels"], split, 2, metapath_length=2,
        cfg=MPGNNConfig(epochs=60, hidden_dim=16, **kw),
    )
    assert np.isfinite(res["final_loss"])
    assert res["val_f1"] > 0.5


def test_rgcn_effective_weights_shapes():
    p = init_rgcn_net(jax.random.PRNGKey(1), 4, 8, 3, 8, 2, num_bases=2)
    assert rgcn_effective_weights(p.conv1).shape == (3, 4, 8)
    p = init_rgcn_net(jax.random.PRNGKey(1), 4, 8, 3, 8, 2, num_blocks=2)
    w = rgcn_effective_weights(p.conv1)
    assert w.shape == (3, 4, 8)
    # off-diagonal blocks are exactly zero
    assert np.all(np.asarray(w)[:, :2, 4:] == 0)
    assert np.all(np.asarray(w)[:, 2:, :4] == 0)


# --------------------------- HBM-aware auto backend / batched-eval honesty
def test_auto_dense_budget_is_positive_and_device_derived():
    from mpgnn_tpu.train.loops import auto_dense_budget_bytes

    b = auto_dense_budget_bytes()
    assert isinstance(b, int) and b > 0


def test_resolve_backend_budget_cutover(planted):
    from mpgnn_tpu.train.loops import resolve_backend

    graph, _ = planted
    assert resolve_backend("auto", graph, [[0]], budget_bytes=1 << 40) == "dense"
    assert resolve_backend("auto", graph, [[0]], budget_bytes=1) == "segment"
    assert resolve_backend("ell", graph, [[0]], budget_bytes=1) == "ell"


def test_batched_eval_rejects_explicit_unsupported_backend(planted):
    from mpgnn_tpu.train.batch_eval import evaluate_candidates

    graph, g = planted
    split = split_nodes(g["labels"])
    cfg = MPGNNConfig(epochs=5, hidden_dim=8)
    with pytest.raises(ValueError, match="batched candidate evaluation"):
        evaluate_candidates(graph, [[0]], split, 2, cfg, backend="ell")


def test_batched_eval_cfg_fallback_warns_but_runs(planted, caplog):
    from mpgnn_tpu.train.batch_eval import evaluate_candidates

    graph, g = planted
    split = split_nodes(g["labels"])
    cfg = MPGNNConfig(epochs=5, hidden_dim=8, backend="ell")
    with caplog.at_level("WARNING", logger="mpgnn_tpu.batch_eval"):
        out = evaluate_candidates(graph, [[0]], split, 2, cfg)
    assert "[0]" in out
    assert any("batched-eval" in r.message for r in caplog.records)
