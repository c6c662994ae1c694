"""Elastic recovery tests on the simulated 8-device CPU mesh."""

import jax
import numpy as np
import pytest

from mpgnn_tpu.config import MPGNNConfig
from mpgnn_tpu.graph.generate import generate_synthetic_graph
from mpgnn_tpu.graph.hetero import HeteroGraph
from mpgnn_tpu.graph.io import split_nodes
from mpgnn_tpu.parallel.elastic import (
    load_train_state,
    resume_train_step,
    save_train_state,
    train_elastic,
)
from mpgnn_tpu.parallel.mesh import make_mesh
from mpgnn_tpu.parallel.shard import build_sharded_train_step


@pytest.fixture(scope="module")
def setup():
    g = generate_synthetic_graph(300, 4, "red-red-blue", seed=5)
    graph = HeteroGraph(
        g["node_features"].astype(np.float32), g["src"], g["dst"], g["rel"],
        num_relations=4, labels=g["labels"],
    )
    split = split_nodes(g["labels"])
    cfg = MPGNNConfig(epochs=1, hidden_dim=8)
    return graph, g, split, cfg


def test_checkpoint_roundtrip_and_mesh_resize(tmp_path, setup):
    graph, g, split, cfg = setup
    mp = [list(g["metapath_relations"])]
    mesh8 = make_mesh((4, 2), devices=jax.devices()[:8])
    step8, p8, o8 = build_sharded_train_step(mesh8, graph, mp, split, 2, cfg)
    ck = str(tmp_path / "ck")
    save_train_state(ck, 3, p8, o8)
    s, ph, oh = load_train_state(ck, p8, o8)
    assert s == 3
    for a, b in zip(
        jax.tree_util.tree_leaves(ph), jax.tree_util.tree_leaves(p8)
    ):
        np.testing.assert_allclose(a, np.asarray(b))

    # resume on HALF the devices: same step math within reduction tolerance
    step4, p4, o4, start, mesh4 = resume_train_step(
        ck, jax.devices()[:4], graph, mp, split, 2, cfg
    )
    assert start == 3
    assert mesh4.devices.size == 4
    rng = jax.random.PRNGKey(9)
    _, _, loss8 = step8(p8, o8, rng)
    _, _, loss4 = step4(p4, o4, rng)
    np.testing.assert_allclose(float(loss8), float(loss4), rtol=1e-4)


def test_train_elastic_recovers_from_injected_fault(tmp_path, setup):
    graph, g, split, cfg = setup
    mp = [list(g["metapath_relations"])]
    fired = {"done": False}

    def fault(step):
        if step == 5 and not fired["done"]:
            fired["done"] = True
            raise RuntimeError("injected chip loss")

    res = train_elastic(
        graph, mp, split, 2, num_steps=12,
        ckpt_path=str(tmp_path / "ck"), cfg=cfg,
        devices=jax.devices()[:8], checkpoint_every=4, seed=0,
        fault_hook=fault,
    )
    assert res.recoveries == 1
    assert res.final_device_count == 4
    assert res.steps_run == 12
    # training kept making progress after the recovery
    assert res.losses[-1] < res.losses[0]
    assert np.isfinite(res.losses).all()


def test_train_elastic_gives_up_below_min_devices(tmp_path, setup):
    graph, g, split, cfg = setup
    mp = [list(g["metapath_relations"])]

    def always_fault(step):
        raise RuntimeError("persistent failure")

    with pytest.raises(RuntimeError, match="persistent"):
        train_elastic(
            graph, mp, split, 2, num_steps=4,
            ckpt_path=str(tmp_path / "ck"), cfg=cfg,
            devices=jax.devices()[:8], min_devices=4, fault_hook=always_fault,
        )
