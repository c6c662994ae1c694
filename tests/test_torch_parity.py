"""Per-layer activation parity against a PyTorch execution of the reference
conv math with IDENTICAL weights (BASELINE target: allclose given identical
weights). torch_geometric is not in this image, so the torch side is an
independent implementation of CustomRGCNConv's documented semantics
(mp_rgcn_layer.py:158-271): per-relation scatter-mean (index_add), @ weight,
+ x @ root + bias — the exact ops PyG's MessagePassing(mean) executes."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from mpgnn_tpu.graph.hetero import HeteroGraph
from mpgnn_tpu.models import init_mpgnn, mpgnn_forward
from mpgnn_tpu.train.loops import build_hop_arrays


def torch_relconv(h, src, dst, W, root, b):
    N = h.shape[0]
    agg = torch.zeros(N, h.shape[1], dtype=h.dtype)
    agg.index_add_(0, src, h[dst])
    cnt = torch.zeros(N, dtype=h.dtype).index_add_(
        0, src, torch.ones(len(src), dtype=h.dtype)
    )
    nz = cnt > 0
    agg[nz] = agg[nz] / cnt[nz].unsqueeze(-1)
    return agg @ W + h @ root + b


def test_mpgnn_activations_match_torch_per_layer():
    rng = np.random.default_rng(0)
    N, E, R, F, H = 60, 240, 3, 5, 7
    src = rng.integers(0, N, E)
    dst = rng.integers(0, N, E)
    rel = rng.integers(0, R, E)
    x = rng.normal(size=(N, F)).astype(np.float64)
    g = HeteroGraph(x.astype(np.float32), src, dst, rel, num_relations=R)

    metapaths = [[0, 2], [1, 0]]
    params = init_mpgnn(jax.random.PRNGKey(7), F, H, 2, metapaths)
    ops = build_hop_arrays(g, metapaths, pad_multiple=8)
    jax_out = np.asarray(
        mpgnn_forward(params, jnp.asarray(g.x), ops, train=False)
    )

    # identical weights into the torch re-execution, layer by layer
    embs = []
    for i, mp in enumerate(metapaths):
        h = torch.from_numpy(x)
        for j, r in enumerate(mp):
            s, d = g.rel_edges(r)
            conv = params.convs[i][j]
            h = torch_relconv(
                h,
                torch.from_numpy(s.astype(np.int64)),
                torch.from_numpy(d.astype(np.int64)),
                torch.from_numpy(np.asarray(conv.weight, np.float64)),
                torch.from_numpy(np.asarray(conv.root, np.float64)),
                torch.from_numpy(np.asarray(conv.bias, np.float64)),
            )
            h = torch.relu(h)
        embs.append(h)
    cat = torch.cat(embs, dim=1)
    h = torch.relu(
        cat @ torch.from_numpy(np.asarray(params.fc1.w, np.float64))
        + torch.from_numpy(np.asarray(params.fc1.b, np.float64))
    )
    h = h @ torch.from_numpy(np.asarray(params.fc2.w, np.float64)) + \
        torch.from_numpy(np.asarray(params.fc2.b, np.float64))
    torch_out = torch.log_softmax(h, dim=1).numpy()

    np.testing.assert_allclose(jax_out, torch_out, rtol=1e-4, atol=1e-4)


def test_scorer_forward_matches_torch_reference_loops():
    """Flat scorer forward vs a literal torch re-execution of the
    reference's OutputLayer plain branch (model.py:74-89): per-source
    argmax over neighbor weights, prediction = weight at argmax."""
    from mpgnn_tpu.models.scorer import ScorerParams, scorer_forward_flat

    rng = np.random.default_rng(1)
    N, E = 30, 90
    src = rng.integers(0, N, E)
    dst = rng.integers(0, N, E)
    g = HeteroGraph(
        np.ones((N, 2), np.float32), src, dst, np.zeros(E, np.int64),
        num_relations=1,
    )
    w = torch.from_numpy(rng.random(N).astype(np.float32))

    # torch reference: dict-of-lists adjacency in file order
    node_dict = {}
    s0, d0 = g.rel_edges(0)
    for s, d in zip(s0.tolist(), d0.tolist()):
        node_dict.setdefault(s, []).append(d)
    max_weights = torch.zeros(N)
    for source, nbrs in node_dict.items():
        weights_of_source = w[nbrs]
        max_node = nbrs[int(torch.argmax(weights_of_source))]
        max_weights[source] = w[max_node]

    nbr, mask = g.neighbor_table(0)
    sources = sorted(node_dict.keys())
    pred, winner = scorer_forward_flat(
        ScorerParams(w=jnp.asarray(w.numpy()), u=jnp.zeros(2)),
        jnp.asarray(nbr), jnp.asarray(mask),
        jnp.asarray(np.asarray(sources)), jnp.ones(len(sources)),
    )
    np.testing.assert_allclose(
        np.asarray(pred), max_weights.numpy()[sources], rtol=1e-6
    )
