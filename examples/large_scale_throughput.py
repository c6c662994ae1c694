"""Large-scale throughput probe: beyond reference scale.

The reference tops out at 5,000-node synthetic graphs and a 14,949-node
FB15K variant (SURVEY §6). This probe trains a 2-hop MPGNN on a generated
graph an order of magnitude larger and reports steady-state edges/s per
backend — the single-chip scaling story (multi-chip: see bench_scaling.py).

    python examples/large_scale_throughput.py [--nodes 50000] [--avg-deg 20]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import argparse
import json
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=50_000)
    ap.add_argument("--avg-deg", type=int, default=20)
    ap.add_argument("--hidden", type=int, default=64)
    ap.add_argument("--epochs", type=int, default=200)
    ap.add_argument("--backends", type=str, default="segment")
    ap.add_argument("--compute_dtype", type=str, default="float32",
                    choices=["float32", "bfloat16"])
    args = ap.parse_args()

    from mpgnn_tpu.utils.prof import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from mpgnn_tpu.config import MPGNNConfig
    from mpgnn_tpu.graph.hetero import HeteroGraph
    from mpgnn_tpu.graph.io import split_nodes
    from mpgnn_tpu.models.mpgnn import init_mpgnn, mpgnn_forward
    from mpgnn_tpu.train.loops import (
        build_hop_arrays, make_optimizer, retag_hop_ops, split_hop_ops,
    )

    rng = np.random.default_rng(0)
    N = args.nodes
    E = N * args.avg_deg
    src = rng.integers(0, N, E)
    dst = rng.integers(0, N, E)
    rel = rng.integers(0, 4, E)
    x = rng.normal(size=(N, 16)).astype(np.float32)
    labels = rng.integers(0, 2, N)
    graph = HeteroGraph(x, src, dst, rel, num_relations=4)
    split = split_nodes(labels)
    print(f"graph: {graph}", file=sys.stderr, flush=True)

    metapath = [0, 1]
    cfg = MPGNNConfig(epochs=args.epochs, hidden_dim=args.hidden)
    edges_per_epoch = sum(int(graph.rel_counts[r]) for r in metapath)
    xj = jnp.asarray(x)
    train_idx = jnp.asarray(split.train_idx)
    train_y = jnp.asarray(split.train_y)
    params0 = init_mpgnn(jax.random.PRNGKey(0), 16, args.hidden, 2, [metapath])
    tx = make_optimizer(cfg)
    from mpgnn_tpu.train.loops import make_dropout_key

    key = make_dropout_key(jax.random.PRNGKey(1), 1, "auto")

    results = {}
    for backend in args.backends.split(","):
        hop_ops = build_hop_arrays(graph, [metapath], backend=backend)
        kinds, data = split_hop_ops(hop_ops)

        dt_c = jnp.bfloat16 if args.compute_dtype == "bfloat16" else jnp.float32

        def loss_fn(p, rng_, ops, fa):
            out = mpgnn_forward(
                p, xj, ops, dropout_rate=cfg.dropout, dropout_rng=rng_,
                train=True, compute_dtype=dt_c, first_hop_agg=fa,
            )
            logp = out[train_idx]
            return -jnp.mean(jnp.take_along_axis(logp, train_y[:, None], 1))

        @jax.jit
        def run(p, d):
            from mpgnn_tpu.models.mpgnn import precompute_first_hop

            ops = retag_hop_ops(kinds, d)
            fa = precompute_first_hop(xj, ops, dt_c)

            def epoch(carry, e):
                p, st = carry
                loss, g = jax.value_and_grad(loss_fn)(
                    p, jax.random.fold_in(key, e), ops, fa
                )
                upd, st = tx.update(g, st, p)
                return (optax.apply_updates(p, upd), st), loss

            (p, _), losses = jax.lax.scan(
                epoch, (p, tx.init(p)), jnp.arange(cfg.epochs)
            )
            return losses[-1]

        t0 = time.time()
        l = float(run(params0, data))   # scalar readback: block_until_ready
        # does NOT block through this image's TPU tunnel (micro_agg.py)
        print(f"[{backend}] compile+first: {time.time()-t0:.1f}s",
              file=sys.stderr, flush=True)
        t0 = time.time()
        l = float(run(params0, data))
        dt = time.time() - t0
        eps = cfg.epochs * edges_per_epoch / dt
        results[backend] = round(eps, 1)
        print(f"[{backend}] {cfg.epochs} epochs in {dt:.2f}s -> "
              f"{eps/1e6:.1f}M edges/s", file=sys.stderr, flush=True)

    print(json.dumps({
        "metric": "large_scale_train_edges_per_s",
        "nodes": N, "edges": E, "compute_dtype": args.compute_dtype,
        "results": results,
    }))


if __name__ == "__main__":
    main()
