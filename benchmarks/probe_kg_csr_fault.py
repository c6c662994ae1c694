"""Bisect the KG final-eval TPU worker crash (round-4).

The companion-KG csr final eval (C=32, L=3) crashed the XLA:TPU worker at
runtime. This probe isolates layers bottom-up on the REAL graph:

  stage kernel : csr_mean_aggregate fwd+bwd per relation (worst offenders)
  stage eval1  : _evaluate_candidates_csr with C=1, low epochs
  stage evalC  : the real crashing chunk shape at low epochs

Run each stage in a FRESH process (a crashed worker poisons the client):
    python benchmarks/probe_kg_csr_fault.py kernel
"""

import sys
import time

sys.path.insert(0, "/root/repo")


def load():
    from mpgnn_tpu.graph.io import load_fb15k237

    graph, labels, _, label_nodes = load_fb15k237(
        "data/powerlaw_kg_small/node.dat",
        "data/powerlaw_kg_small/link.dat",
        "data/powerlaw_kg_small/label.dat",
    )
    return graph, labels, label_nodes


def stage_kernel():
    import jax.numpy as jnp
    import numpy as np

    from mpgnn_tpu.ops.pallas_csr import build_csr_blocking, csr_mean_aggregate
    import jax

    graph, _, _ = load()
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(graph.num_nodes, 64)).astype(np.float32))
    # worst offenders by edge count + the planted path's relations
    rels = [33, 12, 13, 28, 47, 31, 29]
    for r in rels:
        s, d = graph.rel_edges(int(r))
        t0 = time.time()
        fwd, bwd = build_csr_blocking(s, d, graph.num_nodes)
        out = csr_mean_aggregate(x, fwd, bwd)
        g = jax.grad(lambda x_: jnp.sum(
            csr_mean_aggregate(x_, fwd, bwd) ** 2))(x)
        ok = bool(jnp.isfinite(out).all()) and bool(jnp.isfinite(g).all())
        print(f"rel {r}: E={len(s)} fwd+bwd ok={ok} "
              f"({time.time() - t0:.1f}s)", flush=True)


def stage_eval(c: int, epochs: int):
    import numpy as np

    from mpgnn_tpu.config import MPGNNConfig
    from mpgnn_tpu.graph.io import split_nodes
    from mpgnn_tpu.train.batch_eval import _evaluate_candidates_csr

    graph, labels, label_nodes = load()
    split = split_nodes(labels, node_idx=label_nodes)
    # the exact head of the crashing chunk (log 2026-08-20 21:21): rel 33
    # (263k edges) + the planted tail
    group = [[47, 31, 29], [12, 31, 29], [33, 31, 29], [28, 31, 29],
             [36, 31, 29], [27, 31, 29], [38, 31, 29], [11, 31, 29],
             [35, 31, 29], [32, 31, 29], [13, 31, 29], [18, 31, 29],
             [16, 31, 29], [23, 31, 29], [29, 31, 29], [20, 31, 29],
             [10, 31, 29], [42, 31, 29], [17, 31, 29], [15, 31, 29],
             [22, 31, 29], [6, 31, 29], [44, 31, 29], [34, 31, 29],
             [9, 31, 29], [37, 31, 29], [8, 31, 29], [43, 31, 29],
             [2, 31, 29], [1, 31, 29], [5, 31, 29], [14, 31, 29]][:c]
    cfg = MPGNNConfig(hidden_dim=64, epochs=epochs, backend="csr")
    t0 = time.time()
    out = _evaluate_candidates_csr(
        graph, group, split, 2, cfg, 0, np.asarray(graph.x, np.float32))
    print(f"eval C={c} epochs={epochs}: ok, {len(out)} f1s "
          f"({time.time() - t0:.1f}s)", flush=True)


if __name__ == "__main__":
    stage = sys.argv[1]
    if stage == "kernel":
        stage_kernel()
    elif stage == "eval1":
        stage_eval(1, int(sys.argv[2]) if len(sys.argv) > 2 else 30)
    elif stage == "evalC":
        stage_eval(int(sys.argv[2]), int(sys.argv[3]))
    else:
        raise SystemExit(f"unknown stage {stage}")
