"""Batched final-eval backends at north-star scale (VERDICT r2 item 2).

The search's dominant phase is the final candidate evaluation — C models
trained 1000 epochs each (reference fan-out, main.py:1444-1459). Past ~1M
edges/relation the vmapped segment batch runs on XLA's batched scatter;
this benchmark measures it against the csr path (per-candidate Pallas
sorted-CSR calls under one program) at N=500k / E=10M total edges.

A full 30x1000-epoch eval at this scale is hours of device time; the
steady-state epoch rate is what the backends differ in, so this measures
C candidates x EPOCHS epochs and reports seconds per (candidate x epoch),
from which the full-budget wall extrapolates linearly (the epoch scan body
is identical every iteration).

Run:  python benchmarks/bench_batched_eval.py [C] [EPOCHS] [BACKENDS]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    c_cand = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    backends = (sys.argv[3].split(",") if len(sys.argv) > 3
                else ["csr", "segment"])
    n, e, f_hid = 500_000, 10_000_000, 64

    from mpgnn_tpu.utils.prof import enable_compilation_cache

    enable_compilation_cache()

    from mpgnn_tpu.config import MPGNNConfig
    from mpgnn_tpu.graph.hetero import HeteroGraph
    from mpgnn_tpu.graph.io import split_nodes
    from mpgnn_tpu.train.batch_eval import evaluate_candidates

    rng = np.random.default_rng(0)
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    rel = rng.integers(0, 4, e)
    x = rng.normal(size=(n, 16)).astype(np.float32)
    labels = rng.integers(0, 2, n)
    graph = HeteroGraph(x, src, dst, rel, num_relations=4, labels=labels)
    split = split_nodes(labels)
    # length-2 candidates over the 4 relations (hop 0 cached per candidate,
    # hop 1 in the epoch scan — the hidden-width aggregation that dominates)
    paths = [[i % 4, (i + 1) % 4] for i in range(c_cand)]
    cfg = MPGNNConfig(epochs=epochs, hidden_dim=f_hid)

    out = {"n": n, "e": e, "candidates": c_cand, "epochs": epochs,
           "hidden": f_hid}
    for backend in backends:
        t0 = time.time()
        try:
            r = evaluate_candidates(graph, paths, split, 2, cfg, seed=0,
                                    backend=backend)
        except Exception as exc:
            # measured at N=500k/E=10M/C=8: the vmapped segment batch
            # cannot even COMPILE on one v5e (21.2 GB HBM demand, 4.8 GB of
            # it scatter-operand padding) — record the failure, it IS the
            # result
            msg = repr(exc)
            out[backend] = {"error": msg[:300]}
            print(f"[{backend}] FAILED: {msg[:200]}",
                  file=sys.stderr, flush=True)
            continue
        t_first = time.time() - t0
        print(f"[{backend}] compile+first: {t_first:.1f}s",
              file=sys.stderr, flush=True)
        t0 = time.time()
        r = evaluate_candidates(graph, paths, split, 2, cfg, seed=0,
                                backend=backend)
        wall = time.time() - t0
        per_ce = wall / (c_cand * epochs)
        out[backend] = {
            "wall_s": round(wall, 2),
            "s_per_candidate_epoch": round(per_ce, 4),
            "projected_30x1000_h": round(per_ce * 30 * 1000 / 3600, 2),
        }
        print(f"[{backend}] {c_cand} candidates x {epochs} epochs: "
              f"{wall:.2f}s -> {per_ce*1e3:.1f} ms/(cand*epoch); "
              f"30x1000 would take {out[backend]['projected_30x1000_h']:.2f}h "
              f"(sample val f1 {list(r.values())[0]:.3f})",
              file=sys.stderr, flush=True)
    if (isinstance(out.get("segment"), dict)
            and "s_per_candidate_epoch" in out.get("segment", {})
            and "s_per_candidate_epoch" in out.get("csr", {})):
        out["csr_speedup"] = round(
            out["segment"]["s_per_candidate_epoch"]
            / out["csr"]["s_per_candidate_epoch"], 2,
        )
    print(json.dumps({"metric": "batched_eval_backends", **out}))


if __name__ == "__main__":
    main()
