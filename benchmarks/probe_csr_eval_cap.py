"""Find the csr batched-eval program-size cliff on the real chip.

The powerlaw-KG final eval crashed the XLA:TPU worker on a C=32, L=3 csr
program (32 serialized candidate scans x 6 distinct Pallas grids each).
Scan length is irrelevant to program size, so epochs=10 reproduces the
structure cheaply. Sweeps C from small to large on the SAME candidate
group shape the crash hit ([r, 31, 29] over the relation list), printing
a line per C — run under timeout; the first C that dies marks the cap.

Run:  python benchmarks/probe_csr_eval_cap.py [FOLDER] [C...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    folder = sys.argv[1] if len(sys.argv) > 1 else "data/powerlaw_kg_small"
    cs = [int(v) for v in sys.argv[2:]] or [8, 16, 32]

    from mpgnn_tpu.utils.prof import enable_compilation_cache

    enable_compilation_cache()

    from mpgnn_tpu.config import MPGNNConfig
    from mpgnn_tpu.graph.io import load_fb15k237, split_nodes
    from mpgnn_tpu.train import batch_eval

    graph, labels, _, label_nodes = load_fb15k237(
        os.path.join(folder, "node.dat"),
        os.path.join(folder, "link.dat"),
        os.path.join(folder, "label.dat"),
    )
    split = split_nodes(labels, node_idx=label_nodes)
    cfg = MPGNNConfig(epochs=10, hidden_dim=64)
    rels = np.argsort(-graph.rel_counts)  # heaviest first (worst case)
    for c in cs:
        paths = [[int(r), 31, 29] for r in rels[:c]]
        t0 = time.time()
        # monkeypatch the HBM-derived cap so ONE program carries all C
        batch_eval._csr_chunk_cap = lambda g, cf: max(cs)
        out = batch_eval.evaluate_candidates(
            graph, paths, split, 2, cfg, seed=0, backend="csr"
        )
        print(f"C={c:3d}  OK  {time.time()-t0:7.1f}s  "
              f"(best {max(out.values()):.3f})", flush=True)


if __name__ == "__main__":
    main()
