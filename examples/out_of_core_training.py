"""Out-of-core training demo: memmap features + clustered subgraph SGD.

Simulates a graph whose features live on disk (np.memmap) rather than RAM,
partitions it, and trains an MPGNN with Cluster-GCN-style subgraph SGD —
peak host memory is O(subgraph), not O(graph). With the default halo
(= metapath length) core receptive fields are complete, so quality matches
full-graph training (see tests/test_partition.py).

    python examples/out_of_core_training.py [--nodes 20000] [--parts 16]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import tempfile
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=20_000)
    ap.add_argument("--parts", type=int, default=16)
    ap.add_argument("--blocks-per-step", type=int, default=2)
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument("--platform", type=str, default=None)
    args = ap.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from mpgnn_tpu.utils.prof import enable_compilation_cache

    enable_compilation_cache()

    import numpy as np

    from mpgnn_tpu.config import MPGNNConfig
    from mpgnn_tpu.graph.generate import generate_synthetic_graph
    from mpgnn_tpu.graph.io import split_nodes
    from mpgnn_tpu.graph.partition import PartitionedHeteroGraph
    from mpgnn_tpu.train.stream import train_mpgnn_clustered

    g = generate_synthetic_graph(args.nodes, 6, "red-red-blue", seed=0)
    x = g["node_features"].astype(np.float32)

    # features to disk; reopen read-only as a memmap (the out-of-core shape)
    tmp = tempfile.mkdtemp(prefix="mpgnn_ooc_")
    mm_path = os.path.join(tmp, "x.bin")
    mm = np.memmap(mm_path, dtype=np.float32, mode="w+", shape=x.shape)
    mm[:] = x
    mm.flush()
    x_disk = np.memmap(mm_path, dtype=np.float32, mode="r", shape=x.shape)

    pg = PartitionedHeteroGraph(
        x_disk, g["src"], g["dst"], g["rel"], num_relations=4,
        num_parts=args.parts, labels=g["labels"], seed=0,
    )
    print(repr(pg), file=sys.stderr, flush=True)

    split = split_nodes(g["labels"])
    t0 = time.time()
    res = train_mpgnn_clustered(
        pg, [g["metapath_relations"]], split, 2,
        MPGNNConfig(epochs=args.epochs, hidden_dim=32),
        blocks_per_step=args.blocks_per_step, seed=0,
    )
    print(json.dumps({
        "metric": "out_of_core_clustered_training",
        "nodes": args.nodes, "parts": args.parts,
        "blocks_per_step": args.blocks_per_step,
        "val_f1": round(res.val_f1, 4), "test_f1": round(res.test_f1, 4),
        "wall_s": round(time.time() - t0, 1),
    }))


if __name__ == "__main__":
    main()
