"""Full-budget search runs on the shipped synthetic datasets (TPU)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import logging, time, json
logging.basicConfig(level=logging.INFO)
from mpgnn_tpu.utils.prof import enable_compilation_cache
enable_compilation_cache()
import numpy as np
from mpgnn_tpu.graph import load_synthetic, split_nodes
from mpgnn_tpu.graph.generate import read_planted_metapath
from mpgnn_tpu.search import find_metapaths
from mpgnn_tpu.config import SearchConfig, MPGNNConfig

for name, folder in [
    ("len3", "/root/reference/data/synthetic/metapath_length_3/overlap_0rels_0"),
    ("len4", "/root/reference/data/synthetic/metapath_length_4/overlap_0_rels_0"),
]:
    graph, labels, binlabs = load_synthetic(folder)
    planted = read_planted_metapath(folder)
    split = split_nodes(labels)
    cfg = SearchConfig(mpgnn=MPGNNConfig(epochs=1000, hidden_dim=64))
    t0 = time.time()
    res = find_metapaths(graph, np.asarray(binlabs[0], np.float32), split,
                         num_classes=2, config=cfg, dataset="synthetic", seed=0)
    wall = time.time() - t0
    print(json.dumps({
        "dataset": name, "planted": planted, "final": res.metapaths,
        "test_f1": round(res.test_f1, 4), "wall_s": round(wall, 1),
        "n_discovered": len(res.discovered),
        "recovered": planted in res.discovered,
        "planted_val_f1": res.val_f1_by_path.get(str(planted)),
    }), flush=True)
