"""Full-budget one-vs-rest search on the shipped-scale 3-class synthetic.

VERDICT r1 item 7: exercise run.py's class loop (reference main.py:1214) at
FULL reference budgets (1000-epoch evals, 3 extension hops) on a
signal-bearing multi-class dataset, with checkpoint/resume.

The dataset (data/synthetic_multiclass, regenerate with
``python -m mpgnn_tpu.generate synthetic --num_nodes 5000
--max_rel_for_node 7 --metapath red-red-blue --metapath2 blue-blue-red
--multiclass --seed 21 --out data/synthetic_multiclass``) plants
metapath [1, 0] for class 1 and [2, 3] for class 2; class 0 is background.

Two passes: the first searches all 3 classes and writes a checkpoint per
class; the second reruns the same command and must restore every class
from the checkpoint (proving resume at reference budgets). Prints one JSON
line per pass.
"""

import json
import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

logging.basicConfig(level=logging.INFO, stream=sys.stderr)

from mpgnn_tpu import run as run_cli  # noqa: E402

FOLDER = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "data", "synthetic_multiclass")
CKPT = "/tmp/mc_search_ckpt.pkl"
PLANTED = {1: [1, 0], 2: [2, 3]}   # class -> planted metapath (eval order)


def one_pass(tag):
    t0 = time.time()
    results = run_cli.main([
        "--hidden_dim", "64", "--dataset", "synthetic",
        "--folder", FOLDER,
        "--node_file", "node.dat", "--link_file", "link.dat",
        "--label_file", "label.dat",
        "--epochs", "1000", "--max_hops", "3",
        "--pickle_filename", CKPT,
    ])
    wall = time.time() - t0
    per_class = {}
    for ci, res in results.items():
        planted = PLANTED.get(ci)
        per_class[str(ci)] = {
            "final": res.metapaths,
            "test_f1": round(res.test_f1, 4),
            "planted": planted,
            "recovered": (planted in res.discovered) if planted else None,
        }
    print(json.dumps({"pass": tag, "wall_s": round(wall, 1),
                      "classes": per_class}), flush=True)
    return per_class


if __name__ == "__main__":
    if os.path.exists(CKPT):
        os.remove(CKPT)
    first = one_pass("search")
    second = one_pass("resume")
    assert first == second, "checkpoint resume changed results"
