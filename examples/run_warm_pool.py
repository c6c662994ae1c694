"""One warmed process across multiple searches (VERDICT r4 item 4).

The TPU tunnel charges every fresh process a stochastic 5-14 min
first-dispatch stall plus per-signature compiles (docs/DESIGN.md §3).
Round 4's runs paid that per experiment: the FB15K continent 4-class
search (648.5 s) and the kg_small search each in their own process. This
driver sequences BOTH through one resident process — one device poke, one
warm compile-ahead pool, one persistent-cache-backed program store —
and records the per-phase walls, so BASELINE.md can quote the wall cut
of amortizing the process overhead across a whole experiment batch
(the reference's per-rank process model pays it per mpiexec rank,
run.sh:32).

    python examples/run_warm_pool.py [--skip_fb15k] [--skip_kg]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip_fb15k", action="store_true")
    ap.add_argument("--skip_kg", action="store_true")
    ap.add_argument("--out_prefix", type=str, default="/tmp/warm_pool")
    args = ap.parse_args()

    import logging

    logging.basicConfig(level=logging.INFO, stream=sys.stderr,
                        format="%(asctime)s %(name)s %(message)s")

    from mpgnn_tpu.utils.prof import enable_compilation_cache

    enable_compilation_cache()

    from mpgnn_tpu import run as run_cli

    phases = {}
    t_all = time.time()

    if not args.skip_fb15k:
        t0 = time.time()
        run_cli.main([
            "--hidden_dim", "64", "--dataset", "fb15k-237",
            "--folder", "data/fb15k-237-continent",
            "--node_file", "node.dat", "--link_file", "link.dat",
            "--label_file", "label.dat",
            "--bag_gap_inclusive", "--max_extensions_per_state", "8",
            "--backend", "csr",
            "--frontier", args.out_prefix + "_fb15k_frontier",
            "--pickle_filename", args.out_prefix + "_fb15k_results.pkl",
        ])
        phases["fb15k_continent_4class_s"] = round(time.time() - t0, 1)

    if not args.skip_kg:
        # same process: the warmer is already poked, the device already
        # dispatched once, sweep/eval program families already resident
        t0 = time.time()
        import examples.run_powerlaw_kg  # noqa: F401  (path bootstrap)

        sys.argv = [
            "run_powerlaw_kg.py", "--folder", "data/powerlaw_kg_small",
            "--backend", "csr",
            "--frontier", args.out_prefix + "_kg_frontier.pkl",
        ]
        examples.run_powerlaw_kg.main()
        phases["kg_small_search_s"] = round(time.time() - t0, 1)

    phases["total_wall_s"] = round(time.time() - t_all, 1)
    print(json.dumps({"metric": "warm_pool_batch", **phases}), flush=True)


if __name__ == "__main__":
    main()
