"""KG-scale search stress run (VERDICT r2 item 3).

Runs the FULL metapath search end-to-end on a power-law, many-relation,
million-edge synthetic KG (SURVEY §2.1 configs #3/#4 shape: FB15K-like
statistics at beyond-FB15K size) — the scale the host-side machinery and
the chunked sweeps were hardened for in round 3:

    python -m mpgnn_tpu.generate powerlaw --num_nodes 200000 \
        --num_edges 2000000 --num_relations 237 --metapath_len 3 \
        --seed 5 --out data/powerlaw_kg
    python examples/run_powerlaw_kg.py --folder data/powerlaw_kg

Emits one JSON line: wall, per-phase timings, whether the planted path was
recovered, and the final test macro-F1. Budgets default to the reference's
(scorer 100/50-epoch, 1000-epoch final evals; main.py:755/890/1121).

The TPU tunnel worker in this image dies unpredictably under sustained
load (docs/DESIGN.md §5c); with ``--frontier`` every hop AND every
completed final-eval chunk is checkpointed, so the production pattern is
a retry loop — each attempt resumes where the last died, bit-for-bit:

    for i in 1 2 3; do python examples/run_powerlaw_kg.py \
        --folder data/powerlaw_kg --frontier /tmp/fr.pkl && break; done
``--bag_gap_inclusive`` defaults ON: the reference's strict-< bag cut
(main.py:1424) blocks extension on many-relation vocabularies (BASELINE.md
round-1 grid study).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--folder", type=str, default="data/powerlaw_kg")
    ap.add_argument("--platform", type=str, default=None)
    ap.add_argument("--epochs", type=int, default=1000)
    ap.add_argument("--hidden_dim", type=int, default=64)
    ap.add_argument("--max_hops", type=int, default=None,
                    help="extension hops; default = planted length - 1")
    ap.add_argument("--no_warmer", action="store_true")
    ap.add_argument("--backend", type=str, default="auto",
                    help="MPGNN aggregation backend (default 'auto'; "
                         "'csr' forces every final-eval group onto the "
                         "epoch-blocked scatter-free path — the most "
                         "tunnel-robust choice, docs/DESIGN.md §5c)")
    ap.add_argument("--max_extensions_per_state", type=int, default=None,
                    help="bounded-frontier beam width (None = reference "
                         "parity; the 237-relation KG's faithful cut keeps "
                         "236/237 hop-1 extensions and cannot finish)")
    ap.add_argument("--frontier", type=str, default=None,
                    help="frontier checkpoint path: the search resumes "
                         "from the last completed hop after a crash/stall "
                         "(this image's TPU tunnel freezes mid-process "
                         "for 20+ min on occasion; docs/DESIGN.md §3)")
    args = ap.parse_args()

    import faulthandler
    import signal

    # SIGUSR1 dumps every thread's Python stack: the image's TPU tunnel
    # freezes mid-process on occasion (docs/DESIGN.md §3) and this shows
    # which device call is stuck without killing the run
    faulthandler.register(signal.SIGUSR1)

    import logging

    logging.basicConfig(
        level=logging.INFO, stream=sys.stderr,
        format="%(asctime)s %(name)s %(message)s",
    )

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from mpgnn_tpu.utils.prof import enable_compilation_cache

    enable_compilation_cache()

    import numpy as np

    from mpgnn_tpu.config import MPGNNConfig, SearchConfig
    from mpgnn_tpu.graph.io import load_fb15k237, split_nodes
    from mpgnn_tpu.search.engine import find_metapaths

    with open(os.path.join(args.folder, "metapath.dat")) as fh:
        lines = fh.read().splitlines()
    planted = [int(v) for v in lines[1].split()]

    t0 = time.time()
    graph, labels, _, label_nodes = load_fb15k237(
        os.path.join(args.folder, "node.dat"),
        os.path.join(args.folder, "link.dat"),
        os.path.join(args.folder, "label.dat"),
    )
    t_load = time.time() - t0
    print(f"loaded: {graph.num_nodes} nodes, {graph.num_edges} edges, "
          f"{graph.num_relations} relations, {len(label_nodes)} labeled "
          f"({t_load:.1f}s); planted {planted}", file=sys.stderr, flush=True)

    split = split_nodes(labels, node_idx=label_nodes)
    hops = args.max_hops if args.max_hops is not None else len(planted) - 1
    cfg = SearchConfig(
        max_extension_hops=hops,
        bag_gap_inclusive=True,
        max_extensions_per_state=args.max_extensions_per_state,
        # backend='auto' routes the batched final eval's KG-heavy length
        # groups onto the scatter-free csr path (resolve_eval_backend) and
        # single-model training past 1M edges/relation likewise — the whole
        # point of this stress runner; the 'segment' default would pin the
        # dominant phase to the entry-capped near-serial scatter batch
        mpgnn=MPGNNConfig(hidden_dim=args.hidden_dim, epochs=args.epochs,
                          backend=args.backend),
    )
    from mpgnn_tpu.utils.warm import get_warmer

    warmer = get_warmer(enabled=not args.no_warmer)
    if warmer is not None:
        warmer.poke_device()

    t0 = time.time()
    res = find_metapaths(
        graph, labels.astype(np.float32), split, 2, cfg,
        source_nodes=label_nodes, seed=0, warmer=warmer,
        frontier_checkpoint=args.frontier,
    )
    wall = time.time() - t0
    discovered = [list(p) for p in res.discovered]
    out = {
        "metric": "powerlaw_kg_search",
        "nodes": graph.num_nodes,
        "edges": graph.num_edges,
        "relations": graph.num_relations,
        "labeled": len(label_nodes),
        "planted": planted,
        "recovered": planted in discovered,
        "final_metapaths": [list(p) for p in res.metapaths],
        "test_f1": round(res.test_f1, 4),
        "candidates_evaluated": len(discovered),
        "max_extensions_per_state": args.max_extensions_per_state,
        "load_s": round(t_load, 1),
        "search_wall_s": round(wall, 1),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
