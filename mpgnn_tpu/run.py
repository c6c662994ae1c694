"""Main CLI — full metapath search over a dataset.

Parity target: reference ``main.py`` argparse + ``main(args)``
(main.py:1191-1508) and ``run.sh``. Where the reference needs
``mpiexec -n 10 python main.py ...`` this is a single process driving one
TPU (or a slice via jax.distributed):

    python -m mpgnn_tpu.run --hidden_dim 64 --dataset synthetic \
        --folder data/synthetic/metapath_length_3/overlap_0rels_0/ \
        --node_file node.dat --link_file link.dat --label_file label.dat
"""

from __future__ import annotations

import argparse
import json
import logging
import sys
import time

import numpy as np


def _supervise(args, argv) -> int:
    """Run the search in a child process, restarting on failure.

    A dead TPU runtime poisons the parent's JAX client state, so retry
    NEEDS a process boundary. Checkpoint flags (--frontier,
    --pickle_filename) make each restart resume, not recompute."""
    import subprocess

    base = list(sys.argv[1:] if argv is None else argv)
    # strip --retries so the child runs the search directly
    child_args = []
    skip = False
    for a in base:
        if skip:
            skip = False
            continue
        if a == "--retries":
            skip = True
            continue
        if a.startswith("--retries="):
            continue
        child_args.append(a)
    cmd = [sys.executable, "-m", "mpgnn_tpu.run"] + child_args
    for attempt in range(1, args.retries + 2):
        rc = subprocess.call(cmd)
        if rc == 0:
            return 0
        print(
            f"[supervisor] attempt {attempt} exited rc={rc}"
            + ("; retrying (checkpoints resume the search)"
               if attempt <= args.retries else "; giving up"),
            file=sys.stderr, flush=True,
        )
        time.sleep(10)
    return rc


def build_argparser() -> argparse.ArgumentParser:
    # flag set mirrors main.py:1489-1506
    p = argparse.ArgumentParser(description="learning meta-paths (TPU-native)")
    p.add_argument("--hidden_dim", type=int, required=True, help="hidden dimension")
    p.add_argument("--dataset", type=str, required=True,
                   help="synthetic | fb15k-237 | DBLP | IMDB | ACM")
    p.add_argument("--folder", type=str, required=True, help="dataset folder")
    p.add_argument("--node_file", type=str, required=True)
    p.add_argument("--link_file", type=str, required=True)
    p.add_argument("--label_file", type=str, required=True)
    p.add_argument("--relations_legend_file", type=str, required=False)
    p.add_argument("--pickle_filename", type=str, required=False,
                   help="search-state checkpoint path (resume supported)")
    # framework extensions (named config instead of hard-coded constants)
    p.add_argument("--epochs", type=int, default=1000, help="MPGNN eval epochs")
    p.add_argument("--max_hops", type=int, default=3, help="extension hops")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--backend", type=str, default="auto",
                   choices=["auto", "segment", "ell", "ell2", "dense",
                            "pallas", "onehot", "csr"],
                   help="MPGNN aggregation backend; 'auto' picks dense "
                        "(MXU GEMM) when the relations' adjacencies fit "
                        "HBM, segment otherwise")
    p.add_argument("--platform", type=str, default=None,
                   help="force jax platform (e.g. cpu)")
    p.add_argument("--mesh", type=str, default=None,
                   help="run the search sweeps + final eval across a device "
                        "mesh, e.g. '--mesh 8', '--mesh rel=8' or "
                        "'--mesh data=4,model=2' (relation/candidate batch "
                        "axes are sharded over ALL mesh devices — the "
                        "TPU-native form of the reference's "
                        "'mpiexec -n 10' fan-out, run.sh:32)")
    p.add_argument("--save_model", type=str, default=None,
                   help="directory to save the final joint model's "
                        "parameters (orbax) per class")
    p.add_argument("--trace_dir", type=str, default=None,
                   help="capture a jax.profiler trace of the search into "
                        "this directory (view with TensorBoard/Perfetto)")
    p.add_argument("--no_warm", action="store_true",
                   help="disable the background compile-ahead warmer "
                        "(utils/warm.py)")
    p.add_argument("--bag_gap_inclusive", action="store_true",
                   help="use the hop-0-style <= gap cut at bag hops too "
                        "(fixes the reference's strict-< cut that blocks "
                        "extension when one relation clearly wins; "
                        "18/18 vs 6/18 planted-path recovery, BASELINE.md)")
    p.add_argument("--retries", type=int, default=0,
                   help="supervise the search in a subprocess and restart "
                        "it up to this many times on failure (a crashed "
                        "TPU runtime poisons the JAX client, so recovery "
                        "needs a fresh process). Combine with --frontier "
                        "and --pickle_filename: every retry resumes from "
                        "the last completed hop / eval chunk / class — "
                        "the production pattern for flaky accelerator "
                        "runtimes (docs/DESIGN.md §'tunnel pathology')")
    p.add_argument("--frontier", type=str, default=None,
                   help="frontier-checkpoint path PREFIX: each class's "
                        "search saves its frontier (hops + completed "
                        "final-eval chunks) to <prefix>.class<i>.pkl and "
                        "resumes mid-search after a crash — finer-grained "
                        "than --pickle_filename's per-class results")
    p.add_argument("--max_extensions_per_state", type=int, default=None,
                   help="bounded-frontier beam: keep at most this many "
                        "lowest-loss gap-cut survivors per state (default "
                        "None = reference parity — the faithful np.diff "
                        "cut, which on many-relation vocabularies can keep "
                        "nearly every candidate and blow the fan-out up; "
                        "SearchConfig.max_extensions_per_state)")
    p.add_argument("--top_k_final", type=int, default=3,
                   help="how many top-val-F1 metapaths enter the greedy "
                        "test accumulation (reference: 3, main.py:1465)")
    p.add_argument("--dropout_rng", type=str, default="auto",
                   choices=["auto", "threefry", "rbg"],
                   help="dropout-mask RNG; 'auto' = hardware rbg on TPU "
                        "(threefry mask generation measured ~32%% of a "
                        "training epoch)")
    p.add_argument("--compute_dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"],
                   help="MPGNN activation/GEMM precision (params stay f32; "
                        "bfloat16 is the MXU-native width)")
    return p


def main(argv=None):
    args = build_argparser().parse_args(argv)
    if args.retries > 0:
        return _supervise(args, argv)
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(name)s %(message)s",
        stream=sys.stderr,
    )
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from mpgnn_tpu.utils.prof import enable_compilation_cache

    # persistent compile cache: remote compiles cost 20-577s over the TPU
    # tunnel (docs/DESIGN.md §3) — every program should compile once per VM
    enable_compilation_cache()

    if args.mesh:
        from mpgnn_tpu.parallel.context import mesh_from_spec, set_sweep_mesh

        mesh = mesh_from_spec(args.mesh)
        set_sweep_mesh(mesh)   # process-wide: warm threads see it too
        logging.info("sweep mesh active: %s", dict(mesh.shape))

    from mpgnn_tpu.config import MPGNNConfig, SearchConfig
    from mpgnn_tpu.graph.io import (
        load_dat_files,
        load_fb15k237,
        mask_label_leak,
        split_nodes,
    )
    from mpgnn_tpu.search import find_metapaths
    from mpgnn_tpu.utils.checkpoint import SearchCheckpoint
    from mpgnn_tpu.utils.warm import get_warmer

    # touch the device from a background thread immediately: the tunnel's
    # per-process first-interaction stall (docs/DESIGN.md §3) then overlaps
    # data loading instead of blocking the first sweep
    warmer = get_warmer(enabled=not args.no_warm)
    if warmer is not None:
        warmer.poke_device()

    t_start = time.time()
    folder = args.folder.rstrip("/") + "/"
    node_f = folder + args.node_file
    link_f = folder + args.link_file
    label_f = folder + args.label_file

    source_nodes = None
    presplit = None
    if args.dataset == "fb15k-237":
        graph, labels, binary_labels, source_nodes = load_fb15k237(
            node_f, link_f, label_f
        )
    elif args.dataset in ("DBLP", "IMDB", "ACM"):
        from mpgnn_tpu.graph.io import load_acm_style

        graph, presplit, binary_labels = load_acm_style(node_f, link_f, folder)
        labels = presplit.labels
        source_nodes = presplit.sources.tolist()
    else:
        graph, labels, binary_labels = load_dat_files(node_f, link_f, label_f)

    cfg = SearchConfig(
        max_extension_hops=args.max_hops,
        bag_gap_inclusive=args.bag_gap_inclusive,
        max_extensions_per_state=args.max_extensions_per_state,
        top_k_final=args.top_k_final,
        mpgnn=MPGNNConfig(epochs=args.epochs, hidden_dim=args.hidden_dim,
                          compute_dtype=args.compute_dtype,
                          backend=args.backend,
                          dropout_rng=args.dropout_rng),
    )

    ckpt = SearchCheckpoint(args.pickle_filename) if args.pickle_filename else None

    results = {}
    for list_index, binary_lab in enumerate(binary_labels):
        # per-class split + optional label-leak masking (main.py:1214-1240);
        # ACM/DBLP/IMDB ship pre-split labels (main.py:96-113)
        if presplit is not None:
            split = presplit.as_split()
        else:
            split = split_nodes(labels, node_idx=source_nodes, seed=cfg.split_seed)
        x = graph.x
        if args.dataset == "fb15k-237":
            x = mask_label_leak(graph.x, split)
        num_classes = int(len(np.unique(labels)))

        if ckpt and ckpt.has(list_index):
            results[list_index] = ckpt.load(list_index)
            logging.info("class %d restored from checkpoint", list_index)
            continue

        from mpgnn_tpu.utils.prof import device_trace

        with device_trace(args.trace_dir):
            res = find_metapaths(
                graph,
                np.asarray(binary_lab, dtype=np.float32),
                split,
                num_classes=num_classes,
                config=cfg,
                dataset=args.dataset,
                source_nodes=source_nodes,
                x_features=x,
                seed=args.seed,
                warmer=warmer,
                frontier_checkpoint=(
                    f"{args.frontier}.class{list_index}.pkl"
                    if args.frontier else None
                ),
            )
        results[list_index] = res
        if ckpt:
            ckpt.save(list_index, res)
        if args.save_model and res.metapaths:
            from mpgnn_tpu.train.loops import train_mpgnn
            from mpgnn_tpu.utils.checkpoint import save_params

            final = train_mpgnn(
                graph, res.metapaths, split, num_classes,
                cfg.mpgnn, seed=args.seed, x_override=x,
                backend=args.backend,
            )
            save_params(
                f"{args.save_model}/class_{list_index}", final.params
            )
            logging.info(
                "class %d final model saved (val F1 %.4f)",
                list_index, final.val_f1,
            )
        print(
            f"class {list_index}: final meta: {res.metapaths} "
            f"test acc: {res.test_f1:.4f}",
            flush=True,
        )

    summary = {
        "dataset": args.dataset,
        "classes": {
            str(k): {"metapaths": v.metapaths, "test_f1": v.test_f1}
            for k, v in results.items()
        },
        "wall_s": round(time.time() - t_start, 1),
    }
    print(json.dumps(summary), flush=True)
    return results


if __name__ == "__main__":
    # propagate the supervisor's exit code: a --retries run that fails every
    # attempt must exit non-zero so chained scripts/CI see the failure
    _out = main()
    sys.exit(_out if isinstance(_out, int) else 0)
