"""Controlled reproduction of the vmapped-segment-eval crash cliff
(VERDICT r4 item 3: separate chip facts from tunnel facts).

The framework caps vmapped scatter/segment program width
(`batch_eval._EVAL_VMAP_ENTRY_CAP` = 16M entries,
`scoring._SEG_SWEEP_RN_CAP` / `_SEG_SWEEP_R_CAP`) because the XLA:TPU
tunnel worker died executing wider programs during real searches (round
3/4, BASELINE.md). Those observations conflate two hypotheses:

  WIDTH     the runtime cannot execute a batched scatter past ~30M entries;
  DURATION  the tunnel worker dies under any single dispatch running
            ~20+ device-minutes (independently proven for the csr path,
            benchmarks/probe_kg_csr_fault.py — fixed by epoch-blocked
            dispatches).

This probe separates them: each trial runs the REAL batched-eval segment
program (`evaluate_candidates`, backend='segment', entry cap lifted via
MPGNN_EVAL_VMAP_ENTRY_CAP) in a CLEAN CHILD PROCESS at a given
C x e_pad x H entry count and epoch budget, with short dispatches first
(seconds-long: any crash is then a width fact, not a duration fact) and
one long-dispatch control. Results -> benchmarks/CRASH_CLIFF.json.

Run (on the real TPU):  python benchmarks/probe_crash_cliff.py
Single trial (child):   python benchmarks/probe_crash_cliff.py \
                            --trial --candidates 4 --edges 250000 \
                            --hidden 64 --epochs 30
"""

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def trial(c, e, h, epochs):
    """One vmapped segment-eval program at C x e_pad x H entries."""
    from mpgnn_tpu.config import MPGNNConfig
    from mpgnn_tpu.graph.hetero import HeteroGraph
    from mpgnn_tpu.graph.io import split_nodes
    from mpgnn_tpu.train.batch_eval import evaluate_candidates

    rng = np.random.default_rng(0)
    n = 65536
    # C relations of e edges each -> one length-1 group of C candidates
    # sharing e_pad = pow2(e) + 1 (the EP+1 anti-cliff pad)
    src = rng.integers(0, n, (c, e))
    dst = rng.integers(0, n, (c, e))
    rel = np.repeat(np.arange(c), e)
    graph = HeteroGraph(
        rng.normal(size=(n, 8)).astype(np.float32),
        src.ravel(), dst.ravel(), rel, num_relations=c,
        labels=rng.integers(0, 2, n),
    )
    split = split_nodes(np.asarray(graph.labels))
    cfg = MPGNNConfig(epochs=epochs, hidden_dim=h, backend="segment")
    paths = [[r] for r in range(c)]
    t0 = time.time()
    out = evaluate_candidates(graph, paths, split, 2, cfg, seed=0)
    wall = time.time() - t0
    print(json.dumps({"ok": True, "wall_s": round(wall, 1),
                      "losses": {k: round(v, 4) for k, v in out.items()}}))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trial", action="store_true")
    ap.add_argument("--candidates", type=int, default=4)
    ap.add_argument("--edges", type=int, default=250_000)
    ap.add_argument("--hidden", type=int, default=64)
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--timeout", type=int, default=2400)
    args = ap.parse_args()
    if args.trial:
        trial(args.candidates, args.edges, args.hidden, args.epochs)
        return

    here = os.path.abspath(__file__)
    results = []

    def run(c, e, h, epochs, label):
        e_pad = (1 << (e - 1).bit_length()) + 1
        entries = c * e_pad * h
        env = dict(os.environ)
        env["MPGNN_EVAL_VMAP_ENTRY_CAP"] = str(1 << 40)  # lift the guard
        t0 = time.time()
        p = subprocess.run(
            [sys.executable, here, "--trial", "--candidates", str(c),
             "--edges", str(e), "--hidden", str(h),
             "--epochs", str(epochs)],
            env=env, capture_output=True, text=True, timeout=args.timeout,
        )
        wall = time.time() - t0
        ok = p.returncode == 0
        rec = {
            "label": label, "C": c, "edges": e, "e_pad": e_pad, "H": h,
            "epochs": epochs, "entries": entries, "ok": ok,
            "rc": p.returncode, "wall_s": round(wall, 1),
            "tail": (p.stdout.strip().splitlines() or [""])[-1][:300]
            if ok else (p.stderr.strip().splitlines() or [""])[-1][:300],
        }
        results.append(rec)
        print(json.dumps(rec), file=sys.stderr, flush=True)
        return ok

    # WIDTH sweep at short dispatches (each a seconds-long device program:
    # a crash here is a width fact). 16.8M = today's cap operating point;
    # 33.6M / 67M = the two real-search crash configs; then 2x beyond.
    for c, e in ((1, 262144), (1, 524288), (4, 262144), (8, 262144),
                 (16, 262144)):
        if not run(c, e, 64, 30, "width-short"):
            break
    # DURATION control: the round-4 crash config at its original 1000-epoch
    # single-scan budget (expected ~15-20 device-minutes — the regime the
    # tunnel worker historically does not survive).
    run(4, 262144, 64, 1000, "duration-long")

    path = os.path.join(os.path.dirname(here), "CRASH_CLIFF.json")
    with open(path, "w") as f:
        json.dump(results, f, indent=1)
    widths_ok = [r["entries"] for r in results
                 if r["label"] == "width-short" and r["ok"]]
    widths_bad = [r["entries"] for r in results
                  if r["label"] == "width-short" and not r["ok"]]
    print(json.dumps({
        "artifact": path,
        "max_ok_entries_short": max(widths_ok, default=None),
        "min_crash_entries_short": min(widths_bad, default=None),
        "duration_long_ok": next(
            (r["ok"] for r in results if r["label"] == "duration-long"),
            None,
        ),
    }))


if __name__ == "__main__":
    main()
