"""Tile-density histogram for the dense block-SpMM experiment
(VERDICT r4 item 5).

The csr kernel's step floor is the XLA row-gather issue rate (~201 Mrows/s
at 256 B rows, pattern-insensitive — benchmarks/GATHER_ROOFLINE.json). A
dense-tile path would replace per-edge gathers inside a (row-block x
col-block) tile with a CONTIGUOUS read of the col block (bandwidth-bound:
819 GB/s / 256 B = 3.2 Grows/s, ~16x the gather issue rate) plus the
one-hot MXU reduction the kernel already performs. Reading a CB-row col
block contiguously costs CB/3.2G s; gathering its k edges costs k/201M s,
so a tile pays for itself when

    k  >  CB * (201e6 / 3.2e9)  ~=  CB / 16.

This script measures, for the north-star training graph (uniform
N=200k/E=10M) and the power-law KGs, after BFS locality reordering
(graph/partition.py::locality_reorder), what fraction of edges lives in
tiles that clear that threshold — the go/no-go evidence for building the
hybrid kernel. Writes benchmarks/TILE_DENSITY.json.

Run: python benchmarks/bench_tile_density.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# gather issue rate vs contiguous stream rate at 256 B rows (measured,
# GATHER_ROOFLINE.json + HBM peak): break-even edges per col block
GATHER_MROWS = 201e6
STREAM_ROWS = 819e9 / 256


def tile_stats(src, dst, n, rb, cb):
    """Fraction of edges in (rb x cb) tiles clearing the break-even count.

    A tile is (src-block, dst-block); its k edges would dense-read the cb
    destination rows once. Threshold k* = cb * GATHER_MROWS / STREAM_ROWS."""
    tb_r = (n + rb - 1) // rb
    tile_id = (src // rb).astype(np.int64) * ((n + cb - 1) // cb) \
        + (dst // cb).astype(np.int64)
    counts = np.bincount(tile_id)
    k = counts[tile_id]          # per-edge: its tile's edge count
    kstar = max(1, int(np.ceil(cb * GATHER_MROWS / STREAM_ROWS)))
    nz = counts[counts > 0]
    out = {
        "rb": rb, "cb": cb, "k_star": kstar,
        "nonempty_tiles": int(len(nz)),
        "mean_edges_per_nonempty_tile": round(float(nz.mean()), 2),
        "p99_edges_per_tile": int(np.percentile(nz, 99)),
        "max_edges_per_tile": int(nz.max()),
        "frac_edges_in_tiles_ge_kstar": round(
            float(np.mean(k >= kstar)), 4
        ),
        "frac_edges_in_tiles_ge_4x_kstar": round(
            float(np.mean(k >= 4 * kstar)), 4
        ),
    }
    del tile_id, counts, k
    _ = tb_r
    return out


def dedup_stats(src, dst, n, rb):
    """Upper bound of a different attack: per row-block, gather each UNIQUE
    destination once (hub edges repeat destinations). Reports the gather
    reduction factor unique/total — the best any dedup scheme can do."""
    order = np.lexsort((dst, src // rb))
    s2, d2 = (src // rb)[order], dst[order]
    # unique (block, dst) pairs
    first = np.ones(len(s2), bool)
    first[1:] = (s2[1:] != s2[:-1]) | (d2[1:] != d2[:-1])
    uniq = int(first.sum())
    return {
        "rb": rb,
        "unique_block_dst_pairs": uniq,
        "total_edges": int(len(src)),
        "gather_reduction": round(len(src) / max(uniq, 1), 3),
    }


def analyze(name, src, dst, n, reorder=True):
    from mpgnn_tpu.graph.partition import locality_permutation

    res = {"name": name, "n": int(n), "e": int(len(src))}
    for tag in (["raw", "bfs"] if reorder else ["raw"]):
        if tag == "bfs":
            t0 = time.time()
            old_of_new = locality_permutation(src, dst, n)
            new_of_old = np.empty_like(old_of_new)
            new_of_old[old_of_new] = np.arange(n)
            s, d = new_of_old[src], new_of_old[dst]
            res["bfs_reorder_s"] = round(time.time() - t0, 1)
        else:
            s, d = src, dst
        res[tag] = {
            "tiles": [tile_stats(s, d, n, rb, cb)
                      for rb, cb in ((128, 128), (512, 512), (2048, 2048))],
            "dedup": [dedup_stats(s, d, n, rb) for rb in (512, 8192)],
        }
    return res


def main():
    rng = np.random.default_rng(0)
    out = []

    # the bench train-at-scale graph (uniform): one relation's slice
    n, e = 200_000, 10_000_000
    src = rng.integers(0, n, e).astype(np.int64)
    dst = rng.integers(0, n, e).astype(np.int64)
    out.append(analyze("uniform_200k_10m", src, dst, n))
    print(json.dumps(out[-1]["raw"]["tiles"][0]), file=sys.stderr)

    # power-law KGs (per-relation structure): largest relation of each
    for folder in ("data/powerlaw_kg_small", "data/powerlaw_kg"):
        link = os.path.join(folder, "link.dat")
        if not os.path.exists(link):
            continue
        t0 = time.time()
        arr = np.loadtxt(link, dtype=np.int64)
        s, r, d = arr[:, 0], arr[:, 1], arr[:, 2]
        n2 = int(max(s.max(), d.max())) + 1
        top = np.argmax(np.bincount(r))
        m = r == top
        out.append(analyze(
            f"{os.path.basename(folder)}_rel{int(top)}", s[m], d[m], n2
        ))
        print(f"{folder}: rel {int(top)} ({int(m.sum())} edges, "
              f"load {time.time()-t0:.0f}s)", file=sys.stderr)

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "TILE_DENSITY.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({
        "artifact": path,
        "summary": {
            o["name"]: {
                tag: o[tag]["tiles"][0]["frac_edges_in_tiles_ge_kstar"]
                for tag in ("raw", "bfs") if tag in o
            } for o in out
        },
    }))


if __name__ == "__main__":
    main()
