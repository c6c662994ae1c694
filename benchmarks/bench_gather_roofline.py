"""Hardware random-gather roofline: what can a row gather actually achieve?

VERDICT r2 flagged that every %-of-HBM-peak number for the aggregation path
is dishonest until the ACHIEVABLE bandwidth of the underlying primitive — a
random row gather ``x[idx]`` — is measured on this chip. XLA lowers that
gather to per-row dynamic slices; the open question is whether it is
descriptor-rate-bound (rows/s flat as rows widen) or bandwidth-bound
(GB/s flat). The answer decides the kernel strategy:

* descriptor-bound  -> wider rows are free; F=64 training hops should see
  ~4x the GB/s of the F=16 toy; software can only reduce the NUMBER of
  gathered rows (dedup, fusion), not their cost;
* bandwidth-bound at some fraction of peak -> a Pallas DMA formulation
  could fight for the rest.

Sweeps row widths 64/128/256/512B (F=16/32/64/128 f32) x index patterns:

  random          uniform random rows (the aggregation gather's pattern)
  blockmono       sorted by destination row-block of BM=256, random inside
                  (what ops/pallas_csr's column-secondary lexsort produces
                  on the GATHER side: block-monotonic addresses)
  sorted          globally non-decreasing indices
  window4k        random within a 4096-row window sliding sequentially
                  (what locality reordering of a clustered graph buys)
  stream          x[i] identity gather (upper bound for the gather op)

Run on the real chip:  python benchmarks/bench_gather_roofline.py [N] [E]
Emits a markdown table + one JSON line for BASELINE.md / bench_csr.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 10


def timeit(make_step, init):
    """ITERS dependent steps inside one jitted scan (tunnel-safe timing:
    per-dispatch latency is ~ms, block_until_ready does not block — a
    scalar readback does; same methodology as benchmarks/micro_agg.py)."""

    @jax.jit
    def run(c):
        def body(c, _):
            return make_step(c), 0
        c, _ = jax.lax.scan(body, c, None, length=ITERS)
        return jax.tree_util.tree_map(lambda a: a.ravel()[0], c)

    out = run(init)
    _ = jax.tree_util.tree_map(float, out)
    t0 = time.perf_counter()
    out = run(init)
    _ = jax.tree_util.tree_map(float, out)
    return (time.perf_counter() - t0) / ITERS


def patterns(rng, n, e, bm=256):
    rnd = rng.integers(0, n, size=e).astype(np.int32)
    blockmono = rnd[np.argsort(rnd // bm, kind="stable")]
    srt = np.sort(rnd)
    # random-within-window: window w slides so the whole pass is sequential
    # at 4k-row granularity but random inside — the access pattern locality
    # reordering (graph/partition.py blocks) produces
    win = 4096
    nw = max(1, n // win)
    base = (np.arange(e) * nw // e).astype(np.int64) * win
    window4k = (base + rng.integers(0, win, size=e)).astype(np.int32)
    window4k = np.minimum(window4k, n - 1)
    stream = (np.arange(e) % n).astype(np.int32)
    return {
        "random": rnd,
        "blockmono": blockmono,
        "sorted": srt,
        "window4k": window4k,
        "stream": stream,
    }


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    e = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000_000
    rng = np.random.default_rng(0)
    dev = jax.devices()[0]
    print(f"device={dev.platform}:{getattr(dev, 'device_kind', '?')} "
          f"N={n} E={e}", file=sys.stderr)

    idxs = {k: jnp.asarray(v) for k, v in patterns(rng, n, e).items()}
    rows = []
    for f in (16, 32, 64, 128):
        x = jnp.asarray(rng.standard_normal((n, f)).astype(np.float32))
        row_bytes = f * 4
        entry = {"F": f, "row_bytes": row_bytes}
        for name, idx in idxs.items():
            def step(x, idx=idx):
                out = x[idx]
                return x + jnp.sum(out, axis=0)[None, :] * 1e-30
            t = timeit(step, x)
            entry[name] = {
                "ms": round(t * 1e3, 2),
                "gbs": round(e * row_bytes / t / 1e9, 2),
                "mrows_s": round(e / t / 1e6, 1),
            }
            print(f"  F={f} {name}: {t*1e3:.1f} ms "
                  f"{entry[name]['gbs']} GB/s ({entry[name]['mrows_s']} Mrows/s)",
                  file=sys.stderr, flush=True)
        # HBM stream reference at this width: copy-scale an [E, F] buffer
        y = jnp.asarray(rng.standard_normal((e, f)).astype(np.float32))
        t = timeit(lambda y: y * 1.0000001, y)
        entry["hbm_stream_gbs"] = round(2 * e * row_bytes / t / 1e9, 1)
        rows.append(entry)
        del x, y

    hdr = ("| row B | " + " | ".join(
        f"{k} GB/s (Mrows/s)" for k in idxs) + " | stream GB/s |")
    print(hdr)
    print("|" + "---|" * (len(idxs) + 2))
    for r in rows:
        cells = " | ".join(
            f"{r[k]['gbs']} ({r[k]['mrows_s']})" for k in idxs)
        print(f"| {r['row_bytes']} | {cells} | {r['hbm_stream_gbs']} |")
    print(json.dumps({"kind": "gather_roofline", "N": n, "E": e,
                      "device": getattr(dev, 'device_kind', dev.platform),
                      "rows": rows}))


if __name__ == "__main__":
    main()
