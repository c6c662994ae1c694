"""Measure the unique-column (dedup) csr blocking vs the classic per-edge
gather kernel on hub-skewed aggregation workloads (VERDICT r4 item 5).

Two workloads:
  * a north-star-scale power-law graph (N=500k, E=10M, endpoint
    popularity ~ rank^-1.2 — the shipped KG generator's distribution);
  * the uniform N=500k/E=10M control (expected: auto keeps classic —
    the negative half of the dense-tile verdict).

Writes benchmarks/DEDUP.json. Run on the real TPU:
    python benchmarks/bench_dedup.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def bench_one(name, src, dst, n, f=64, iters=10):
    import jax
    import jax.numpy as jnp

    from mpgnn_tpu.ops.pallas_csr import (
        DedupCsrBlocking,
        build_csr_blocking,
        csr_mean_aggregate,
        dedup_ratio,
        ref_mean,
    )

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((n, f)).astype(np.float32))
    e = len(src)
    row = {"name": name, "n": n, "e": e, "f": f}

    def timed(step, *consts):
        # blockings enter as jit ARGUMENTS: a 10M-edge blocking embedded
        # as a closure constant blows the remote-compile payload limit
        # (HTTP 413 — the pitfall csr_mean_aggregate's docstring records)
        @jax.jit
        def run(c, *consts):
            def body(c, _):
                return step(c, *consts), 0
            c, _ = jax.lax.scan(body, c, None, length=iters)
            return c.ravel()[0]

        float(run(x, *consts))
        t0 = time.perf_counter()
        float(run(x, *consts))
        return (time.perf_counter() - t0) / iters

    for mode in ("never", "always"):
        t0 = time.time()
        fwd, bwd = build_csr_blocking(src, dst, n, dedup=mode)
        build_s = time.time() - t0
        kind = type(fwd).__name__
        if mode == "always" and not isinstance(fwd, DedupCsrBlocking):
            continue

        def dep(c, out):
            return c + jnp.sum(out, axis=0)[None, :] * 1e-30

        t_f = timed(
            lambda c, f_, b_: dep(c, csr_mean_aggregate(c, f_, b_)),
            fwd, bwd,
        )

        def fb(c, f_, b_):
            y, vjp = jax.vjp(lambda a: csr_mean_aggregate(a, f_, b_), c)
            (dx,) = vjp(y)
            return dep(c, dx)

        t_fb = timed(fb, fwd, bwd)
        # correctness spot-check on device
        got = csr_mean_aggregate(x, fwd, bwd)
        want = ref_mean(x, jnp.asarray(src.astype(np.int32)),
                        jnp.asarray(dst.astype(np.int32)), n)
        err = float(jnp.max(jnp.abs(got - want)))
        row[mode] = {
            "kind": kind, "build_s": round(build_s, 1),
            "fwd_ms": round(t_f * 1e3, 1),
            "fwd_bwd_ms": round(t_fb * 1e3, 1),
            "fwd_edges_per_s": round(e / t_f, 1),
            "max_abs_err": err,
        }
        print(f"[{name}/{mode}] {kind}: fwd {t_f*1e3:.1f} ms, fwd+bwd "
              f"{t_fb*1e3:.1f} ms, err {err:.2e}", file=sys.stderr,
              flush=True)
    bm = 512
    row["dedup_ratio_fwd_bm512"] = round(dedup_ratio(src, dst, bm), 2)
    row["dedup_ratio_bwd_bm512"] = round(dedup_ratio(dst, src, bm), 2)
    if "never" in row and "always" in row:
        row["speedup_fwd"] = round(
            row["never"]["fwd_ms"] / row["always"]["fwd_ms"], 2
        )
        row["speedup_fwd_bwd"] = round(
            row["never"]["fwd_bwd_ms"] / row["always"]["fwd_bwd_ms"], 2
        )
    return row


def main():
    from mpgnn_tpu.utils.prof import enable_compilation_cache

    enable_compilation_cache()
    rng = np.random.default_rng(0)
    n, e = 500_000, 10_000_000
    out = []

    # power-law endpoints (the KG generator's distribution, alpha=1.2)
    pop = (np.arange(n, dtype=np.float64) + 1.0) ** -1.2
    pop /= pop.sum()
    perm_s, perm_d = rng.permutation(n), rng.permutation(n)
    src_p = np.sort(perm_s[rng.choice(n, size=e, p=pop)])
    dst_p = perm_d[rng.choice(n, size=e, p=pop)]
    out.append(bench_one("powerlaw_500k_10m", src_p, dst_p, n))

    src_u = np.sort(rng.integers(0, n, e))
    dst_u = rng.integers(0, n, e)
    out.append(bench_one("uniform_500k_10m", src_u, dst_u, n))

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "DEDUP.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"artifact": path, "rows": [
        {k: r.get(k) for k in ("name", "dedup_ratio_fwd_bm512",
                               "speedup_fwd", "speedup_fwd_bwd")}
        for r in out
    ]}))


if __name__ == "__main__":
    main()
