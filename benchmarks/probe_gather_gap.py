"""Bisect the csr gather's ~140 vs ~203 Mrows/s roofline gap (DESIGN §2).

Four probes at N=500k / E=10M / F=64, all timed the bench_csr way
(dependent lax.scan, consts as jit args):

  1. bare gather, uniform-random indices, count = EP+1   (the roofline)
  2. bare gather, the blocking's gidx                    (index-content effect)
  3. weighted gather, uniform-random indices             (fusion effect)
  4. weighted gather, the blocking's gidx                (current production op)

Run:  python benchmarks/probe_gather_gap.py [N] [E] [F]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 20


def timeit(step, init, *consts):
    @jax.jit
    def run(c, *consts):
        def body(c, _):
            return step(c, *consts), 0
        c, _ = jax.lax.scan(body, c, None, length=ITERS)
        return c.ravel()[0]

    float(run(init, *consts))
    t0 = time.perf_counter()
    float(run(init, *consts))
    return (time.perf_counter() - t0) / ITERS


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    e = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000_000
    f = int(sys.argv[3]) if len(sys.argv) > 3 else 64

    from mpgnn_tpu.ops.pallas_csr import build_csr_blocking

    rng = np.random.default_rng(0)
    src = np.sort(rng.integers(0, n, size=e))
    dst = rng.integers(0, n, size=e)
    x = rng.standard_normal((n, f)).astype(np.float32)
    fwd, _ = build_csr_blocking(src, dst, n)
    ep = fwd.weight.shape[0]
    print(f"N={n} E={e} F={f} EP={ep} gidx_len={fwd.gidx.shape[0]}",
          file=sys.stderr)

    x_d = jnp.asarray(x)
    gidx_d = jnp.asarray(fwd.gidx)
    w_d = jnp.asarray(fwd.weight)
    rnd = rng.integers(0, n, size=int(fwd.gidx.shape[0])).astype(np.int32)
    rnd_d = jnp.asarray(rnd)
    wr_d = jnp.asarray(rng.random(ep).astype(np.float32))

    def dep(x, out):
        return x + jnp.sum(out) * 1e-30

    def bare(x, idx):
        return dep(x, x[idx][:ep])

    def weighted(x, idx, w):
        return dep(x, x[idx][:ep] * w[:, None])

    rows = [
        ("bare/random", timeit(bare, x_d, rnd_d)),
        ("bare/blocking", timeit(bare, x_d, gidx_d)),
        ("weighted/random", timeit(weighted, x_d, rnd_d, wr_d)),
        ("weighted/blocking", timeit(weighted, x_d, gidx_d, w_d)),
    ]
    for k, t in rows:
        print(f"{k:20s} {t*1e3:8.2f} ms   {ep/t/1e6:7.1f} Mrows/s")


if __name__ == "__main__":
    main()
