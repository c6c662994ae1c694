"""Sweep the csr kernel's (BM, ET) blocking shape on the real chip.

The round-3 decomposition (probe_gather_gap.py) showed the XLA gather runs
at the full ~206 Mrows/s issue-rate roofline; the remaining headroom is the
Pallas reduction (31.5 ms at BM=256/ET=2048 — ~5.4 us/tile, well above its
~13 ms of component costs) and the 20% EP padding. Both move with the
blocking shape: pad = nb * ET/2 (smaller with bigger BM), tiles = EP/ET
(fewer with bigger ET), per-tile MXU work = BM*ET*F (bigger with both).

Run:  python benchmarks/probe_csr_shapes.py [N] [E] [F]
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

    from mpgnn_tpu.ops.pallas_csr import (
        build_csr_blocking,
        csr_mean_aggregate,
        _gather_weighted,
        _segment_apply,
    )

    rng = np.random.default_rng(0)
    src = np.sort(rng.integers(0, n, size=e))
    dst = rng.integers(0, n, size=e)
    x_d = jnp.asarray(rng.standard_normal((n, f)).astype(np.float32))

    def dep(x, out):
        return x + jnp.sum(out) * 1e-30

    def fwd_step(x, fb, bb):
        return dep(x, csr_mean_aggregate(x, fb, bb))

    def kern_step(y, fb):
        out = _segment_apply(fb, y)
        return y + jnp.sum(out) * 1e-30

    ref = None
    for bm, et in [(256, 2048), (512, 2048), (1024, 2048), (512, 4096),
                   (1024, 4096), (256, 1024), (512, 1024)]:
        t0 = time.time()
        fb, bb = build_csr_blocking(src, dst, n, bm=bm, et=et)
        build_s = time.time() - t0
        ep = fb.weight.shape[0]
        out = np.asarray(csr_mean_aggregate(x_d, fb, bb))
        if ref is None:
            ref = out
        err = np.abs(out - ref).max()
        y0 = _gather_weighted(fb, x_d)
        t_f = timeit(fwd_step, x_d, fb, bb)
        t_k = timeit(kern_step, y0, fb)
        print(f"BM={bm:5d} ET={et:5d}  EP={ep/1e6:5.2f}M  T={fb.local.shape[0]:5d}"
              f"  fwd {t_f*1e3:7.2f} ms  kernel-only {t_k*1e3:6.2f} ms"
              f"  (build {build_s:.0f}s, err {err:.1e})", flush=True)


if __name__ == "__main__":
    main()
