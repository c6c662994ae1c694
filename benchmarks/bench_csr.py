"""Pallas sorted-CSR kernel vs XLA segment path on the real chip.

Times the aggregation op (fwd and fwd+bwd) at the BASELINE north-star scale
via a dependent lax.scan (tunnel dispatch is ~ms and block_until_ready does
not block on this image — see benchmarks/micro_agg.py).

Run:  python benchmarks/bench_csr.py [N] [E] [F]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 20
HBM_GBS = 819.0   # v5e peak HBM bandwidth


def timeit(step, init, *consts):
    """Times ITERS dependent iterations of ``step(c, *consts)`` in ONE jitted
    program; ``consts`` enter as jit ARGUMENTS (closure-captured blockings
    overflowed the tunnel's remote-compile payload with HTTP 413)."""

    @jax.jit
    def run(c, *consts):
        def body(c, _):
            return step(c, *consts), 0
        c, _ = jax.lax.scan(body, c, None, length=ITERS)
        return c.ravel()[0]

    float(run(init, *consts))
    t0 = time.perf_counter()
    out = float(run(init, *consts))
    return (time.perf_counter() - t0) / ITERS, out


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    e = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000_000
    f = int(sys.argv[3]) if len(sys.argv) > 3 else 16

    from mpgnn_tpu.ops.pallas_csr import build_csr_blocking, csr_mean_aggregate

    rng = np.random.default_rng(0)
    src = np.sort(rng.integers(0, n, size=e))
    dst = rng.integers(0, n, size=e)
    x = rng.standard_normal((n, f)).astype(np.float32)
    inv = (1.0 / np.maximum(np.bincount(src, minlength=n), 1)).astype(np.float32)

    t0 = time.perf_counter()
    fwd, bwd = build_csr_blocking(src, dst, n)
    print(f"blocking build: {time.perf_counter()-t0:.1f}s "
          f"(T={fwd.local.shape[0]} tiles, EP={fwd.weight.shape[0]})",
          file=sys.stderr)

    x_d = jnp.asarray(x)
    src_d, dst_d = jnp.asarray(src.astype(np.int32)), jnp.asarray(dst.astype(np.int32))
    inv_d = jnp.asarray(inv)

    def dep(x, out):
        # consume EVERY element of out (a partial consumption lets XLA
        # slice/DCE the producer and fake the timing); scalar-sum so probes
        # whose output width differs from x (the 256B-padded gather) work
        return x + jnp.sum(out) * 1e-30

    def seg_fwd(x):
        tot = jax.ops.segment_sum(
            x[dst_d], src_d, num_segments=n, indices_are_sorted=True)
        return dep(x, tot * inv_d[:, None])

    def seg_fwdbwd(x):
        def loss(x):
            tot = jax.ops.segment_sum(
                x[dst_d], src_d, num_segments=n, indices_are_sorted=True)
            return jnp.sum((tot * inv_d[:, None]) ** 2)
        return dep(x, jax.grad(loss)(x))

    def csr_fwd(x, fwd, bwd):
        return dep(x, csr_mean_aggregate(x, fwd, bwd))

    def csr_fwdbwd(x, fwd, bwd):
        def loss(x):
            return jnp.sum(csr_mean_aggregate(x, fwd, bwd) ** 2)
        return dep(x, jax.grad(loss)(x))

    # correctness on-device first
    a = np.asarray(csr_mean_aggregate(x_d, fwd, bwd))
    tot = jax.ops.segment_sum(x_d[dst_d], src_d, num_segments=n,
                              indices_are_sorted=True)
    b = np.asarray(tot * inv_d[:, None])
    err = np.abs(a - b).max()
    print(f"max |csr - segment| = {err:.2e}", file=sys.stderr)
    assert err < 1e-4

    from mpgnn_tpu.ops.pallas_csr import _gather_weighted, _segment_apply

    y0 = _gather_weighted(fwd, x_d)

    def gather_only(x, fwd):
        # consume the FULL [EP, F] result: a row slice here (an earlier
        # version took [:n]) breaks the gather+scale+reduce fusion and
        # materializes the 3 GB intermediate, mismeasuring the gather ~16%
        # slow (69.2 vs 58.3 ms at F=64 — probe_gather_gap.py)
        return dep(x, _gather_weighted(fwd, x))

    def kernel_only(y, fwd):
        out = _segment_apply(fwd, y)
        return y + jnp.sum(out, axis=0)[None, :] * 1e-30

    rows = {}
    rows["segment fwd"], _ = timeit(seg_fwd, x_d)
    rows["csr fwd"], _ = timeit(csr_fwd, x_d, fwd, bwd)
    rows["csr gather only"], _ = timeit(gather_only, x_d, fwd)
    rows["csr kernel only"], _ = timeit(kernel_only, y0, fwd)
    rows["segment fwd+bwd"], _ = timeit(seg_fwdbwd, x_d)
    rows["csr fwd+bwd"], _ = timeit(csr_fwdbwd, x_d, fwd, bwd)

    # bf16 activations (the model's compute_dtype=bfloat16 path): halves
    # the gather's HBM bytes — the csr path's measured ceiling
    x16 = x_d.astype(jnp.bfloat16)

    def csr_fwd16(x, fwd, bwd):
        return dep(x, csr_mean_aggregate(x, fwd, bwd))

    rows["csr fwd bf16"], _ = (lambda: timeit(csr_fwd16, x16, fwd, bwd))()

    print(f"N={n} E={e} F={f}  (edge-row GB = E*F*4/1e9 = {e*f*4/1e9:.2f})")
    for k, t in rows.items():
        passes = 2 if "bwd" in k else 1
        width = 2 if "bf16" in k else 4
        gbs = passes * e * f * width / t / 1e9
        # achievable floor: the row gather is ISSUE-RATE bound on this chip
        # (benchmarks/GATHER_ROOFLINE.json: ~201 Mrows/s at >=256B rows,
        # 148 Mrows/s at 64B; the kernel pads sub-256B rows up, so the
        # padded-row rate applies), over the PADDED edge count EP and one
        # gather per pass
        ep = fwd.weight.shape[0]
        floor_s = passes * ep / 201e6
        print(f"{k:18s} {t*1e3:9.2f} ms   {e*passes/t/1e6:9.1f} M edge-visits/s"
              f"   {gbs:7.1f} GB/s ({100*gbs/HBM_GBS:.1f}% HBM peak, "
              f"{100*floor_s/t:.0f}% of measured gather roofline)")


if __name__ == "__main__":
    main()
