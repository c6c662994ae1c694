"""Op-level breakdown of the sparse aggregation path on the real chip.

DESIGN.md §2 records the *combined* segment path at ~18-20 GB/s; this probe
splits it into its constituent ops so the round-2 Pallas kernel targets the
actual bottleneck (gather vs scatter vs intermediate materialization).

Measurement notes (this image's axon TPU tunnel):
* ``jax.block_until_ready`` does NOT block — a scalar readback does;
* per-dispatch latency through the tunnel is ~ms — every op is therefore
  timed as a dependent ``lax.scan`` of ITERS iterations inside ONE program.

Run:  python benchmarks/micro_agg.py [N] [E] [F]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 20


def timeit(make_step, init, warm=True):
    """make_step(carry) -> carry; times ITERS dependent steps in one jit."""

    @jax.jit
    def run(c):
        def body(c, _):
            return make_step(c), 0
        c, _ = jax.lax.scan(body, c, None, length=ITERS)
        return jax.tree_util.tree_map(lambda a: a.ravel()[0], c)

    out = run(init)
    _ = jax.tree_util.tree_map(float, out)  # warm compile + first-touch
    t0 = time.perf_counter()
    out = run(init)
    _ = jax.tree_util.tree_map(float, out)
    return (time.perf_counter() - t0) / ITERS


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    e = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000_000
    f = int(sys.argv[3]) if len(sys.argv) > 3 else 16

    rng = np.random.default_rng(0)
    src = np.sort(rng.integers(0, n, size=e)).astype(np.int32)
    dst = rng.integers(0, n, size=e).astype(np.int32)
    x = rng.standard_normal((n, f)).astype(np.float32)
    inv = (1.0 / np.maximum(np.bincount(src, minlength=n), 1)).astype(np.float32)

    dev = jax.devices()[0]
    print(f"device={dev.platform}:{getattr(dev, 'device_kind', '?')} "
          f"N={n} E={e} F={f}", file=sys.stderr)
    src_d, dst_d, x_d = jnp.asarray(src), jnp.asarray(dst), jnp.asarray(x)
    dsts_d = jnp.asarray(np.sort(dst))
    y_d = jnp.asarray(rng.standard_normal((e, f)).astype(np.float32))
    inv_d = jnp.asarray(inv)

    row_bytes = f * 4
    results = {}

    # Each step must depend on the previous: fold a scalar of the result
    # into the input so scan cannot parallelize or DCE.
    def dep(x, out):
        # consume EVERY element of out (a partial consumption lets XLA
        # slice/DCE the producer and fake the timing)
        return x + jnp.sum(out, axis=0)[None, :] * 1e-30

    t = timeit(lambda x: dep(x, x[dst_d]), x_d)
    results["gather_random[E rows]"] = (t, e * row_bytes / t / 1e9)
    t = timeit(lambda x: dep(x, x[dsts_d]), x_d)
    results["gather_sorted_idx"] = (t, e * row_bytes / t / 1e9)
    t = timeit(
        lambda y: dep(y, jax.ops.segment_sum(
            y, src_d, num_segments=n, indices_are_sorted=True)), y_d)
    results["scatter_sorted"] = (t, e * row_bytes / t / 1e9)
    t = timeit(
        lambda y: dep(y, jax.ops.segment_sum(
            y, dst_d, num_segments=n, indices_are_sorted=False)), y_d)
    results["scatter_random"] = (t, e * row_bytes / t / 1e9)

    def fwd(x):
        tot = jax.ops.segment_sum(
            x[dst_d], src_d, num_segments=n, indices_are_sorted=True)
        return dep(x, tot * inv_d[:, None])

    t = timeit(fwd, x_d)
    results["fused_fwd"] = (t, e * row_bytes / t / 1e9)

    def fwdbwd(x):
        def loss(x):
            tot = jax.ops.segment_sum(
                x[dst_d], src_d, num_segments=n, indices_are_sorted=True)
            return jnp.sum((tot * inv_d[:, None]) ** 2)
        return dep(x, jax.grad(loss)(x))

    t = timeit(fwdbwd, x_d)
    results["fused_fwd+bwd"] = (t, e * row_bytes / t / 1e9)

    t = timeit(lambda y: y * 1.0000001, y_d)
    results["stream_[E,F]_copy"] = (t, 2 * e * row_bytes / t / 1e9)

    for k, (t, gbs) in results.items():
        print(f"{k:24s} {t*1e3:9.2f} ms   {gbs:8.1f} GB/s (edge-row bytes)")


if __name__ == "__main__":
    main()
