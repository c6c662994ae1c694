"""Multi-device scaling benchmark — edge-partitioned aggregation.

Measures edges/s of the edge-partitioned mean aggregation (shard_map +
psum over the 'data' mesh axis) at 1..N devices. On a real multi-chip slice
this reports ICI scaling efficiency against the BASELINE.md north star
(>= 80% linear). On this single-chip image it runs on N virtual CPU devices
(XLA_FLAGS=--xla_force_host_platform_device_count) to validate the scaling
HARNESS and collectives; absolute CPU numbers are not the target metric.

    python bench_scaling.py [--devices 8] [--edges 2000000] [--platform cpu]
"""

import argparse
import json
import os
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=0, help="0 = all available")
    ap.add_argument("--edges", type=int, default=2_000_000)
    ap.add_argument("--nodes", type=int, default=100_000)
    ap.add_argument("--feat", type=int, default=64)
    ap.add_argument("--platform", type=str, default=None)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    from mpgnn_tpu.utils.prof import enable_compilation_cache

    enable_compilation_cache()

    if args.platform == "cpu" and "jax" not in sys.modules:
        os.environ["PALLAS_AXON_POOL_IPS"] = ""
        os.environ["JAX_PLATFORMS"] = "cpu"
        n_want = args.devices or 8
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={n_want}"
            ).strip()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from mpgnn_tpu.parallel import (
        edge_partitioned_aggregate,
        make_mesh,
        shard_edges,
    )

    devices = jax.devices()
    n_max = args.devices or len(devices)
    rng = np.random.default_rng(0)
    N, E, F = args.nodes, args.edges, args.feat
    src = np.sort(rng.integers(0, N, E)).astype(np.int32)
    dst = rng.integers(0, N, E).astype(np.int32)
    mask = np.ones(E, dtype=bool)
    x = rng.normal(size=(N, F)).astype(np.float32)

    from jax.sharding import NamedSharding, PartitionSpec

    from mpgnn_tpu.parallel.halo import (
        build_halo_plan,
        halo_sharded_mean_aggregate,
        pad_node_features,
    )

    results = {}
    halo_results = {}
    base = halo_base = None
    counts = [n for n in (1, 2, 4, 8, 16, 32) if n <= n_max]
    for n in counts:
        # --- edge partitioning (features replicated, psum of partials)
        mesh = make_mesh((n,), ("data",), devices[:n])
        src_p, _ = shard_edges(src, mesh)
        dst_p, _ = shard_edges(dst, mesh)
        mask_p, _ = shard_edges(mask, mesh)

        @jax.jit
        def agg(x):
            return edge_partitioned_aggregate(
                mesh, x, jnp.asarray(src_p), jnp.asarray(dst_p),
                jnp.asarray(mask_p), N,
            )

        r = agg(jnp.asarray(x))
        jax.block_until_ready(r)
        t0 = time.time()
        for _ in range(args.iters):
            r = agg(jnp.asarray(x))
        jax.block_until_ready(r)
        dt = (time.time() - t0) / args.iters
        eps = E / dt
        base = base or eps
        results[n] = {
            "edges_per_s": round(eps, 1),
            "efficiency": round(eps / (base * n), 3),
        }
        print(
            f"[edge-partition] {n} device(s): {eps/1e6:.2f}M edges/s "
            f"(efficiency {eps/(base*n)*100:.0f}%)",
            file=sys.stderr, flush=True,
        )

        # --- node sharding with halo all_to_all (features sharded)
        if n > 1:
            node_mesh = make_mesh((n,), ("nodes",), devices[:n])
            plan = build_halo_plan(src, dst, N, n)
            x_sh = jax.device_put(
                pad_node_features(x, plan),
                NamedSharding(node_mesh, PartitionSpec("nodes")),
            )

            @jax.jit
            def hagg(x_sh):
                return halo_sharded_mean_aggregate(node_mesh, x_sh, plan)

            r = hagg(x_sh)
            jax.block_until_ready(r)
            t0 = time.time()
            for _ in range(args.iters):
                r = hagg(x_sh)
            jax.block_until_ready(r)
            dt = (time.time() - t0) / args.iters
            heps = E / dt
            halo_base = halo_base or heps / n
            halo_results[n] = {
                "edges_per_s": round(heps, 1),
                "efficiency": round(heps / (halo_base * n), 3),
            }
            print(
                f"[halo-sharded]   {n} device(s): {heps/1e6:.2f}M edges/s",
                file=sys.stderr, flush=True,
            )

    print(json.dumps({
        "metric": "multi_device_agg_scaling",
        "platform": devices[0].platform,
        "edge_partitioned": results,
        "halo_sharded": halo_results,
    }))


if __name__ == "__main__":
    main()
