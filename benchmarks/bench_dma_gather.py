"""In-kernel DMA row gather vs the XLA gather (VERDICT r3 item 3).

The csr kernel's remaining wall is the XLA row gather: 201-206 Mrows/s at
256-byte rows (~5 ns/row, 51.5 GB/s = 6.3% of HBM peak), pattern-
insensitive (benchmarks/GATHER_ROOFLINE.json). DESIGN.md dismissed an
in-kernel alternative with an unmeasured clause ("a DMA-per-row
formulation is descriptor-bound"). This experiment MEASURES it: a Pallas
kernel that gathers rows by issuing one async HBM->VMEM DMA per
CONTIGUOUS RUN of rows, with the run length as the experiment variable:

  rows_per_run = 1     the true DMA-per-row formulation (descriptor rate)
  rows_per_run = 4..64 batched multi-row descriptors — what the csr
                       blocking's sorted columns could exploit when runs
                       exist (~1.04 rows on a uniform-random graph;
                       longer on power-law / locality-reordered graphs)

Grid walks tiles of ``runs_per_tile`` runs; each tile's run-start rows
arrive as an SMEM input block, the full feature array stays in HBM
(memory_space=ANY), DMAs fan out over a 16-slot semaphore ring and the
tile drains them before Mosaic revolves the output buffer.

Timing methodology matches benchmarks/bench_gather_roofline.py exactly
(dependent scan, full-sum consumer) so the XLA arm reproduces the
published roofline number.

Decision rule (recorded in docs/DESIGN.md): if rows/s at run=1 beats the
XLA gather by >=1.5x, wire a DMA gather into ops/pallas_csr; otherwise
the measured numbers replace the unsupported clause as a negative result.

Run on the real chip:  python benchmarks/bench_dma_gather.py
Emits one JSON line and writes benchmarks/DMA_GATHER.json.
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ITERS = 10
SEM_SLOTS = 16


@functools.lru_cache(maxsize=None)
def _dma_gather_call(t: int, runs_per_tile: int, rows_per_run: int,
                     n: int, f: int):
    et = runs_per_tile * rows_per_run

    def kernel(idx_hbm, x_ref, o_ref, idx_s, sem, isem):
        # fetch this tile's run starts HBM -> SMEM (scratch SMEM has no
        # block-tiling constraint, unlike an SMEM-space BlockSpec input)
        icp = pltpu.make_async_copy(
            idx_hbm.at[pl.program_id(0)], idx_s, isem
        )
        icp.start()
        icp.wait()

        def copy(r):
            return pltpu.make_async_copy(
                x_ref.at[pl.ds(idx_s[0, r], rows_per_run), :],
                o_ref.at[pl.ds(r * rows_per_run, rows_per_run), :],
                sem.at[r % SEM_SLOTS],
            )

        # issue with a ring of SEM_SLOTS outstanding copies: wait a slot's
        # previous copy before reusing it
        def issue(r, _):
            @pl.when(r >= SEM_SLOTS)
            def _():
                copy(r - SEM_SLOTS).wait()

            copy(r).start()
            return 0

        jax.lax.fori_loop(0, runs_per_tile, issue, 0)

        # drain the last outstanding copies
        def drain(r, _):
            copy(r).wait()
            return 0

        jax.lax.fori_loop(
            max(runs_per_tile - SEM_SLOTS, 0), runs_per_tile, drain, 0
        )

    return pl.pallas_call(
        kernel,
        grid=(t,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # [t, 1, R] run starts
            pl.BlockSpec(memory_space=pltpu.ANY),   # x stays in HBM
        ],
        out_specs=pl.BlockSpec((et, f), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((t * et, f), jnp.float32),
        scratch_shapes=[
            pltpu.SMEM((1, runs_per_tile), jnp.int32),
            pltpu.SemaphoreType.DMA((SEM_SLOTS,)),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=jax.devices()[0].platform != "tpu",
    )


def dma_gather(x, run_starts_2d, rows_per_run):
    """out[k*rows_per_run + j] = x[run_starts[k] + j]; run_starts [T, R]."""
    t, runs_per_tile = run_starts_2d.shape
    call = _dma_gather_call(t, runs_per_tile, rows_per_run,
                            x.shape[0], x.shape[1])
    return call(run_starts_2d.reshape(t, 1, runs_per_tile), x)


def timeit(fn, x):
    """Dependent-scan timing, identical to bench_gather_roofline.timeit:
    each iteration's input depends on the previous output (no hoisting),
    the consumer is a full column-sum (no partial-DCE asymmetry)."""

    @jax.jit
    def run(x):
        def body(x, _):
            out = fn(x)
            return x + jnp.sum(out, axis=0)[None, :] * 1e-30, 0

        x, _ = jax.lax.scan(body, x, None, length=ITERS)
        return x.ravel()[0]

    float(run(x))
    t0 = time.perf_counter()
    float(run(x))
    return (time.perf_counter() - t0) / ITERS


def main():
    n = 500_000
    f = 128                     # 512-byte rows (Mosaic memref slices must be
                                # 128-lane aligned; the XLA roofline is the
                                # same ~202 Mrows/s at 256 B and 512 B)
    total_rows = 2_097_152      # 2M rows gathered per invocation
    runs_per_tile = 256
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((n, f)).astype(np.float32))
    dev = jax.devices()[0]
    out = {"n": n, "f": f, "rows": total_rows,
           "device": str(getattr(dev, "device_kind", dev.platform))}
    print(f"device={out['device']} rows={total_rows} row_bytes={f*4}",
          file=sys.stderr, flush=True)

    # XLA gather reference on the same index count / width (the published
    # roofline's exact formulation)
    idx = jnp.asarray(rng.integers(0, n, total_rows + 1).astype(np.int32))
    t_ref = timeit(lambda x: x[idx][:total_rows], x)
    out["xla_gather"] = {
        "ms": round(t_ref * 1e3, 2),
        "mrows_s": round(total_rows / t_ref / 1e6, 1),
    }
    print(f"  xla gather: {t_ref*1e3:.1f} ms "
          f"({out['xla_gather']['mrows_s']} Mrows/s)",
          file=sys.stderr, flush=True)

    for rows_per_run in (1, 4, 16, 64):
        runs = total_rows // rows_per_run
        t_tiles = runs // runs_per_tile
        starts = rng.integers(
            0, n - rows_per_run, (t_tiles, runs_per_tile)
        ).astype(np.int32)
        # correctness first: one tile against numpy
        got = np.asarray(dma_gather(x, jnp.asarray(starts[:1]), rows_per_run))
        want = np.concatenate([
            np.asarray(x[s: s + rows_per_run]) for s in starts[0]
        ])
        np.testing.assert_array_equal(got, want)
        starts_d = jnp.asarray(starts)
        t = timeit(lambda x: dma_gather(x, starts_d, rows_per_run), x)
        key = f"dma_run{rows_per_run}"
        out[key] = {
            "ms": round(t * 1e3, 2),
            "mrows_s": round(total_rows / t / 1e6, 1),
            "ns_per_descriptor": round(t / runs * 1e9, 1),
        }
        print(f"  dma rows_per_run={rows_per_run}: {t*1e3:.1f} ms "
              f"({out[key]['mrows_s']} Mrows/s, "
              f"{out[key]['ns_per_descriptor']} ns/descriptor)",
              file=sys.stderr, flush=True)

    out["dma_run1_vs_xla"] = round(
        out["dma_run1"]["mrows_s"] / out["xla_gather"]["mrows_s"], 2
    )

    # run-length structure of a REAL csr blocking's gather columns: how
    # often do contiguous runs (the multi-row-descriptor opportunity)
    # actually occur? The blocking sorts columns within each row block,
    # so runs = consecutive column values differing by exactly 1.
    from mpgnn_tpu.ops.pallas_csr import build_csr_blocking

    e_real = 10_000_000
    src = np.sort(rng.integers(0, n, size=e_real))
    dst = rng.integers(0, n, size=e_real)
    fwd, _ = build_csr_blocking(src, dst, n)
    gidx = np.asarray(fwd.gidx[:-1])
    w = np.asarray(fwd.weight)
    real = gidx[w > 0]                       # drop pad slots
    brk = np.nonzero(np.diff(real) != 1)[0]
    run_lens = np.diff(np.concatenate([[-1], brk, [len(real) - 1]]))
    out["real_blocking_runs"] = {
        "edges": int(len(real)),
        "mean_run_len": round(float(run_lens.mean()), 3),
        "pct_rows_in_runs_ge4": round(
            100 * float(run_lens[run_lens >= 4].sum()) / len(real), 2
        ),
    }
    print(f"  real blocking (E=10M uniform): mean run "
          f"{out['real_blocking_runs']['mean_run_len']}, "
          f"{out['real_blocking_runs']['pct_rows_in_runs_ge4']}% of rows "
          f"in runs >=4", file=sys.stderr, flush=True)
    print(json.dumps(out))
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "DMA_GATHER.json"), "w") as fh:
        json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
