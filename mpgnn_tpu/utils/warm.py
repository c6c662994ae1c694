"""Compile-ahead warming for the search's known jit signatures.

The TPU in this environment is reached over a tunnel whose remote compiles
measured 20-577 s per program and whose FIRST device interaction per process
can stall minutes even with a hot persistent cache (docs/DESIGN.md §3). The
search's device programs have a small, largely predictable signature set
(pow2-bucketed shapes), so instead of paying each compile serially at the
moment the search first needs it, a ``ProgramWarmer`` issues the same calls
with dummy operands from background threads:

* ``poke_device()``  — a trivial op at process start, so the per-process
  first-use tunnel stall overlaps data loading instead of blocking hop 0;
* ``warm_flat(...)`` — the hop-0 sweep's exact chunk signatures (they are a
  pure function of the candidate set and the degree buckets);
* ``warm_bag_signature(...)`` — one bag-sweep restart-round signature; the
  sweep itself calls this for every distinct chunk signature BEFORE doing
  its host-side bag bookkeeping, overlapping compile with prep.

Warming works by invoking the real module-level jitted functions (their jit
cache is process-global), so a warmed signature makes the search's first
real call a pure cache hit. Dummy operands are zeros; epochs/lr statics must
match the search config. The reference has no equivalent subsystem (its MPI
ranks pay torch's eager overhead per call).
"""

from __future__ import annotations

import logging
import threading
from concurrent.futures import Future, ThreadPoolExecutor
from typing import Dict, List, Optional, Sequence, Tuple

log = logging.getLogger("mpgnn_tpu.warm")


class ProgramWarmer:
    """Background compile-ahead executor.

    Thread-safe; dedupes signatures so repeated requests are free. All
    warming is best-effort: failures are logged, never raised (a warm miss
    just means the search pays the compile itself, as without warming).
    """

    def __init__(self, max_workers: int = 4):
        self._pool = ThreadPoolExecutor(
            max_workers=max_workers, thread_name_prefix="mpgnn-warm"
        )
        self._seen: set = set()
        self._lock = threading.Lock()
        self._futures: List[Future] = []

    def _claim(self, key) -> bool:
        """Atomically mark ``key`` as handled; False if already seen."""
        with self._lock:
            if key in self._seen:
                return False
            self._seen.add(key)
            return True

    def _enqueue(self, key, fn, *args, **kwargs) -> None:
        def task():
            import time

            t0 = time.time()
            try:
                fn(*args, **kwargs)
                log.info("warmed %s in %.1fs", key, time.time() - t0)
            except Exception as e:  # best-effort by design
                log.warning("warm %s failed: %s", key, e)

        with self._lock:
            self._futures.append(self._pool.submit(task))

    def _submit(self, key, fn, *args, **kwargs) -> None:
        if self._claim(key):
            self._enqueue(key, fn, *args, **kwargs)

    # ------------------------------------------------------------- warmers
    def poke_device(self) -> None:
        """Touch the device with a trivial program so the per-process
        first-interaction tunnel stall runs concurrently with host-side
        setup."""

        def poke():
            import jax
            import jax.numpy as jnp

            jax.block_until_ready(jnp.zeros((8, 8)) @ jnp.zeros((8, 8)))

        self._submit("poke", poke)

    def warm_flat(self, graph, relations: Sequence[int], cfg) -> None:
        """Pre-compile the hop-0 flat sweep for its exact chunk signatures
        (search/scoring.py::_chunks is deterministic in the candidate set)."""
        from mpgnn_tpu.search import scoring as sc

        N = graph.num_nodes
        for mode, pad, cpad, chunk in sc._chunks(list(relations), graph):
            self.warm_flat_signature(
                len(chunk), N, pad, cfg.epochs_flat, cfg.lr, mode=mode,
                C=cpad,
            )

    def warm_flat_signature(
        self, R: int, N: int, D: int, epochs: int, lr: float,
        mode: str = "ell", C: int = 0,
    ) -> None:
        """``D`` is the degree pad for mode='ell', the edge pad for 'seg';
        ``C`` is the seg form's compact node-space width (ignored for
        'ell', which runs in the full node space)."""

        def build_and_call():
            import jax.numpy as jnp

            from mpgnn_tpu.search import scoring as sc

            if mode == "ell":
                sc._flat_sweep(
                    jnp.zeros((R, N), jnp.float32),
                    jnp.zeros((R, N, D), jnp.int32),
                    jnp.zeros((R, N, D), bool),
                    jnp.zeros((R, N), jnp.float32),
                    jnp.zeros((N,), jnp.float32),
                    epochs=epochs, lr=lr,
                )
            else:
                sc._flat_sweep_seg(
                    jnp.zeros((R, C), jnp.float32),       # w0 (compact)
                    jnp.full((R, D), C - 1, jnp.int32),   # src (sorted pad)
                    jnp.zeros((R, D), jnp.int32),         # dst
                    jnp.zeros((R, D), bool),              # emask
                    jnp.zeros((R, C), jnp.float32),       # loss_mask
                    jnp.zeros((R, C), jnp.float32),       # y
                    jnp.ones((R,), jnp.float32),          # denom
                    jnp.zeros((R,), jnp.float32),         # const
                    epochs=epochs, lr=lr,
                )

        self._submit(("flat", mode, R, N, D, C, epochs, lr), build_and_call)

    def warm_bag_signature(
        self, R: int, N: int, D: int, B: int, M: int, F: int,
        epochs: int, lr: float, mode: str = "ell", C: int = 0, P: int = 0,
    ) -> None:
        """Pre-compile one bag-sweep restart-round signature.
        ``D`` is the degree pad for mode='ell', the edge pad for 'seg';
        ``C`` the seg form's compact node-space width and ``P`` its
        flattened member-segment width (the seg form ships member
        segments, not dense [B, M] bag tables)."""

        def build_and_call():
            import jax.numpy as jnp

            from mpgnn_tpu.search import scoring as sc

            if mode == "ell":
                ops = (
                    jnp.zeros((R, N, D), jnp.int32),    # nbr
                    jnp.zeros((R, N, D), bool),         # nbr_mask
                )
                bag_ops = (
                    jnp.zeros((R, B, M), jnp.int32),    # bags
                    jnp.zeros((R, B, M), bool),         # member_mask
                )
                fn = sc._bag_round
                W, xa = N, jnp.zeros((N, F), jnp.float32)
            else:
                ops = (
                    jnp.full((R, D), C - 1, jnp.int32),  # src (sorted pad)
                    jnp.zeros((R, D), jnp.int32),        # dst
                    jnp.zeros((R, D), bool),             # emask
                )
                bag_ops = (
                    jnp.zeros((R, P), jnp.int32),            # member_node
                    jnp.full((R, P), B - 1, jnp.int32),      # member_bag
                    jnp.zeros((R, P), bool),                 # member_mask
                )
                fn = sc._bag_round_seg
                W, xa = C, jnp.zeros((R, C, F), jnp.float32)
            fn(
                jnp.zeros((R, W), jnp.float32),     # w0
                jnp.zeros((R, F), jnp.float32),     # u0
                *ops, *bag_ops,
                jnp.zeros((R, B), jnp.float32),     # bag_labels
                jnp.zeros((R, B), jnp.float32),     # bag_keep
                jnp.zeros((R, W), jnp.float32),     # grad_mask
                jnp.zeros((R, W), bool),            # frozen_mask
                xa,                                 # x
                epochs=epochs, lr=lr,
            )

        self._submit(
            ("bag", mode, R, N, D, C, P, B, M, F, epochs, lr), build_and_call
        )

    def warm_eval(
        self, graph, paths, split, num_classes, cfg, seed, x_override,
        existing=None,
    ) -> None:
        """AOT-compile the batched final-eval program for one candidate-
        length group the moment its membership is final (its hop finished):
        ``evaluate_candidates(compile_only=True)`` lowers+compiles without
        touching the device, so the compile overlaps the remaining hops'
        sweeps and the search's final eval is a cache hit.

        ``existing`` is a crash-resume partial-results dict (path-str ->
        loss): chunks it fully covers are skipped by the compile_only pass
        exactly as the real resumed eval will skip them — without it a
        resume would AOT-compile per-chunk csr programs nobody runs."""
        if not paths:
            return
        if cfg.backend == "dense":
            # the dense eval program's adjacency stack + static groups
            # depend on the FULL final path set, not one length group —
            # a per-group warm would compile a program the final call can
            # never reuse (and allocate [Ru, N, N] stacks on device)
            return
        from mpgnn_tpu.train import batch_eval as be

        # dedup on the COMPILE signatures (shapes + statics incl. the split
        # sizes and num_classes), not the path set: a later one-vs-rest
        # class with an identical path set but different split/classes IS a
        # different program and must be re-warmed
        aot_keys = be.eval_aot_keys(
            graph, paths, split, num_classes, cfg, seed
        )
        key = ("eval", tuple(aot_keys))
        if not self._claim(key):
            return
        # register in-flight events SYNCHRONOUSLY, before the pool picks the
        # task up: a real call that reaches this group while every warm
        # worker is still busy must find the event and wait on it rather
        # than duplicate the 20-577s remote compile. Registration happens
        # only on a fresh claim — a consumed warm's popped events must not
        # be resurrected as events nobody will set. claim_aot_keys records
        # per-key ownership: when two warm tasks' key sets overlap, only
        # the task that created a key's event compiles it.
        token, events = be.claim_aot_keys(aot_keys)

        def build():
            try:
                # bind this pool thread to the pre-registered keys it owns
                # so the compile_only pass doesn't mistake its own unset
                # events for another task's in-progress compile and skip
                with be._owned_aot_keys(token):
                    be.evaluate_candidates(
                        graph, paths, split, num_classes, cfg, seed=seed,
                        x_override=x_override, compile_only=True,
                        existing=existing,
                    )
            finally:
                # groups the compile never reached (early failure) must not
                # leave a real call blocked on an event nobody will set
                for ev in events:
                    ev.set()

        self._enqueue(key, build)

    # ---------------------------------------------------------------- sync
    def wait(self, timeout: Optional[float] = None) -> None:
        """Block until all submitted warms finish (tests / shutdown)."""
        with self._lock:
            futures = list(self._futures)
        for f in futures:
            try:
                f.result(timeout=timeout)
            except Exception:
                pass

    def shutdown(self) -> None:
        self._pool.shutdown(wait=False)


_global_warmer: Optional[ProgramWarmer] = None


def get_warmer(enabled: bool = True) -> Optional[ProgramWarmer]:
    """Process-global warmer (None when disabled)."""
    global _global_warmer
    if not enabled:
        return None
    if _global_warmer is None:
        _global_warmer = ProgramWarmer()
    return _global_warmer
