"""Elastic multi-chip training: checkpoint, failure recovery, mesh resize.

The reference's distributed story is an mpiexec fan-out with no recovery —
one dead rank kills the whole search job (SURVEY §5: no failure detection,
no checkpoint/resume). Here the sharded MPGNN training step
(parallel/shard.py) composes with device-count-portable checkpoints:

* ``save_train_state`` gathers the sharded (params, opt_state) to host and
  writes one orbax checkpoint — layout-free, so a restore can re-place it
  on ANY mesh;
* ``resume_train_step`` rebuilds the jitted step on a NEW mesh (fewer or
  more chips) and loads the state onto that mesh's shardings;
* ``train_elastic`` is the supervising loop: run steps, checkpoint every
  ``checkpoint_every``, and on a step failure (a raised exception — on real
  hardware an ``XlaRuntimeError`` from a lost chip) shrink the device list,
  rebuild the mesh, and resume from the last checkpoint.

On TPU pods the failure signal comes from the runtime (a collective times
out / a chip drops off ICI); the recovery path exercised here — host-side
state, new mesh, re-placement, continue — is identical, and is validated on
a simulated multi-device CPU mesh in tests/test_elastic.py.
"""

from __future__ import annotations

import dataclasses
import logging
import os
from typing import Callable, List, Optional, Sequence, Tuple

import jax
import numpy as np

from mpgnn_tpu.config import MPGNNConfig
from mpgnn_tpu.graph.hetero import HeteroGraph, NodeSplit
from mpgnn_tpu.parallel.mesh import make_mesh
from mpgnn_tpu.parallel.shard import build_sharded_train_step

log = logging.getLogger("mpgnn_tpu.elastic")


def _to_host(tree):
    return jax.tree_util.tree_map(lambda a: np.asarray(jax.device_get(a)), tree)


def save_train_state(path: str, step: int, params, opt_state) -> None:
    """Write a mesh-layout-free training checkpoint (orbax)."""
    import orbax.checkpoint as ocp

    state = {
        "step": np.asarray(step),
        "params": _to_host(params),
        "opt_state": _to_host(opt_state),
    }
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), state, force=True)
    ckptr.wait_until_finished()


def load_train_state(path: str, like_params, like_opt_state):
    """Restore (step, params, opt_state) as host pytrees."""
    import orbax.checkpoint as ocp

    target = {
        "step": np.asarray(0),
        "params": _to_host(like_params),
        "opt_state": _to_host(like_opt_state),
    }
    ckptr = ocp.StandardCheckpointer()
    state = ckptr.restore(os.path.abspath(path), target=target)
    return int(state["step"]), state["params"], state["opt_state"]


def resume_train_step(
    ckpt_path: str,
    devices: Sequence[jax.Device],
    graph: HeteroGraph,
    metapaths,
    split: NodeSplit,
    num_classes: int,
    cfg: Optional[MPGNNConfig] = None,
    axis_shapes: Optional[Tuple[int, ...]] = None,
    seed: int = 0,
):
    """Rebuild the sharded step on a fresh mesh over ``devices`` and load
    the checkpoint onto it. Returns (step_fn, params, opt_state, start_step,
    mesh)."""
    mesh = make_mesh(axis_shapes, devices=devices)
    # structure donors (cheap: init on the new mesh), then restore values
    step_fn, p0, o0 = build_sharded_train_step(
        mesh, graph, metapaths, split, num_classes, cfg, seed=seed
    )
    start, params_h, opt_h = load_train_state(ckpt_path, p0, o0)
    step_fn, params, opt_state = build_sharded_train_step(
        mesh, graph, metapaths, split, num_classes, cfg, seed=seed,
        init_params=params_h, init_opt_state=opt_h,
    )
    return step_fn, params, opt_state, start, mesh


@dataclasses.dataclass
class ElasticResult:
    losses: List[float]
    steps_run: int
    recoveries: int
    final_device_count: int
    params: object


def train_elastic(
    graph: HeteroGraph,
    metapaths,
    split: NodeSplit,
    num_classes: int,
    num_steps: int,
    ckpt_path: str,
    cfg: Optional[MPGNNConfig] = None,
    devices: Optional[Sequence[jax.Device]] = None,
    axis_shapes: Optional[Tuple[int, ...]] = None,
    checkpoint_every: int = 10,
    seed: int = 0,
    min_devices: int = 1,
    fault_hook: Optional[Callable[[int], None]] = None,
) -> ElasticResult:
    """Supervised elastic training loop.

    Runs ``num_steps`` sharded steps, checkpointing every
    ``checkpoint_every``. Any exception from a step (real: a chip dropping
    off the mesh; tests inject one via ``fault_hook(step)``) triggers
    recovery: halve the device list (a lost chip takes its ICI ring
    neighbor's bandwidth with it, so shrink to the largest power of two),
    rebuild the mesh, restore the last checkpoint, continue. Raises if
    fewer than ``min_devices`` remain."""
    cfg = cfg or MPGNNConfig()
    devices = list(devices if devices is not None else jax.devices())
    mesh = make_mesh(axis_shapes, devices=devices)
    step_fn, params, opt_state = build_sharded_train_step(
        mesh, graph, metapaths, split, num_classes, cfg, seed=seed
    )
    save_train_state(ckpt_path, 0, params, opt_state)

    losses: List[float] = []
    recoveries = 0
    step = 0
    rng = jax.random.PRNGKey(seed + 1)
    while step < num_steps:
        try:
            if fault_hook is not None:
                fault_hook(step)
            params, opt_state, loss = step_fn(
                params, opt_state, jax.random.fold_in(rng, step)
            )
            losses.append(float(loss))
            step += 1
            if step % checkpoint_every == 0:
                save_train_state(ckpt_path, step, params, opt_state)
        except Exception as e:  # noqa: BLE001 — any step failure recovers
            new_n = max(1, 2 ** int(np.log2(max(len(devices) - 1, 1))))
            if new_n < min_devices:
                raise
            devices = devices[:new_n]
            log.warning(
                "step %d failed (%s); recovering on %d devices from %s",
                step, e, len(devices), ckpt_path,
            )
            recoveries += 1
            step_fn, params, opt_state, step, mesh = resume_train_step(
                ckpt_path, devices, graph, metapaths, split, num_classes,
                cfg, axis_shapes=None, seed=seed,
            )
    save_train_state(ckpt_path, step, params, opt_state)
    return ElasticResult(
        losses=losses, steps_run=step, recoveries=recoveries,
        final_device_count=len(devices), params=params,
    )
