"""Active sweep-mesh context — multi-device execution of the search sweeps.

The reference distributes its search with `mpiexec -n 10`: relations are
`np.array_split` across ranks for the hop-0 and bag sweeps
(main.py:1319, 1400) and candidate metapaths for the final eval
(main.py:1444-1450), with the whole graph replicated into every rank. The
TPU-native equivalent: the sweeps are ALREADY vmapped over a leading
relation/instance/candidate axis, so distributing them is a *placement*
decision, not new code — shard that batch axis across the mesh, replicate
the graph-shaped operands, and GSPMD runs each device's shard locally
(the sweep is embarrassingly parallel; no collectives are generated).

This module holds the process-wide active mesh, set by the CLI
(``run.py --mesh``) or by ``sweep_mesh(...)``; the scoring sweeps
(search/scoring.py) and batched candidate eval (train/batch_eval.py)
consult it at dispatch time and shard their batch arguments when present.
"""

from __future__ import annotations

import contextlib
import threading
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_state = threading.local()
_GLOBAL: Optional[Mesh] = None   # set_sweep_mesh (CLI) is process-wide; the
                                 # context manager shadows it per-thread


def set_sweep_mesh(mesh: Optional[Mesh]) -> Optional[Mesh]:
    """Install ``mesh`` as the process-wide sweep mesh; returns the old one."""
    global _GLOBAL
    old, _GLOBAL = _GLOBAL, mesh
    return old


def get_sweep_mesh() -> Optional[Mesh]:
    return getattr(_state, "mesh", None) or _GLOBAL


@contextlib.contextmanager
def sweep_mesh(mesh: Optional[Mesh]):
    prev = getattr(_state, "mesh", None)
    _state.mesh = mesh
    try:
        yield mesh
    finally:
        _state.mesh = prev


def sweep_devices() -> int:
    """Device count of the active sweep mesh (1 when none)."""
    mesh = get_sweep_mesh()
    return int(mesh.devices.size) if mesh is not None else 1


def _batch_sharding(mesh: Mesh) -> NamedSharding:
    # dim 0 sharded over ALL mesh axes jointly — the sweep axis uses every
    # device regardless of how the mesh was factored (data/model/rel)
    return NamedSharding(mesh, P(tuple(mesh.axis_names)))


def shard_sweep(*arrays):
    """Place batch arrays with dim 0 sharded across the active mesh.

    No active mesh, or a dim 0 not divisible by the device count (a chunk
    smaller than the mesh — the memory budget can cap chunks below it):
    arrays pass through unplaced (single-device dispatch as before)."""
    mesh = get_sweep_mesh()
    if mesh is None:
        return arrays if len(arrays) != 1 else arrays[0]
    n = int(mesh.devices.size)
    sh = _batch_sharding(mesh)
    out = []
    for a in arrays:
        if a.shape and a.shape[0] % n == 0:
            out.append(jax.device_put(a, sh))
        else:
            out.append(jax.device_put(a, NamedSharding(mesh, P())))
    return out if len(out) != 1 else out[0]


def replicate_sweep(*arrays):
    """Replicate graph-shaped operands onto the active mesh (no-op without
    one). Keeps jit from guessing placements when batch args are sharded."""
    mesh = get_sweep_mesh()
    if mesh is None:
        return arrays if len(arrays) != 1 else arrays[0]
    sh = NamedSharding(mesh, P())
    out = [jax.device_put(a, sh) for a in arrays]
    return out if len(out) != 1 else out[0]


def shard_sweep_tree(tree):
    """``shard_sweep`` over every array leaf of a pytree (dim 0 batch)."""
    mesh = get_sweep_mesh()
    if mesh is None:
        return tree
    return jax.tree_util.tree_map(lambda a: shard_sweep(a), tree)


def sweep_pad(n: int) -> int:
    """Round a batch length up to a multiple of the mesh device count."""
    d = sweep_devices()
    return -(-n // d) * d


def pad_batch_list(items: list) -> list:
    """Pad a batch list to the mesh multiple by repeating the last element
    (the sweeps' existing pow2-padding convention; callers dedup results)."""
    if not items:
        return items
    target = sweep_pad(len(items))
    return items + [items[-1]] * (target - len(items))


def abstract_with_batch_sharding(tree):
    """ShapeDtypeStructs for AOT lowering, carrying the dim-0 batch sharding
    the real call will use — so a warm compiled under an active mesh yields
    an executable whose argument layouts match the sharded real arguments."""
    mesh = get_sweep_mesh()

    def one(a):
        if mesh is None:
            return jax.ShapeDtypeStruct(a.shape, a.dtype)
        n = int(mesh.devices.size)
        sh = (_batch_sharding(mesh) if (a.shape and a.shape[0] % n == 0)
              else NamedSharding(mesh, P()))
        return jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=sh)

    return jax.tree_util.tree_map(one, tree)


def abstract_replicated(tree):
    """ShapeDtypeStructs carrying the replicated sharding of the active mesh
    (plain ShapeDtypeStructs when none) — AOT counterpart of
    ``replicate_sweep``."""
    mesh = get_sweep_mesh()

    def one(a):
        if mesh is None:
            return jax.ShapeDtypeStruct(a.shape, a.dtype)
        return jax.ShapeDtypeStruct(
            a.shape, a.dtype, sharding=NamedSharding(mesh, P())
        )

    return jax.tree_util.tree_map(one, tree)


def mesh_from_spec(spec: str, devices=None) -> Mesh:
    """Parse a CLI mesh spec: ``"8"`` (one unnamed fan-out axis), ``"rel=8"``,
    or ``"data=4,model=2"``. Axis sizes must multiply to the device count;
    a single ``-1`` axis size is inferred."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    names, sizes = [], []
    for part in spec.split(","):
        part = part.strip()
        if not part:
            continue
        if "=" in part:
            k, v = part.split("=")
            names.append(k.strip())
            sizes.append(int(v))
        else:
            names.append("rel")
            sizes.append(int(part))
    if not names:
        names, sizes = ["rel"], [n]
    if sizes.count(-1) == 1:
        known = int(np.prod([s for s in sizes if s != -1]))
        sizes[sizes.index(-1)] = n // max(known, 1)
    if int(np.prod(sizes)) != n:
        raise ValueError(
            f"mesh spec {spec!r} = {sizes} does not multiply to the "
            f"{n} available devices"
        )
    dev_array = np.asarray(devices).reshape(sizes)
    return Mesh(dev_array, axis_names=tuple(names))
