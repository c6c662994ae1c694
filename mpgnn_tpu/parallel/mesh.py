"""Device-mesh construction helpers.

The reference's distribution model is 10 MPI processes with rank-0 owning all
graph state and pickled broadcasts (main.py:1191-1212, run.sh:32). The
TPU-native model: a ``jax.sharding.Mesh`` over the slice, named axes for the
parallelism dimensions this framework actually uses:

* ``rel``  — relation/candidate sweep axis (the reference's only
             parallelism, task fan-out over relations, main.py:1319/1400)
* ``data`` — edge partition axis (graph sharding; new capability)
* ``model``— hidden-dimension tensor parallelism for the GEMMs
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    axis_shapes: Optional[Tuple[int, ...]] = None,
    axis_names: Sequence[str] = ("data", "model"),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a mesh over the available devices.

    Default: all devices on the 'data' axis, 1 on 'model'. Pass explicit
    ``axis_shapes`` (must multiply to the device count) for 2D layouts, e.g.
    ``(4, 2)`` on 8 chips."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if axis_shapes is None:
        axis_shapes = (n,) + (1,) * (len(axis_names) - 1)
    if int(np.prod(axis_shapes)) != n:
        raise ValueError(f"axis shapes {axis_shapes} != {n} devices")
    dev_array = np.asarray(devices).reshape(axis_shapes)
    return Mesh(dev_array, axis_names=tuple(axis_names))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_along(mesh: Mesh, axis: str, dim: int = 0) -> NamedSharding:
    spec = [None] * (dim + 1)
    spec[dim] = axis
    return NamedSharding(mesh, P(*spec))


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> int:
    """Multi-host bootstrap (jax.distributed). On a real pod slice call this
    once per host before building meshes; on single-host environments it is
    a no-op. Returns the global device count. The TPU-native replacement for
    the reference's `mpiexec -n 10` + MPI.COMM_WORLD bootstrap
    (main.py:1191-1195, run.sh:32)."""
    import jax

    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return len(jax.devices())
