"""Multi-chip scaling: jax.sharding Mesh / shard_map partitioned aggregation.

Replaces the reference's mpi4py coordinator pattern (main.py:1191-1212) with
device meshes and XLA collectives over ICI/DCN.
"""

from mpgnn_tpu.parallel.mesh import make_mesh, replicated, shard_along
from mpgnn_tpu.parallel.shard import (
    edge_partitioned_aggregate,
    build_sharded_train_step,
    sharded_flat_sweep_args,
    shard_edges,
)
from mpgnn_tpu.parallel.halo import (
    HaloPlan,
    build_halo_plan,
    halo_sharded_mean_aggregate,
    pad_node_features,
    shard_graph_features,
    build_node_sharded_train_step,
)

__all__ = [
    "make_mesh",
    "replicated",
    "shard_along",
    "edge_partitioned_aggregate",
    "build_sharded_train_step",
    "sharded_flat_sweep_args",
    "shard_edges",
    "HaloPlan",
    "build_halo_plan",
    "halo_sharded_mean_aggregate",
    "pad_node_features",
    "shard_graph_features",
    "build_node_sharded_train_step",
]
