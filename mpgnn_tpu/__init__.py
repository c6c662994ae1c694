"""mpgnn_tpu — a TPU-native framework for meta-path learning on
multi-relational (heterogeneous) graphs.

A ground-up JAX/XLA/Pallas re-design with the capabilities of the reference
implementation (francescoferrini/MPGNN-Metapath-Graph-Neural-Network):

* ``graph``    — immutable, device-ready heterogeneous graph structures and
                 loaders for the reference's ``.dat`` TSV formats
                 (reference: main.py:86-372).
* ``ops``      — relation-masked aggregation kernels (segment / ELL / dense /
                 Pallas backends) replacing torch_scatter / torch_sparse
                 (reference: mp_rgcn_layer.py:274-357).
* ``models``   — RelConv / FastRGCNConv / MetapathGNN / MultiMetapathGNN /
                 RelationScorer (reference: model.py, mp_rgcn_layer.py).
* ``train``    — jitted training loops (whole epochs as one device program).
* ``search``   — the greedy metapath search engine; the reference's mpi4py
                 fan-out (main.py:1191-1476) becomes vmapped relation sweeps.
* ``parallel`` — jax.sharding Mesh / shard_map multi-chip scaling.
* ``utils``    — config, checkpointing (orbax), profiling.
"""

__version__ = "0.1.0"

from mpgnn_tpu import graph, models, ops, parallel, search, train, utils  # noqa: F401,E402
