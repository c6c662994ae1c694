"""Multi-chip scaling: jax.sharding Mesh / shard_map partitioned aggregation."""
