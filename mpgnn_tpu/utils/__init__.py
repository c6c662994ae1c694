"""Config, checkpointing, profiling utilities."""
