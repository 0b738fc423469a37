"""Shared infrastructure: typed configs, metrics stream, checkpointing, logging."""
