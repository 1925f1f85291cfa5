"""Utilities: checkpointing, metrics, profiling."""
