"""Auxiliary subsystems: tracing, logging, checkpointed fleet extraction."""
