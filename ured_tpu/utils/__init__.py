"""Utility layer: metrics, logging, rotations, checkpointing."""
