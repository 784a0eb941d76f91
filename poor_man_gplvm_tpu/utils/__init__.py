"""Utilities: optional-dependency shims, time series, sorting, checkpointing."""
