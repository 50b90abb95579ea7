"""Utility layer (L1/L5 of the reference layer map, SURVEY.md §1).

Pure-python + jnp helpers: logging, box geometry, IoU family, config
loading, metrics. No torch anywhere in the runtime path.
"""
