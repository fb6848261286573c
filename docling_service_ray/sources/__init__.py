"""Pruned parquet readers for the test tables."""

from .tables import read_table

__all__ = ["read_table"]
