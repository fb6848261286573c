"""Checkpoint / lineage state: per-partition manifests + resumable runner."""

from .manifest import Manifest, PartitionRecord
from .runner import run_checkpointed

__all__ = ["Manifest", "PartitionRecord", "run_checkpointed"]
