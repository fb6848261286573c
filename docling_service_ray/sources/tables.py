"""Parquet table readers with column pruning.

Every query reads ONLY the columns it needs (``columns=[...]`` pushes the
projection into the parquet scan so unused columns never leave storage —
the 100 TB rule from the build brief). The storage-backend abstraction of
the reference (``app/storage/base.py:9-111``) maps to ``pyarrow.fs`` under
``read_parquet``/``write_parquet``; a custom endpoint (the reference's
S3-compatible sink, ``app/storage/cloudflare_r2.py:55-68``) would be an
``pyarrow.fs.S3FileSystem(endpoint_override=...)`` passed straight through
— no hand-rolled client.
"""

from __future__ import annotations

import os

import ray.data as rd


def read_table(sf_dir: str, name: str, columns=None, **kwargs):
    path = os.path.join(sf_dir, f"{name}.parquet")
    return rd.read_parquet(path, columns=columns, **kwargs)
