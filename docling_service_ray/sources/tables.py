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


def stripped_schema(path: str, columns=None):
    """Footer schema minus the writer's b'pandas' metadata blob (a Python
    dict Ray's block-schema dedup can't hash — it logs "Failed to hash
    the schemas" once per consumer task otherwise). One cheap driver-side
    footer read; passed to ``read_parquet`` so every block is born clean."""
    import glob

    import pyarrow as pa
    import pyarrow.parquet as pq

    if os.path.isdir(path):
        parts = sorted(glob.glob(os.path.join(path, "*.parquet")))
        if not parts:
            raise FileNotFoundError(f"no parquet files under {path}")
        path = parts[0]
    schema = pq.read_schema(path).remove_metadata()
    if columns is None:
        return schema
    return pa.schema([schema.field(c) for c in columns])


def read_table(sf_dir: str, name: str, columns=None, **kwargs):
    path = os.path.join(sf_dir, f"{name}.parquet")
    if "schema" not in kwargs:
        kwargs["schema"] = stripped_schema(path, columns)
    return rd.read_parquet(path, columns=columns, **kwargs)
