"""Output sinks: pluggable filesystem under write_parquet.

The reference's storage-backend hierarchy (ABC + local + S3-compatible R2
client, ``app/storage/base.py:9-111``, ``app/storage/local.py:10-110``,
``app/storage/cloudflare_r2.py:28-246``) collapses to ``pyarrow.fs``
passed through Ray Data — no hand-rolled client. An R2-style endpoint is
just ``S3FileSystem(endpoint_override=...)``.

No network exists in this sandbox; the S3 path is constructed but only the
local filesystem is exercised by tests.
"""

from __future__ import annotations


def make_filesystem(kind: str = "local", **kwargs):
    """Filesystem factory (reference storage factory analog,
    ``app/storage/__init__.py:10-36``).

    kind="local" -> LocalFileSystem; kind="s3" -> S3FileSystem with an
    optional ``endpoint_override`` (Cloudflare-R2-style
    ``https://{account}.r2.cloudflarestorage.com`` endpoints,
    ``app/storage/cloudflare_r2.py:55-68``).
    """
    import pyarrow.fs as pafs

    if kind == "local":
        return pafs.LocalFileSystem()
    if kind == "s3":
        return pafs.S3FileSystem(**kwargs)
    raise ValueError(f"unknown filesystem kind: {kind}")


def write_output(ds, path: str, *, filesystem=None, min_rows_per_file=None):
    """Parquet sink with deterministic directory naming (never wall-clock
    filenames — the reference's ``{MM-DD-YYYY-HHMMSS}.md`` naming at
    ``app/main.py:346-349`` collides and breaks resume)."""
    kwargs = {}
    if filesystem is not None:
        kwargs["filesystem"] = filesystem
    if min_rows_per_file is not None:
        kwargs["min_rows_per_file"] = min_rows_per_file
    return ds.write_parquet(path, **kwargs)
