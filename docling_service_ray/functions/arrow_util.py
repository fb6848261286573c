"""Arrow interop helpers."""

from __future__ import annotations

import pyarrow as pa


def table_from_pandas(df, schema: pa.Schema | None = None) -> pa.Table:
    """``pa.Table.from_pandas`` minus the pandas schema-metadata dict.

    ``from_pandas`` attaches a ``b'pandas'`` metadata blob (a Python dict)
    to the schema; Ray Data's block-schema dedup can't hash dicts and logs
    a "Failed to hash the schemas" warning PER BLOCK — pure noise, and the
    metadata is useless once the table crosses the object store.
    """
    t = pa.Table.from_pandas(df, schema=schema, preserve_index=False)
    return t.replace_schema_metadata(None)
