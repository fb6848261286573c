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


def arrow_schema_of(ds) -> pa.Schema:
    """pyarrow schema of a Ray Dataset, normalizing non-Arrow entries.

    ``Dataset.schema().types`` can contain Python classes (``object`` for
    string columns of pandas-produced blocks) or numpy dtypes instead of
    ``pa.DataType``; map those to Arrow types so downstream ``pa.schema``
    construction (unions, null-padding, empty tables) is well-typed.
    """
    import numpy as np

    s = ds.schema()
    fields = []
    for name, typ in zip(s.names, s.types):
        if isinstance(typ, pa.DataType):
            fields.append((name, typ))
        elif typ is object or typ is str:
            fields.append((name, pa.large_string()))
        else:
            fields.append((name, pa.from_numpy_dtype(np.dtype(typ))))
    return pa.schema(fields)
