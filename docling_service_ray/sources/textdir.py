"""Raw-file sources: directories of text/binary documents as Datasets.

The reference's two ingestion paths — multipart upload (S1,
``app/main.py:1033-1098``) and URL fetch (S2, ``app/main.py:1099-1105``) —
become Dataset sources: a local directory of files stands in for the
upload store; a (bucket/prefix) URI read via ``read_binary_files`` stands
in for remote fetch (no network in this sandbox, but the API shape is the
same pyarrow-fs path as sinks.make_filesystem).
"""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd

ALLOWED_SUFFIXES = (".txt", ".md", ".html", ".htm")  # ext gate, S1 analog
MAX_DOC_BYTES = 25 * 1024 * 1024  # reference upload cap (app/config.py:14)


def read_text_documents(path_or_paths, *, suffixes=ALLOWED_SUFFIXES,
                        filesystem=None):
    """Directory/list of text files -> Dataset(doc_id: string, text: string,
    n_bytes: int64), with the reference's extension + size validation
    applied as vectorized per-batch predicates (rows, not exceptions)."""
    kwargs = {}
    if filesystem is not None:
        kwargs["filesystem"] = filesystem
    ds = rd.read_binary_files(
        path_or_paths, include_paths=True,
        file_extensions=[s.lstrip(".") for s in suffixes], **kwargs
    )

    def to_docs(batch: pa.Table) -> pa.Table:
        paths = batch["path"].to_pylist()
        blobs = batch["bytes"].to_pylist()
        doc_ids, texts, sizes = [], [], []
        for p, b in zip(paths, blobs):
            if len(b) > MAX_DOC_BYTES:
                continue  # size gate (app/main.py:1080-1087)
            doc_ids.append(p)
            texts.append(b.decode("utf-8", errors="replace"))
            sizes.append(len(b))
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.string()),
                "text": pa.array(texts, pa.string()),
                "n_bytes": pa.array(sizes, pa.int64()),
            }
        )

    return ds.map_batches(to_docs, batch_format="pyarrow")


def read_jsonl_documents(path_or_paths, *, id_field: str = "doc_id",
                         text_field: str = "text"):
    """JSONL corpus source: newline-delimited JSON records -> the same
    Dataset shape as :func:`read_text_documents` (doc_id, text, n_bytes).
    Built on ``ray.data.read_json`` (arrow JSON reader — streaming,
    block-splitting); missing fields become empty text / null id rows so
    malformed records surface as data, not task failures."""
    import pyarrow.compute as pc

    ds = rd.read_json(path_or_paths)

    def project(t: pa.Table) -> pa.Table:
        n = t.num_rows
        ids = (
            pc.cast(t[id_field], pa.string())
            if id_field in t.column_names
            else pa.nulls(n, pa.string())
        )
        texts = (
            pc.cast(t[text_field], pa.string())
            if text_field in t.column_names
            else pa.nulls(n, pa.string())
        )
        texts = pc.fill_null(texts, "")
        return pa.table(
            {
                "doc_id": ids,
                "text": texts,
                "n_bytes": pc.cast(
                    pc.binary_length(pc.cast(texts, pa.binary())), pa.int64()
                ),
            }
        )

    return ds.map_batches(project, batch_format="pyarrow")


def read_csv_documents(path_or_paths, *, id_field: str = "doc_id",
                       text_field: str = "text"):
    """CSV corpus source -> (doc_id, text, n_bytes), same contract as
    :func:`read_jsonl_documents` (arrow CSV reader under the hood)."""
    import pyarrow.compute as pc

    ds = rd.read_csv(path_or_paths)

    def project(t: pa.Table) -> pa.Table:
        n = t.num_rows
        ids = (
            pc.cast(t[id_field], pa.string())
            if id_field in t.column_names
            else pa.nulls(n, pa.string())
        )
        texts = (
            pc.cast(t[text_field], pa.string())
            if text_field in t.column_names
            else pa.nulls(n, pa.string())
        )
        texts = pc.fill_null(texts, "")
        return pa.table(
            {
                "doc_id": ids,
                "text": texts,
                "n_bytes": pc.cast(
                    pc.binary_length(pc.cast(texts, pa.binary())), pa.int64()
                ),
            }
        )

    return ds.map_batches(project, batch_format="pyarrow")


def read_url_documents(urls, *, suffixes=ALLOWED_SUFFIXES):
    """URL source (S2 analog, reference ``app/main.py:1099-1105``): fetch
    documents addressed by URL into the same Dataset shape as
    :func:`read_text_documents`.

    The scheme routes to a ``pyarrow.fs`` filesystem — the same pluggable
    seam as the sink factory (``sinks.make_filesystem``):

    - ``file://`` (or bare paths) -> LocalFileSystem, fully exercised by
      tests;
    - ``s3://bucket/key`` -> S3FileSystem (optionally with an R2-style
      ``endpoint_override``) — constructed but unexercised here (no
      network in this sandbox);
    - ``http(s)://`` -> loud NotImplementedError (would need an HTTP
      filesystem; none is available offline).

    All URLs in one call must share a scheme (one filesystem per read).
    """
    from urllib.parse import urlparse

    from .sinks import make_filesystem

    schemes = set()
    paths = []
    for u in urls:
        p = urlparse(str(u))
        scheme = p.scheme or "file"
        schemes.add(scheme)
        if scheme == "file":
            paths.append(p.path)
        elif scheme == "s3":
            paths.append(p.netloc + p.path)
        else:
            raise NotImplementedError(
                f"URL scheme '{scheme}' needs a network-backed filesystem; "
                "only file:// and s3:// route through pyarrow.fs here"
            )
    if len(schemes) > 1:
        raise ValueError(f"mixed URL schemes in one read: {sorted(schemes)}")
    fs = make_filesystem("s3") if schemes == {"s3"} else None
    return read_text_documents(paths, suffixes=suffixes, filesystem=fs)
