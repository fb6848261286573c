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
    - ``http(s)://`` -> distributed urllib fetch inside ``map_batches``
      tasks (exercised offline against a local ``http.server`` in
      tests).

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
        elif scheme in ("http", "https"):
            paths.append(str(u))
        else:
            raise NotImplementedError(
                f"URL scheme '{scheme}' is not supported; use file://, "
                "s3:// (pyarrow.fs) or http(s):// (urllib fetch)"
            )
    if len(schemes) > 1:
        raise ValueError(f"mixed URL schemes in one read: {sorted(schemes)}")
    if schemes & {"http", "https"}:
        return read_http_documents(paths, suffixes=suffixes)
    fs = make_filesystem("s3") if schemes == {"s3"} else None
    return read_text_documents(paths, suffixes=suffixes, filesystem=fs)


def read_http_documents(urls, *, suffixes=ALLOWED_SUFFIXES,
                        timeout_s: float = 30.0):
    """HTTP(S) corpus source (S2 analog, reference delegates URL fetch to
    its converter — ``app/main.py:1099-1105``): each ``map_batches`` task
    fetches its slice of URLs with stdlib urllib, so fetching scales with
    the task pool instead of serializing on the driver.

    Same Dataset shape and gates as :func:`read_text_documents`
    (doc_id = URL, text, n_bytes:int64; extension + size validation).
    Fetch failures become ``ok=False`` rows with the error message —
    data, not task failures (M2 semantics) — so the happy-path columns
    stay union-compatible with the other sources via
    ``select_columns(["doc_id", "text", "n_bytes"])`` after filtering.
    """
    import ray.data as rd

    url_list = [str(u) for u in urls]
    ds = rd.from_items([{"url": u} for u in url_list])

    def fetch(batch: pa.Table) -> pa.Table:
        import urllib.error
        import urllib.request
        from urllib.parse import urlparse

        ids, texts, sizes, oks, errs = [], [], [], [], []
        for u in batch["url"].to_pylist():
            path = urlparse(u).path
            if suffixes and not any(path.endswith(s) for s in suffixes):
                ids.append(u); texts.append(""); sizes.append(0)
                oks.append(False); errs.append("extension_rejected")
                continue
            try:
                with urllib.request.urlopen(u, timeout=timeout_s) as r:
                    blob = r.read(MAX_DOC_BYTES + 1)
            except (urllib.error.URLError, OSError, ValueError) as exc:
                ids.append(u); texts.append(""); sizes.append(0)
                oks.append(False); errs.append(f"fetch_error: {exc}")
                continue
            if len(blob) > MAX_DOC_BYTES:
                ids.append(u); texts.append(""); sizes.append(0)
                oks.append(False); errs.append("size_rejected")
                continue
            ids.append(u)
            texts.append(blob.decode("utf-8", errors="replace"))
            sizes.append(len(blob))
            oks.append(True)
            errs.append("")
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.string()),
                "text": pa.array(texts, pa.string()),
                "n_bytes": pa.array(sizes, pa.int64()),
                "ok": pa.array(oks, pa.bool_()),
                "error": pa.array(errs, pa.string()),
            }
        )

    # small batches: one slow origin must not serialize a whole block's
    # worth of other URLs behind it
    return ds.map_batches(fetch, batch_format="pyarrow", batch_size=16)
