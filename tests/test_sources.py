"""File-source tests: text-directory ingestion with ext/size gates."""

import os
import shutil


def test_read_text_documents(ray_session):
    from docling_service_ray.sources.textdir import read_text_documents

    d = "/tmp/graft_test_textdir"
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d)
    with open(os.path.join(d, "a.txt"), "w") as f:
        f.write("hello world document")
    with open(os.path.join(d, "b.html"), "w") as f:
        f.write("<html><body><p>html doc content</p></body></html>")
    with open(os.path.join(d, "c.exe"), "wb") as f:
        f.write(b"\x00binary")  # extension gate must drop this

    out = read_text_documents(d).to_pandas().sort_values("doc_id")
    names = [os.path.basename(p) for p in out["doc_id"]]
    assert names == ["a.txt", "b.html"]
    assert out["n_bytes"].tolist() == [20, 49]

    # pipe straight into the extractor (ingestion -> extraction composes)
    from docling_service_ray.stages.extract_stage import extract_batch
    import pyarrow as pa

    tbl = pa.table({"text": out["text"].tolist()})
    r = extract_batch(tbl)
    assert r.column("ok").to_pylist() == [True, True]
    shutil.rmtree(d, ignore_errors=True)


def test_read_url_documents_file_scheme(ray_session):
    """S2 analog: file:// URLs route through the pyarrow.fs seam and
    produce the same Dataset shape as the directory source."""
    import pytest

    from docling_service_ray.sources.textdir import read_url_documents

    d = "/tmp/graft_test_urlsrc"
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d)
    for name, body in [("x.txt", "first url doc"), ("y.md", "second url doc")]:
        with open(os.path.join(d, name), "w") as f:
            f.write(body)

    urls = [f"file://{d}/x.txt", f"file://{d}/y.md"]
    out = read_url_documents(urls).to_pandas().sort_values("doc_id")
    assert [os.path.basename(p) for p in out["doc_id"]] == ["x.txt", "y.md"]
    assert out["text"].tolist() == ["first url doc", "second url doc"]

    with pytest.raises(NotImplementedError):
        read_url_documents(["ftp://example.invalid/doc.txt"])
    with pytest.raises(ValueError):
        read_url_documents([f"file://{d}/x.txt", "s3://bucket/y.md"])
    shutil.rmtree(d, ignore_errors=True)


def test_read_jsonl_and_csv_documents(ray_session):
    """JSONL/CSV sources produce the standard (doc_id, text, n_bytes)
    shape and compose with the extractor."""
    import json

    from docling_service_ray.sources.textdir import (
        read_csv_documents,
        read_jsonl_documents,
    )

    d = "/tmp/graft_test_jsonl"
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d)
    rows = [
        {"doc_id": "a", "text": "<p>first json doc body</p>"},
        {"doc_id": "b", "text": "plain second doc"},
    ]
    with open(os.path.join(d, "part.jsonl"), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    out = read_jsonl_documents(os.path.join(d, "part.jsonl")).to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    assert out["doc_id"].tolist() == ["a", "b"]
    assert out["n_bytes"].tolist() == [26, 16]
    # same Dataset-shape contract as read_text_documents: int64 n_bytes
    assert str(out["n_bytes"].dtype) == "int64"

    with open(os.path.join(d, "part.csv"), "w") as f:
        f.write("doc_id,text\nx,csv doc one here\ny,csv doc two there\n")
    got = read_csv_documents(os.path.join(d, "part.csv")).to_pandas()
    got = got.sort_values("doc_id").reset_index(drop=True)
    assert got["doc_id"].tolist() == ["x", "y"]
    assert got["text"].tolist() == ["csv doc one here", "csv doc two there"]
    assert str(got["n_bytes"].dtype) == "int64"
    shutil.rmtree(d, ignore_errors=True)


def test_read_http_documents(ray_session):
    """HTTP source exercised offline against a local http.server (S2 ->
    yes): happy path, extension gate, and fetch-error-as-row semantics."""
    import http.server
    import threading

    from docling_service_ray.sources.textdir import read_url_documents

    d = "/tmp/graft_test_http"
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d)
    with open(os.path.join(d, "doc.txt"), "w") as f:
        f.write("fetched over http")
    with open(os.path.join(d, "page.html"), "w") as f:
        f.write("<p>html body</p>")
    with open(os.path.join(d, "blob.bin"), "w") as f:
        f.write("binary-ish")

    handler = lambda *a, **kw: http.server.SimpleHTTPRequestHandler(
        *a, directory=d, **kw
    )
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{port}"
        out = read_url_documents(
            [
                f"{base}/doc.txt",
                f"{base}/page.html",
                f"{base}/blob.bin",      # extension gate
                f"{base}/missing.txt",   # 404 -> error row
            ]
        ).to_pandas().set_index("doc_id")
        assert bool(out.loc[f"{base}/doc.txt", "ok"])
        assert out.loc[f"{base}/doc.txt", "text"] == "fetched over http"
        assert int(out.loc[f"{base}/doc.txt", "n_bytes"]) == 17
        assert bool(out.loc[f"{base}/page.html", "ok"])
        assert not bool(out.loc[f"{base}/blob.bin", "ok"])
        assert out.loc[f"{base}/blob.bin", "error"] == "extension_rejected"
        assert not bool(out.loc[f"{base}/missing.txt", "ok"])
        assert out.loc[f"{base}/missing.txt", "error"].startswith("fetch_error")
    finally:
        srv.shutdown()
        srv.server_close()
        shutil.rmtree(d, ignore_errors=True)
