"""Canonical content-addressed keys + ref rewriting (M9 analog,
reference app/main.py:402-413, 717-729)."""

import hashlib

import pytest


@pytest.fixture(scope="module")
def docs_ds(ray_session):
    import ray.data as rd

    rows = [
        {"doc_id": 0, "text": "shared content body"},
        {"doc_id": 1, "text": "unique content one"},
        {"doc_id": 2, "text": "shared content body"},  # dup of 0
        {"doc_id": 3, "text": "unique content two"},
    ]
    return rd.from_items(rows)


def _key(text):
    return "blocks/" + hashlib.md5(text.encode()).hexdigest() + ".md"


def test_canonical_keys_first_wins(docs_ds):
    from docling_service_ray.stages.refs import canonical_keys

    out = canonical_keys(docs_ds).to_pandas().set_index("doc_id").sort_index()
    assert out.loc[0, "action"] == "kept"
    assert out.loc[2, "action"] == "deduplicated"
    assert out.loc[2, "canonical_id"] == 0
    # identical content -> identical content-addressed key
    assert out.loc[0, "stored_key"] == out.loc[2, "stored_key"]
    assert out.loc[0, "stored_key"] == _key("shared content body")
    assert out.loc[1, "action"] == out.loc[3, "action"] == "kept"


def test_rewrite_refs_to_canonical(docs_ds, ray_session):
    import ray.data as rd

    from docling_service_ray.stages.refs import canonical_keys, rewrite_refs

    keys = canonical_keys(docs_ds)
    with_refs = rd.from_items(
        [
            {"doc_id": 10, "text": "see ref://0 and ref://1 here"},
            {"doc_id": 11, "text": "dup points ref://2"},
            {"doc_id": 12, "text": "unknown ref://999 stays"},
        ]
    )
    out = (
        rewrite_refs(with_refs, keys, out_col="rewritten")
        .to_pandas()
        .set_index("doc_id")["rewritten"]
    )
    assert out[10] == f"see {_key('shared content body')} and {_key('unique content one')} here"
    # a ref to the DUPLICATE id resolves to the same canonical key as id 0
    assert out[11] == f"dup points {_key('shared content body')}"
    assert out[12] == "unknown ref://999 stays"
