"""Operator tests for the dedup family with planted duplicates."""

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def docs_ds(ray_session):
    import ray.data as rd

    base = (
        "the quick brown fox jumps over the lazy dog while the engine "
        "streams arrow batches through the actor pool " * 5
    )
    rows = [
        {"doc_id": 0, "text": base},
        {"doc_id": 1, "text": base},  # exact dup of 0
        {"doc_id": 2, "text": base.replace("lazy", "sleepy")},  # near dup of 0
        {"doc_id": 3, "text": "completely different tiny text"},
        {"doc_id": 4, "text": "another unrelated document about nothing at all "
                              "with many distinct words inside it"},
    ]
    return rd.from_items(rows), {r["doc_id"]: r["text"] for r in rows}


def test_exact_dedup(docs_ds):
    from docling_service_ray.stages.dedup import exact_dedup_keep_min

    ds, _ = docs_ds
    kept = sorted(exact_dedup_keep_min(ds).to_pandas()["doc_id"])
    assert kept == [0, 2, 3, 4]  # doc 1 deduplicated into 0


def test_exact_dedup_actions(docs_ds):
    from docling_service_ray.stages.dedup import exact_dedup_actions

    ds, _ = docs_ds
    acts = exact_dedup_actions(ds).to_pandas().set_index("doc_id")["action"]
    assert acts[0] == "kept" and acts[1] == "deduplicated"
    assert acts[2] == acts[3] == acts[4] == "kept"


def test_minhash_lsh_finds_near_dup(docs_ds):
    from docling_service_ray.stages.dedup import minhash_lsh_pairs

    ds, _ = docs_ds
    pairs = minhash_lsh_pairs(ds, threshold=0.5).to_pandas()
    found = set(zip(pairs["a"], pairs["b"]))
    assert (0, 1) in found  # exact dup
    assert (0, 2) in found  # near dup
    assert not any(3 in p or 4 in p for p in found)


def test_minhash_reports_jaccard_pct(docs_ds):
    from docling_service_ray.stages.dedup import minhash_lsh_pairs

    ds, _ = docs_ds
    pairs = minhash_lsh_pairs(ds, threshold=0.5).to_pandas()
    j = pairs.set_index(["a", "b"])["jaccard_pct"]
    assert j[(0, 1)] == 100  # exact dup verifies at 100%
    assert 50 <= j[(0, 2)] < 100  # near dup verifies below


def test_minhash_hot_bucket_cap(ray_session):
    """Buckets above max_bucket degrade to a star around the smallest id
    (bounded candidate count, hot cluster still deduplicable) instead of
    being silently dropped."""
    import ray.data as rd

    from docling_service_ray.stages.dedup import minhash_lsh_pairs

    rows = [{"doc_id": i, "text": "identical text everywhere"} for i in range(30)]
    ds = rd.from_items(rows)
    capped = minhash_lsh_pairs(ds, threshold=0.5, max_bucket=10).to_pandas()
    # star: every member pairs with doc 0 only -> n-1 verified pairs,
    # so a first-wins drop of `b` still collapses the cluster to one doc
    assert sorted(zip(capped["a"], capped["b"])) == [
        (0, i) for i in range(1, 30)
    ]
    uncapped = minhash_lsh_pairs(ds, threshold=0.5, max_bucket=1000).to_pandas()
    assert len(uncapped) == 30 * 29 // 2


def test_simhash_pairs(docs_ds):
    from docling_service_ray.stages.dedup import SimHasher, simhash_pairs

    ds, _ = docs_ds
    signed = ds.map_batches(SimHasher, batch_format="pandas", concurrency=1)
    pairs = simhash_pairs(signed, max_hamming=3).to_pandas()
    found = set(zip(pairs["a"], pairs["b"]))
    assert (0, 1) in found  # identical text -> hamming 0
    assert not any(3 in p or 4 in p for p in found)


def test_ngram_jaccard_pairs(docs_ds):
    from docling_service_ray.stages.dedup import ngram_jaccard_pairs

    ds, _ = docs_ds
    pairs = ngram_jaccard_pairs(ds, threshold=0.7).to_pandas()
    found = set(zip(pairs["a"], pairs["b"]))
    assert (0, 1) in found and (0, 2) in found


def test_dedup_corpus_end_to_end(docs_ds):
    """Exact dup 1 (of 0) and near dup 2 (of 0) both drop; 0/3/4 survive."""
    from docling_service_ray.stages.dedup import dedup_corpus

    ds, _ = docs_ds
    survivors = sorted(dedup_corpus(ds, threshold=0.5).to_pandas()["doc_id"])
    assert survivors == [0, 3, 4]


@pytest.fixture(scope="module")
def emb_ds(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((20, 16))
    vecs[1] = vecs[0] + 0.001 * rng.standard_normal(16)  # planted near-dup
    rows = [
        {"vec_id": i, "embedding": vecs[i].astype(np.float32).tolist()}
        for i in range(len(vecs))
    ]
    return rd.from_items(rows)


def test_embedding_neardup_exact(emb_ds):
    from docling_service_ray.stages.dedup import embedding_neardup_pairs

    pairs = embedding_neardup_pairs(emb_ds, threshold=0.99).to_pandas()
    assert set(zip(pairs["a"], pairs["b"])) == {(0, 1)}


def test_embedding_neardup_lsh(emb_ds):
    from docling_service_ray.stages.dedup import embedding_neardup_lsh

    pairs = embedding_neardup_lsh(emb_ds, threshold=0.99, dim=16).to_pandas()
    # sign-LSH puts near-identical vectors in the same bucket
    assert (0, 1) in set(zip(pairs["a"], pairs["b"]))


def test_embedding_dup_counts(emb_ds):
    from docling_service_ray.stages.dedup import embedding_dup_counts

    counts = embedding_dup_counts(emb_ds, threshold=0.99).to_pandas()
    m = counts.set_index("vec_id")["n_dups"]
    assert m[0] == 1 and m[1] == 1 and m[5] == 0


@pytest.fixture(scope="module")
def string_id_docs(ray_session):
    """read_text_documents-shaped corpus: doc_id is a path STRING (the
    composition the dedup chain must accept without coercing to int)."""
    import ray.data as rd

    base = (
        "string keyed documents flow through the dedup chain with their "
        "identifiers preserved end to end across every shuffle " * 4
    )
    rows = [
        {"doc_id": "uploads/a.txt", "text": base},
        {"doc_id": "uploads/b.txt", "text": base},  # exact dup of a
        {"doc_id": "uploads/c.txt", "text": base.replace("chain", "graph")},
        {"doc_id": "uploads/d.txt", "text": "tiny unrelated note"},
    ]
    return rd.from_items(rows)


def test_exact_dedup_actions_string_ids(string_id_docs):
    from docling_service_ray.stages.dedup import exact_dedup_actions

    acts = (
        exact_dedup_actions(string_id_docs)
        .to_pandas()
        .set_index("doc_id")["action"]
    )
    assert acts["uploads/a.txt"] == "kept"  # first-wins = lexicographic min
    assert acts["uploads/b.txt"] == "deduplicated"
    assert acts["uploads/c.txt"] == acts["uploads/d.txt"] == "kept"


def test_minhash_pairs_string_ids(string_id_docs):
    from docling_service_ray.stages.dedup import minhash_lsh_pairs

    pairs = minhash_lsh_pairs(string_id_docs, threshold=0.5).to_pandas()
    found = set(zip(pairs["a"], pairs["b"]))
    assert ("uploads/a.txt", "uploads/b.txt") in found
    assert ("uploads/a.txt", "uploads/c.txt") in found
    assert pairs["a"].dtype == object  # ids stay strings


def test_simhash_and_ngram_string_ids(string_id_docs):
    from docling_service_ray.stages.dedup import (
        SimHasher,
        ngram_jaccard_pairs,
        simhash_pairs,
    )

    hashed = string_id_docs.map_batches(SimHasher(), batch_format="pandas")
    sp = simhash_pairs(hashed).to_pandas()
    assert ("uploads/a.txt", "uploads/b.txt") in set(zip(sp["a"], sp["b"]))

    np_ = ngram_jaccard_pairs(string_id_docs, threshold=0.5).to_pandas()
    assert ("uploads/a.txt", "uploads/b.txt") in set(zip(np_["a"], np_["b"]))


def test_dedup_corpus_string_ids(string_id_docs):
    from docling_service_ray.stages.dedup import dedup_corpus

    kept = sorted(dedup_corpus(string_id_docs, threshold=0.5)
                  .to_pandas()["doc_id"])
    # b: exact dup of a; c: near dup of a (drops as the larger id)
    assert kept == ["uploads/a.txt", "uploads/d.txt"]


def test_dedup_rejects_unsupported_id_dtype(ray_session):
    import ray.data as rd

    from docling_service_ray.stages.dedup import exact_dedup_actions

    ds = rd.from_items([{"doc_id": 1.5, "text": "x"}])
    with pytest.raises(TypeError, match="must be integer or string"):
        exact_dedup_actions(ds)


def test_incremental_dedup_three_way_actions(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from docling_service_ray.stages.dedup import incremental_dedup

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        # 2 dups 1 within-run; 3's content is in the prior manifest
        "text": ["aaa", "aaa", "bbb", "ccc", "ddd"],
    }))
    import hashlib

    seen = rd.from_arrow(pa.table({
        "content_hash": [hashlib.md5(b"bbb").hexdigest()],
    }))
    out = incremental_dedup(ds, seen).to_pandas().set_index("doc_id")
    assert out.loc[1, "action"] == "kept"
    assert out.loc[2, "action"] == "deduplicated"
    assert out.loc[3, "action"] == "already_seen"
    assert out.loc[4, "action"] == "kept"
    assert out.loc[5, "action"] == "kept"


def test_incremental_dedup_idempotent_against_own_manifest(ray_session):
    """Re-running the same input against the manifest its first run kept
    marks every within-run survivor already_seen — the resume contract."""
    import pyarrow.compute as pc
    import pyarrow as pa
    import ray.data as rd

    from docling_service_ray.stages.dedup import incremental_dedup

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(list(range(8)), pa.int64()),
        "text": [f"doc {i % 5}" for i in range(8)],  # 3 within-run dups
    }))
    # seed with an empty manifest so the output carries content_hash
    empty_seen = rd.from_arrow(
        pa.table({"content_hash": pa.array([], pa.string())}))
    first = incremental_dedup(ds, empty_seen).materialize()
    manifest = first.map_batches(
        lambda t: t.filter(pc.equal(t["action"], "kept")).select(
            ["content_hash"]),
        batch_format="pyarrow",
    )
    second = incremental_dedup(ds, manifest).to_pandas()
    acts = second["action"].value_counts().to_dict()
    assert acts.get("kept", 0) == 0
    assert acts.get("already_seen") == 5
    assert acts.get("deduplicated") == 3


def test_batched_levenshtein_matches_reference():
    import numpy as np

    from docling_service_ray.stages.dedup import (
        _prefix_bytes_matrix,
        batched_levenshtein,
    )

    def ref(a, b):
        la, lb = len(a), len(b)
        D = list(range(lb + 1))
        for i in range(1, la + 1):
            prev_diag, D[0] = D[0], i
            for j in range(1, lb + 1):
                prev_diag, D[j] = D[j], min(
                    D[j] + 1, D[j - 1] + 1, prev_diag + (a[i - 1] != b[j - 1]))
        return D[lb]

    import random

    random.seed(4)
    words = ["kitten", "sitting", "", "a", "ab", "hello world", "héllo",
             "日本語テスト", "x" * 40]
    pairs = [(random.choice(words), random.choice(words)) for _ in range(200)]
    A, al = _prefix_bytes_matrix([p[0] for p in pairs], 40)
    B, bl = _prefix_bytes_matrix([p[1] for p in pairs], 40)
    w = max(A.shape[1], B.shape[1])
    A = np.pad(A, ((0, 0), (0, w - A.shape[1])))
    B = np.pad(B, ((0, 0), (0, w - B.shape[1])))
    got = batched_levenshtein(A, al, B, bl)
    exp = [ref(p[0][:40].encode(), p[1][:40].encode()) for p in pairs]
    assert got.tolist() == exp


def test_edit_distance_pairs_guard(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from docling_service_ray.stages import dedup as dd

    ds = rd.from_arrow(pa.table({"doc_id": [1, 2], "text": ["aa", "ab"]}))
    old = dd.MAX_EXACT_EDIT_ROWS
    dd.MAX_EXACT_EDIT_ROWS = 1
    try:
        with pytest.raises(ValueError, match="all-pairs oracle path"):
            dd.edit_distance_pairs(ds)
    finally:
        dd.MAX_EXACT_EDIT_ROWS = old
    out = dd.edit_distance_pairs(ds, max_dist=1).to_pandas()
    assert out[["a", "b", "dist"]].values.tolist() == [[1, 2, 1]]


def test_verify_pairs_max_pairs_guard(ray_session):
    """A mis-tuned LSH (adversarial candidate fan-out) must raise loudly
    at the driver collect instead of silently materializing — the
    max_pairs mirror of dense_lookup_array_ref's max_bytes."""
    import ray.data as rd

    from docling_service_ray.stages.dedup import verify_pairs_distributed

    texts = rd.from_items(
        [{"doc_id": i, "text": f"document number {i} body"} for i in range(40)]
    )
    # 30*29/2 = 435 candidate pairs > max_pairs=100
    cand = rd.from_items(
        [{"a": a, "b": b} for a in range(30) for b in range(a + 1, 30)]
    )
    with pytest.raises(ValueError, match="max_pairs"):
        verify_pairs_distributed(
            cand, texts, lambda x, y: 1.0, 0.5, max_pairs=100,
        )


def test_verify_pairs_guard_passes_under_cap(docs_ds):
    """The guard is inert for a sane candidate volume: same pairs found."""
    from docling_service_ray.stages.dedup import minhash_lsh_pairs

    ds, _ = docs_ds
    pairs = minhash_lsh_pairs(ds, threshold=0.5).to_pandas()
    assert (0, 1) in set(zip(pairs["a"], pairs["b"]))


# ---------------------------------------------------------------------------
# keep-best dedup (grouped argmax by quality, deterministic tie-break)
# ---------------------------------------------------------------------------

_PREFIX_PROSE = (
    "the shared prefix of these documents is identical and the rest of "
    "the body flows in plain prose with the usual stopwords in it " * 3
)


@pytest.fixture(scope="module")
def keep_best_ds(ray_session):
    import ray.data as rd

    rows = [
        # group "the shared prefi…": 10 is a digit-heavy low-quality
        # variant, 11/12 are byte-identical high-quality variants (tie)
        {"doc_id": 10, "text": "The  Shared\tPrefix " + "1234567890 " * 30},
        {"doc_id": 11, "text": _PREFIX_PROSE},
        {"doc_id": 12, "text": _PREFIX_PROSE},
        # whitespace/case variant of the same 16-char normalized prefix
        {"doc_id": 13, "text": "the   SHARED prefix but this one diverges "
                               "after the fingerprint window entirely and "
                               "keeps talking about other things in the end"},
        # singleton group
        {"doc_id": 14, "text": "a completely different opening sentence "
                               "that shares no prefix with the others at all"},
    ]
    return rd.from_items(rows), rows


def test_keep_best_winner_and_tiebreak(keep_best_ds):
    """Highest quality_pm wins its fingerprint group; byte-identical
    quality ties break to the smallest id; singletons survive."""
    from docling_service_ray.stages.dedup import keep_best_dedup
    from docling_service_ray.stages.text_analysis import quality_score_batch

    ds, rows = keep_best_ds
    out = keep_best_dedup(ds).to_pandas().sort_values("doc_id")
    kept = list(out["doc_id"])
    # 10/11/12/13 share the normalized prefix "the shared prefi";
    # 11 has the best score (prose beats digit soup) and beats 12 on id
    assert kept == [11, 14]
    # reported score equals the library kernel's score for the winner
    df = pd.DataFrame(rows)
    scores = quality_score_batch(df).set_index("doc_id")["quality_pm"]
    got = out.set_index("doc_id")["quality_pm"]
    assert int(got[11]) == int(scores[11])
    assert int(scores[11]) > int(scores[10])


def test_keep_best_parallelism_invariant(keep_best_ds):
    """Output is independent of block layout (the winner rule is total)."""
    from docling_service_ray.stages.dedup import keep_best_dedup

    ds, _ = keep_best_ds
    a = keep_best_dedup(ds).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = (
        keep_best_dedup(ds.repartition(7))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_keep_best_empty_input(ray_session):
    import ray.data as rd

    from docling_service_ray.stages.dedup import keep_best_dedup

    ds = rd.from_items([{"doc_id": 1, "text": "x"}]).filter(lambda r: False)
    out = keep_best_dedup(ds).to_pandas()
    assert len(out) == 0
