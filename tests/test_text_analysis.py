"""Text-analysis stage unit tests."""

import pandas as pd


def test_token_counts():
    from docling_service_ray.stages.text_analysis import token_count_batch

    df = pd.DataFrame({"text": ["a b  c", "", "   ", "one", "x\ty\nz"]})
    out = token_count_batch(df)["n_tokens"].tolist()
    assert out == [3, 0, 0, 1, 3]


def test_char_classes():
    from docling_service_ray.stages.text_analysis import char_class_batch

    df = pd.DataFrame({"text": ["ab1 e!"]})
    out = char_class_batch(df).iloc[0]
    assert out["n_chars_m"] == 6
    assert out["n_spaces"] == 1
    assert out["n_digits"] == 1
    assert out["n_vowels"] == 2  # a, e


def test_fingerprint_ws_invariant():
    from docling_service_ray.stages.text_analysis import fingerprint_batch

    df = pd.DataFrame({"text": ["Hello   World", "hello world", "hello\nworld"]})
    fps = fingerprint_batch(df)["fp"].tolist()
    assert fps[0] == fps[1] == fps[2]


def test_langid():
    from docling_service_ray.stages.text_analysis import LangId

    li = LangId()
    assert li.classify("the cat and the dog sat in a corner of the room") == "en"
    assert li.classify("le chat et le chien dans la maison pour une heure") == "fr"
    assert li.classify("el gato y el perro es una historia que por la casa") == "es"
    assert li.classify("der hund und die katze das ist ein gutes haus") == "de"
    assert li.classify("") == "unknown"
    assert li.classify("你好 世界 这是 中文 文本 测试") == "zh"


def test_quality_scores():
    import pandas as pd

    from docling_service_ray.stages.text_analysis import quality_score_batch

    prose = "the cat and the dog sat in the warm corner of the old house " * 4
    out = quality_score_batch(
        pd.DataFrame(
            {
                "doc_id": [0, 1, 2],
                "text": [prose, "1234567890" * 20, ""],
            }
        )
    )
    q = out.set_index("doc_id")
    # prose: high spaces + stopwords, len in range -> strong score
    assert q.loc[0, "quality_pm"] > 1200
    assert q.loc[0, "stopword_pm"] > 0
    # digit soup: penalized (no spaces, no stopwords, digit-heavy)
    assert q.loc[1, "digit_pm"] == 1000
    assert q.loc[1, "quality_pm"] == 0
    # empty text: all components zero, no division errors
    assert q.loc[2, "quality_pm"] == 0
    assert (out[["space_pm", "digit_pm", "stopword_pm", "quality_pm"]].dtypes == "int64").all()


def test_pii_scrub():
    import pandas as pd

    from docling_service_ray.stages.text_analysis import scrub_batch

    out = scrub_batch(
        pd.DataFrame(
            {
                "text": [
                    "contact alice.smith+x@example.co.uk or call 555123456",
                    "no pii here at all",
                    "ids 12 345 6789 and bob@x.io",
                ]
            }
        )
    )
    assert out["scrubbed"].tolist() == [
        "contact <EMAIL> or call <NUM>",
        "no pii here at all",
        "ids <NUM> <NUM> <NUM> and <EMAIL>",
    ]
    assert out["n_emails"].tolist() == [1, 0, 1]
    assert out["n_numruns"].tolist() == [1, 0, 3]


# ---------------------------------------------------------------------------
# Arrow-native kernel variants must equal the pandas forms on edge inputs
# (the queries run the Arrow forms; tests + curation keep the pandas ones)
# ---------------------------------------------------------------------------
EDGE_TEXTS = [
    None, "", "   ", "\t\n  x \t", "one two  three", "a" * 5,
    "the and of to in THE the.", "12 3456 a1b2", "e@x.io 77",
    " leading", "trailing ", "tab\tsep\nnewline", ".", "word",
]


def _edge_frame():
    import pandas as pd

    return pd.DataFrame({
        "doc_id": pd.array(range(len(EDGE_TEXTS)), dtype="int64"),
        "text": pd.array(EDGE_TEXTS, dtype="object"),
    })


def _edge_table():
    import pyarrow as pa

    return pa.table({
        "doc_id": pa.array(range(len(EDGE_TEXTS)), pa.int64()),
        "text": pa.array(EDGE_TEXTS, pa.string()),
    })


def test_arrow_kernels_equal_pandas_kernels():
    import pandas as pd

    from docling_service_ray.stages.text_analysis import (
        char_class_arrow,
        char_class_batch,
        fingerprint_arrow,
        fingerprint_batch,
        quality_score_arrow,
        quality_score_batch,
        token_count_arrow,
        token_count_batch,
    )

    df, tbl = _edge_frame(), _edge_table()
    pairs = [
        (token_count_batch, token_count_arrow, ["n_tokens"]),
        (char_class_batch, char_class_arrow,
         ["n_chars_m", "n_spaces", "n_digits", "n_vowels"]),
        (fingerprint_batch, fingerprint_arrow, ["fp"]),
        (quality_score_batch, quality_score_arrow,
         ["space_pm", "digit_pm", "stopword_pm", "quality_pm"]),
    ]
    for pd_fn, ar_fn, cols in pairs:
        a = pd_fn(df.copy())[["doc_id"] + cols].reset_index(drop=True)
        b = ar_fn(tbl).to_pandas()[["doc_id"] + cols]
        pd.testing.assert_frame_equal(a, b, check_dtype=True), (pd_fn, cols)


def test_source_mixture_sample_caps_and_determinism(ray_session, tmp_path):
    """Capped proportional allocation: a source smaller than its
    proportional share is capped at its count (no redistribution); the
    md5 ranking makes the pick deterministic."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from docling_service_ray.pipelines.training import source_mixture_sample

    # src2 has weight 3 (2%3+1) but only 2 docs -> capped at 2.
    # src0 w=1 (30 docs), src1 w=2 (30 docs). N=62, T=31, W=6.
    rows = (
        [("src0", i) for i in range(30)]
        + [("src1", 100 + i) for i in range(30)]
        + [("src2", 200), ("src2", 201)]
    )
    df = pd.DataFrame(rows, columns=["source", "doc_id"])
    df["text"] = "x"
    df["lang"] = "en"
    df["n_chars"] = 1
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(pa.table({
        "doc_id": pa.array(df["doc_id"], pa.int64()),
        "text": pa.array(df["text"], pa.string()),
        "lang": pa.array(df["lang"], pa.string()),
        "source": pa.array(df["source"], pa.string()),
        "n_chars": pa.array(df["n_chars"], pa.int64()),
    }), sf / "documents.parquet")

    out = source_mixture_sample(str(sf)).to_pandas()
    got = out.groupby("source").size().to_dict()
    # quotas: src0 = 1*31//6 = 5, src1 = 2*31//6 = 10, src2 = min(2, 15) = 2
    assert got == {"src0": 5, "src1": 10, "src2": 2}
    assert (out["rank"] <= out["quota"]).all()
    out2 = source_mixture_sample(str(sf)).to_pandas()
    pd.testing.assert_frame_equal(
        out.sort_values(["source", "rank"]).reset_index(drop=True),
        out2.sort_values(["source", "rank"]).reset_index(drop=True))
