"""Golden tests for the pure extractor core (no Ray).

Mirrors the reference's golden-input strategy (SURVEY.md §5): each content
class from the reference's test generator has a hand-written expected
output here, pinning byte-for-byte semantics.
"""

from docling_service_ray.extract import detect_format, extract_turn
from docling_service_ray.extract.html_extract import MIN_BLOCK_CHARS


def test_detect_format():
    assert detect_format("%%LAYOUT%%\n1|0|100|hello world") == "layout"
    assert detect_format("<html><body><p>x</p></body></html>") == "html"
    assert detect_format("just plain text") == "plain"
    assert detect_format("a < b and c > d") == "plain"


def test_html_boilerplate_strip():
    src = (
        "<html><head><title>T</title><style>p{}</style></head><body>"
        "<nav><a href='/'>home</a><a href='/x'>x</a></nav>"
        "<header><p>Header junk text</p></header>"
        "<article><h1>Main Title</h1><p>Body paragraph with content.</p></article>"
        "<footer><p>Footer junk</p></footer>"
        "<script>var x;</script></body></html>"
    )
    r = extract_turn(src)
    assert r.ok and r.extractor_path == "html_strict"
    assert r.extracted_text == "# Main Title\n\nBody paragraph with content."
    assert r.n_blocks == 2
    assert "Header junk" not in r.extracted_text


def test_html_table_markdown():
    src = (
        "<html><body><table>"
        "<tr><th>Name</th><th>Qty</th></tr>"
        "<tr><td>widget</td><td>3</td></tr>"
        "<tr><td><b>Total</b></td><td>3</td></tr>"
        "</table></body></html>"
    )
    r = extract_turn(src)
    assert r.extracted_text == (
        "| Name | Qty |\n| --- | --- |\n| widget | 3 |\n| **Total** | 3 |"
    )


def test_html_lists():
    src = (
        "<html><body><ul><li><b>alpha</b>: first item here</li>"
        "<li>second item here</li></ul>"
        "<ol><li>one item text</li><li>two item text</li></ol></body></html>"
    )
    r = extract_turn(src)
    assert r.extracted_text == (
        "- **alpha**: first item here\n- second item here"
        "\n\n1. one item text\n2. two item text"
    )


def test_code_block_verbatim():
    src = "<html><body><pre>def f():\n    return  1</pre></body></html>"
    r = extract_turn(src)
    assert r.extracted_text == "```\ndef f():\n    return  1\n```"


def test_layout_reading_order_and_zones():
    src = (
        "%%LAYOUT%%\n"
        "1|72.0|20.0|Header boilerplate dropped\n"
        "2|72.0|100.0|Page two first line\n"
        "1|72.0|300.0|Lower line on page one\n"
        "1|72.0|100.0|Upper line on page one\n"
        "1|72.0|780.0|Footer dropped\n"
    )
    r = extract_turn(src)
    assert r.extractor_path == "layout"
    assert r.extracted_text == (
        "<!-- Page 1 -->\nUpper line on page one\nLower line on page one"
        "\n\n<!-- Page 2 -->\nPage two first line"
    )
    assert r.n_stripped == 2


def test_layout_two_columns():
    src = (
        "%%LAYOUT%%\n"
        "1|320.0|100.0|Right col first\n"
        "1|72.0|200.0|Left col second\n"
        "1|72.0|100.0|Left col first\n"
        "1|320.0|200.0|Right col second\n"
    )
    r = extract_turn(src)
    assert r.extracted_text == (
        "<!-- Page 1 -->\nLeft col first\nLeft col second\n"
        "Right col first\nRight col second"
    )


def test_empty_and_whitespace():
    for src in ["", "   \n\t  "]:
        r = extract_turn(src)
        assert r.ok and r.extracted_text == "" and r.n_blocks == 0


def test_all_boilerplate_fallback():
    src = (
        "<html><body><nav><a href='/'>h</a></nav>"
        "<script>x()</script><footer><p>ft</p></footer></body></html>"
    )
    r = extract_turn(src)
    assert r.ok and r.extracted_text == ""
    assert r.extractor_path.endswith("+empty")
    assert r.n_stripped > 0


def test_min_block_threshold_boundary():
    # exactly-at-threshold analog of the 50px boundary (SURVEY.md M5)
    at = "x" * MIN_BLOCK_CHARS
    below = "x" * (MIN_BLOCK_CHARS - 1)
    r = extract_turn(f"<html><body><p>{below}</p><p>{at}</p></body></html>")
    assert r.extracted_text == at
    assert r.n_stripped == 1


def test_malformed_html_lenient_path():
    r = extract_turn("<html><body><p>first para text<p>second</b></body>")
    assert r.ok and r.extractor_path == "html_lenient"
    assert "first para text" in r.extracted_text


def test_plain_normalization():
    r = extract_turn("hello   world  \n\n\n\nsecond    para\t here  ")
    assert r.extracted_text == "hello world\n\nsecond para here"
    assert r.extractor_path == "plain"


def test_spans_point_into_source():
    src = "<html><body><p>alpha beta gamma</p></body></html>"
    r = extract_turn(src)
    (start, end, kind) = r.spans[0]
    assert kind == "para"
    assert src[start:end] == "alpha beta gamma"


def test_determinism():
    from docling_service_ray.transcripts import turn_text

    for conv in range(8):
        for turn in range(4):
            t = turn_text(conv, turn)
            a, b = extract_turn(t), extract_turn(t)
            assert a.extracted_text == b.extracted_text
            assert a.spans == b.spans


def test_table_metadata_columns():
    # M10 analog: per-table num_rows/num_cols/caption as typed metadata
    # (reference app/main.py:770-853, ids app/main.py:785)
    src = (
        "<html><body><table><caption>stats table</caption>"
        "<tr><th>name</th><th>count</th><th>pct</th></tr>"
        "<tr><td>alpha</td><td>3</td><td>30</td></tr>"
        "<tr><td>beta</td><td>7</td><td>70</td></tr></table>"
        "<p>some separating paragraph</p>"
        "<table><tr><td>one1</td><td>two2</td></tr></table></body></html>"
    )
    r = extract_turn(src)
    assert r.ok
    assert r.tables == [
        {"id": "table-1", "n_rows": 2, "n_cols": 3, "caption": "stats table"},
        {"id": "table-2", "n_rows": 0, "n_cols": 2, "caption": ""},
    ]
    assert r.positions == []


def test_layout_normalized_positions():
    # M4 analog: 0-1 normalized positions, round(.,4) exactly
    # (reference app/main.py:630-633), surviving fragments only
    src = (
        "%%LAYOUT%%\n"
        "1|72.0|100.0|first fragment line\n"
        "1|100.5|50.25|second fragment here\n"
        "1|50.0|10.0|header zone dropped\n"
        "2|200.0|400.0|next page fragment\n"
    )
    r = extract_turn(src)
    assert r.ok and r.extractor_path == "layout"
    assert r.positions == [
        {"page": 1, "x_norm": round(100.5 / 612.0, 4), "y_norm": round(50.25 / 792.0, 4)},
        {"page": 1, "x_norm": round(72.0 / 612.0, 4), "y_norm": round(100.0 / 792.0, 4)},
        {"page": 2, "x_norm": round(200.0 / 612.0, 4), "y_norm": round(400.0 / 792.0, 4)},
    ]
    assert r.tables == []


def test_extract_batch_output_pruning():
    import pyarrow as pa
    import pytest

    from docling_service_ray.stages.extract_stage import (
        OUTPUT_NAMES,
        extract_batch,
    )

    batch = pa.table(
        {
            "conv_id": ["c1", "c1", "c2"],
            "text": [
                "<html><body><p>hello world text</p></body></html>",
                "%%LAYOUT%%\n1|72.0|100.0|fragment line text",
                "plain paragraph line",
            ],
        }
    )
    full = extract_batch(batch)
    assert list(full.column_names) == ["conv_id", "text", *OUTPUT_NAMES]

    pruned = extract_batch(batch, outputs=["ok", "extracted_text"])
    # schema order follows OUTPUT_FIELDS regardless of request order
    assert list(pruned.column_names) == [
        "conv_id", "text", "extracted_text", "ok"
    ]
    assert pruned.column("extracted_text").equals(
        full.column("extracted_text")
    )
    assert pruned.column("ok").equals(full.column("ok"))

    with pytest.raises(ValueError, match="unknown extract outputs"):
        extract_batch(batch, outputs=["extracted_text", "nope"])
