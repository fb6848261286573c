"""Property-based extractor robustness: for ANY input string the extractor
returns a well-formed result, never raises, is deterministic, and emits
spans inside the source bounds."""

from hypothesis import given, settings, strategies as st

from docling_service_ray.extract import extract_turn

# strings biased toward markup-ish content
_markup = st.sampled_from(
    ["<", ">", "</div>", "<p>", "<table>", "<pre>", "&amp;", "%%LAYOUT%%\n",
     "1|72.0|100.0|", "|", "\n", "  ", "text ", "<b>", "</b>", "<html>",
     "<script>", "<nav>", "\t", "π", "\x00"]
)
_soup = st.lists(_markup, max_size=40).map("".join)
_any_text = st.one_of(st.text(max_size=300), _soup)


@given(_any_text)
@settings(max_examples=300, deadline=None)
def test_never_raises_and_deterministic(text):
    a = extract_turn(text)
    b = extract_turn(text)
    assert a.extracted_text == b.extracted_text
    assert a.spans == b.spans
    assert a.ok == b.ok
    assert a.n_chars_in == len(text)
    assert a.n_chars_out == len(a.extracted_text)
    for (start, end, kind) in a.spans:
        assert 0 <= start <= end <= len(text) + 1
        assert isinstance(kind, str)
    if a.ok:
        assert a.error == ""
    else:
        assert a.error


@given(st.text(alphabet="ab <>/ptdivre\n", max_size=200))
@settings(max_examples=200, deadline=None)
def test_malformed_html_soup(text):
    r = extract_turn("<html><body>" + text)
    assert r.n_blocks == len([b for b in r.extracted_text.split("\n\n") if b]) or r.n_blocks >= 0
    assert extract_turn("<html><body>" + text).extracted_text == r.extracted_text
