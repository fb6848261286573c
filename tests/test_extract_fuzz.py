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


# --- fast-scanner vs stdlib-parser equivalence ------------------------------

def _tree_sig(node):
    """Serialize a DOM tree to a comparable structure."""
    from docling_service_ray.extract.html_extract import _Text

    if isinstance(node, _Text):
        return ("#text", node.data, node.start, node.end)
    return (node.tag, tuple(_tree_sig(c) for c in node.children))


def _parse_both(src, strict):
    from docling_service_ray.extract.html_extract import (
        StrictParseError,
        parse_html,
    )

    out = []
    for impl in ("fast", "stdlib"):
        try:
            out.append(("ok", _tree_sig(parse_html(src, strict, impl=impl))))
        except StrictParseError as exc:
            out.append(("strict_error", str(exc)))
    return out


@given(_any_text)
@settings(max_examples=300, deadline=None)
def test_fast_parser_equals_stdlib_lenient(text):
    a, b = _parse_both(text, strict=False)
    assert a == b


@given(_any_text)
@settings(max_examples=300, deadline=None)
def test_fast_parser_equals_stdlib_strict(text):
    a, b = _parse_both(text, strict=True)
    # both must fail or both must succeed with the identical tree; the
    # strict error MESSAGE may name a different tag only if failure modes
    # differ - require full equality
    assert a == b


def test_fast_parser_equals_stdlib_on_fixture_corpus():
    from docling_service_ray.transcripts import turn_text

    n_html = 0
    for conv in range(120):
        for turn in range(8):
            src = turn_text(conv, turn)
            if "<" not in src:
                continue
            n_html += 1
            for strict in (False, True):
                a, b = _parse_both(src, strict)
                assert a == b, (conv, turn, strict)
    assert n_html > 100  # the sweep actually exercised HTML turns

# corner cases of the fast-path tag regexes (_SIMPLE_START/_SIMPLE_END):
# every construct either claimed by the fast path or deliberately refused
# into the slow path must produce the stdlib tree
_FAST_PATH_CASES = [
    "<p>x</p>", "<p >x</ p >", "<br/>", "<br />", "<BR/>", "<P>x</P>",
    '<a href="u">x</a>', "<a href='u'>x</a>", "<a href=u>x</a>",
    '<a href="a>b">x</a>', "<a href='a>b'>x</a>",   # '>' inside quotes
    '<a href="a<b">x</a>',                            # '<' inside quotes
    "<a href=foo/>x</a>",       # unquoted value ending in '/' then '>'
    "<a x>y</a>", "<a x/>", "<a x />", "<a x=1 y=2>z</a>",
    "<a b==c>x</a>", "<a =b>x</a>", "<a b = >x</a>",  # refused -> slow path
    '<a b="x"c>y</a>',          # no space between attrs (stdlib-only)
    "<a b/ c>x</a>", "<a <>x", "<a b<c>x",
    "<input type=text value=>",
    "<script>var a = '</div>' + 1;</script><p>after</p>",
    "<script>x</SCRIPT><p>y</p>", "<script/><p>y</p>",
    "<style>p { color: red }</style><p>y</p>",
    "<script>unterminated",
    "<pre>  keep   ws  </pre>", "<p>a&amp;b</p>", "<p>a&#65;b</p>",
    "<div a='1' b=\"2\" c>t</div>", "<em>x</em  >", "</p>", "</ p>", "</>",
    "<p", "<p x", "<p x=", '<p x="', "<p x='y", "<p/", "<p /",
    "<div\tx='1'\ny='2'>t</div>",
]


def test_fast_path_tag_grammar_corner_cases():
    for src in _FAST_PATH_CASES:
        for strict in (False, True):
            a, b = _parse_both(src, strict)
            assert a == b, (src, strict, a, b)


_attr_soup = st.lists(
    st.sampled_from(
        ["<a", "<p", "<div", " href", " x", "='u'", '="v"', "=w", "=",
         ">", "/>", " ", "\t", "</a>", "</p>", "text", "'", '"', "/",
         "<script>", "</script>", "&", ";"]
    ),
    max_size=30,
).map("".join)


@given(_attr_soup)
@settings(max_examples=400, deadline=None)
def test_fast_parser_equals_stdlib_attr_soup(text):
    a, b = _parse_both(text, strict=False)
    assert a == b
