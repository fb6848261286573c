"""Per-turn extraction router + fallback ladder.

``extract_turn`` is the single-row ORACLE (SURVEY.md §5): pytest applies it
row-wise with no Ray; the pipeline's actor-pool stage calls the same
function per batch. Byte-for-byte equality between the two is the
correctness contract (per-turn text equality under stable turn ordering).

Format routing mirrors the reference's extension gate
(``app/main.py:1072-1074``) but is content-based; the strict->lenient
fallback mirrors its GPU->CPU retry ladder (``app/main.py:204-226``) with
the chosen path recorded in ``extractor_path`` (an ``extractor_path``
column downstream).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from .html_extract import StrictParseError, extract_html
from .layout import extract_layout, is_layout
from .plain import normalize_plain

# a real HTML tag opener (known tag name followed by space, '>', or '/')
_HTML_TAG_RE = re.compile(
    r"</?(?:html|head|body|div|section|article|main|nav|header|footer|aside|"
    r"p|br|hr|span|a|b|i|em|strong|code|pre|ul|ol|li|table|thead|tbody|tr|"
    r"td|th|h[1-6]|blockquote|script|style|img|figure|form|button|input)"
    r"(?=[\s>/])",
    re.IGNORECASE,
)

BLOCK_SEP = "\n\n"


@dataclass
class ExtractResult:
    extracted_text: str = ""
    spans: list = field(default_factory=list)   # [(start, end, kind), ...]
    n_blocks: int = 0
    n_stripped: int = 0
    n_chars_in: int = 0
    n_chars_out: int = 0
    ok: bool = True
    error: str = ""
    extractor_path: str = "empty"
    # typed metadata (M10/M4 analogs, reference app/main.py:770-853 and
    # app/main.py:630-633): per-table dims+caption from the html path,
    # per-fragment normalized round(.,4) positions from the layout path
    tables: list = field(default_factory=list)
    positions: list = field(default_factory=list)


def detect_format(text: str) -> str:
    """'layout' | 'html' | 'plain' — deterministic content sniffing."""
    for name, probe in _FORMAT_PROBES:
        if probe(text):
            return name
    if _HTML_TAG_RE.search(text):
        return "html"
    return "plain"


# --- user-extension surface -------------------------------------------------
# format registry (the Ray-native analog of the reference's per-format
# converter options, app/main.py:191-197): register a content probe + an
# extractor returning (blocks, spans, n_stripped). Probes run before the
# built-in html/plain sniffing, first match wins, in registration order.
_FORMAT_PROBES: list = [("layout", is_layout)]
_EXTRACTORS: dict = {}


def register_format(name: str, probe, extractor) -> None:
    """Register a custom turn format.

    ``probe(text) -> bool`` decides routing; ``extractor(text) ->
    (blocks, spans, n_stripped)`` produces ordered markdown blocks. The
    fallback ladder and error capture of :func:`extract_turn` wrap it
    automatically.
    """
    _FORMAT_PROBES.insert(0, (name, probe))
    _EXTRACTORS[name] = extractor


def extract_turn(text) -> ExtractResult:
    """Extract main content from one turn's text. Never raises."""
    r = ExtractResult()
    if text is None:
        return r
    text = str(text)
    r.n_chars_in = len(text)
    if not text.strip():
        # empty / whitespace-only edge case: empty extraction, ok=True
        # (analog of the 0-page fallback, reference app/main.py:443-450)
        return r
    try:
        fmt = detect_format(text)
        if fmt in _EXTRACTORS:  # user-registered format (3-tuple contract)
            blocks, spans, n_stripped = _EXTRACTORS[fmt](text)
            path = fmt
        elif fmt == "layout":
            blocks, spans, n_stripped, r.positions = extract_layout(text)
            path = "layout"
        elif fmt == "html":
            try:
                blocks, spans, n_stripped, r.tables = extract_html(
                    text, strict=True
                )
                path = "html_strict"
            except StrictParseError:
                blocks, spans, n_stripped, r.tables = extract_html(
                    text, strict=False
                )
                path = "html_lenient"
        else:
            blocks, spans, n_stripped = normalize_plain(text)
            path = "plain"

        if not blocks:
            # final ladder rung: 100%-boilerplate or unparseable-layout input
            # -> empty extraction, still ok (app/main.py:472-480 analog is a
            # whole-doc fallback; for turns whose every block was filtered
            # the correct output is empty, recorded via n_stripped)
            r.extractor_path = path + "+empty"
            r.n_stripped = n_stripped
            return r

        r.extracted_text = BLOCK_SEP.join(blocks)
        r.spans = [(int(s), int(e), k) for (s, e, k) in spans]
        r.n_blocks = len(blocks)
        r.n_stripped = n_stripped
        r.n_chars_out = len(r.extracted_text)
        r.extractor_path = path
        return r
    except Exception as exc:  # noqa: BLE001 — per-row failure is a data value
        # failures become rows, not raised task errors (M2 analog,
        # reference app/main.py:227-230 raises; we keep them inspectable)
        r.ok = False
        r.error = f"{type(exc).__name__}: {exc}"
        r.extracted_text = ""
        r.extractor_path = "error"
        return r
