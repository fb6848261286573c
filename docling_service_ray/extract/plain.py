"""Plain-text / markdown normalization path (FIXTURES.md §1 class 6).

Whitespace canonicalization only: per-line horizontal whitespace collapse,
trailing-space strip, and paragraph splitting on blank lines — mirroring the
reference's ``strip()`` normalizations (``app/main.py:464``).
"""

from __future__ import annotations

import re

_HWS_RE = re.compile(r"[ \t]+")


def normalize_plain(src: str):
    """Returns (blocks, spans, n_stripped) — one block per paragraph.

    Spans are (start, end, "text") source offsets of each paragraph's first
    through last non-blank line.
    """
    paras: list[str] = []
    spans: list[tuple] = []
    cur_lines: list[str] = []
    cur_start = cur_end = 0
    offset = 0
    for raw in src.split("\n"):
        line_start = offset
        offset += len(raw) + 1
        norm = _HWS_RE.sub(" ", raw).strip()
        if norm:
            if not cur_lines:
                cur_start = line_start
            cur_lines.append(norm)
            cur_end = line_start + len(raw.rstrip())
        elif cur_lines:
            paras.append("\n".join(cur_lines))
            spans.append((cur_start, cur_end, "text"))
            cur_lines = []
    if cur_lines:
        paras.append("\n".join(cur_lines))
        spans.append((cur_start, cur_end, "text"))
    return paras, spans, 0
