"""PDF-style positioned-text layout parse + reading-order reconstruction.

Input format (defined by our synthetic corpus, FIXTURES.md §1 class 5): the
turn text starts with a ``%%LAYOUT%%`` header line, followed by one line per
positioned text fragment::

    %%LAYOUT%%
    {page}|{x}|{y}|{text}

``page`` is a 1-based int; ``x``/``y`` are floats on a 612x792pt page with y
increasing DOWNWARD (top-left origin).

Semantics mirror the reference's geometry transforms:

- reading order = page ascending, then column, then (y, x) — the analog of
  page-sorted serialization (reference ``app/main.py:455-467``);
- header/footer zone filter: fragments entirely inside the top/bottom 5% of
  the page are dropped (``app/main.py:655-688``);
- min-length filter: fragments shorter than MIN_FRAG_CHARS after whitespace
  normalization are dropped (50px-minimum analog, ``app/main.py:574-575``);
- two-column pages: fragments split at x = PAGE_W/2; a page is two-column
  when both halves hold >= 2 fragments, in which case the left column is
  read fully before the right (multi-column merge);
- per-page markers ``<!-- Page N -->`` prepended to each page's lines and
  pages joined by a blank line (``app/main.py:467``).
"""

from __future__ import annotations

import re

PAGE_W = 612.0
PAGE_H = 792.0
ZONE_FRAC = 0.05            # header/footer exclusion zone
MIN_FRAG_CHARS = 5          # analog of the 50px minimum image size
COL_SPLIT = PAGE_W / 2.0

LAYOUT_HEADER = "%%LAYOUT%%"

_WS_RE = re.compile(r"\s+")


def is_layout(text: str) -> bool:
    return text.startswith(LAYOUT_HEADER)


def extract_layout(src: str):
    """Parse a %%LAYOUT%% document.

    Returns (blocks, spans, n_stripped, positions): blocks is one
    markdown-ish string per page (with the page marker); spans carry
    per-page source offsets of the first/last surviving fragment;
    positions is the M4 typed-metadata analog (reference
    ``app/main.py:630-633``) — one record per SURVIVING fragment in
    reading order, with coordinates normalized to the page dims and
    ``round(., 4)`` exactly like the reference's ``x_norm``/``y_norm``.
    """
    assert src.startswith(LAYOUT_HEADER)
    # fragments: page -> list of (y, x, text, start, end)
    pages: dict[int, list] = {}
    n_stripped = 0
    pos = len(LAYOUT_HEADER)
    if pos < len(src) and src[pos] == "\n":
        pos += 1
    body = src[pos:]
    offset = pos
    zone_top = PAGE_H * ZONE_FRAC
    zone_bot = PAGE_H * (1.0 - ZONE_FRAC)
    for line in body.split("\n"):
        start = offset
        offset += len(line) + 1
        if not line or line.isspace():
            continue
        parts = line.split("|", 3)
        if len(parts) != 4:
            n_stripped += 1
            continue
        try:
            page = int(parts[0])
            x = float(parts[1])
            y = float(parts[2])
        except ValueError:
            n_stripped += 1
            continue
        # byte-identical to _WS_RE.sub(" ", .).strip() but C-level (hot)
        txt = " ".join(parts[3].split())
        if len(txt) < MIN_FRAG_CHARS:
            n_stripped += 1
            continue
        # header/footer zone (top/bottom 5% of page height)
        if y <= zone_top or y >= zone_bot:
            n_stripped += 1
            continue
        text_start = start + len(parts[0]) + len(parts[1]) + len(parts[2]) + 3
        pages.setdefault(page, []).append((y, x, txt, text_start, start + len(line)))

    blocks: list[str] = []
    spans: list[tuple] = []
    positions: list[dict] = []
    for page in sorted(pages.keys()):
        frags = pages[page]
        left = [f for f in frags if f[1] < COL_SPLIT]
        right = [f for f in frags if f[1] >= COL_SPLIT]
        if len(left) >= 2 and len(right) >= 2:
            ordered = sorted(left, key=lambda f: (f[0], f[1])) + sorted(
                right, key=lambda f: (f[0], f[1])
            )
        else:
            ordered = sorted(frags, key=lambda f: (f[0], f[1]))
        lines = [f[2] for f in ordered]
        blocks.append(f"<!-- Page {page} -->\n" + "\n".join(lines))
        spans.append((min(f[3] for f in ordered), max(f[4] for f in ordered), "page"))
        for y, x, _txt, _s, _e in ordered:
            positions.append(
                {
                    "page": page,
                    "x_norm": round(x / PAGE_W, 4),
                    "y_norm": round(y / PAGE_H, 4),
                }
            )
    return blocks, spans, n_stripped, positions
