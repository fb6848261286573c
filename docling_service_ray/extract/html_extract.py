"""HTML boilerplate strip + DOM-heuristic main-content extraction.

From-scratch, stdlib-only (html.parser). Semantics are the per-turn analog
of the reference's conversion core:

- boilerplate tag stripping generalizes the header/footer-zone image filter
  (reference ``app/main.py:655-688``) from geometry to DOM semantics;
- the min-block-length filter mirrors the 50px minimum-size filter
  (``app/main.py:574-575``);
- the link-density filter mirrors the tiny-area density filter
  (``app/main.py:690-699``);
- block emission in document order mirrors the page-ordered markdown
  serialization (``app/main.py:431-482``), including its fallback ladder
  (0 blocks from main content -> whole-DOM pass -> empty output).

Determinism rules: no wall clock, no set/dict iteration order dependence,
pure functions of the input string.
"""

from __future__ import annotations

import html.parser as _hp
import re
from html.parser import HTMLParser

# --- tuning constants (pinned; golden tests depend on them) -----------------
MIN_BLOCK_CHARS = 5          # analog of the 50px min image size
MAX_LINK_DENSITY = 0.8       # block-level link-density cutoff (tiny-area analog)

# tags whose entire subtree is boilerplate (semantic generalization of the
# header/footer zone filter)
STRIP_TAGS = frozenset(
    """script style noscript template iframe svg canvas nav header footer
    aside form button input select option textarea label head meta link
    base title object embed applet map area""".split()
)

VOID_TAGS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)

HEADING_TAGS = frozenset(["h1", "h2", "h3", "h4", "h5", "h6"])
LIST_TAGS = frozenset(["ul", "ol"])
BLOCK_TAGS = (
    HEADING_TAGS
    | LIST_TAGS
    | frozenset(
        ["p", "pre", "table", "blockquote", "hr", "div", "section", "main",
         "article", "body", "html", "figure", "figcaption", "dl", "dt", "dd",
         "li", "tr", "td", "th", "thead", "tbody", "tfoot", "caption"]
    )
)

_WS_RE = re.compile(r"\s+")

# Fast-path tag patterns for _FastDomBuilder.run: each accepts a strict
# subset of the stdlib tag grammar on which the stdlib cascade
# (locatestarttagend_tolerant -> tagfind_tolerant -> attrfind_tolerant ->
# junk-tail check) provably consumes the same span and takes the same
# action. Anything they refuse falls through to the goahead-clone slow
# path. Attr names/unquoted values exclude '<' '>' and quotes (narrower
# than the stdlib classes — narrowing only ever routes to the slow path);
# quoted values may contain anything but their quote, exactly like the
# stdlib's quoted-string groups.
_SIMPLE_START = re.compile(
    r"<([a-zA-Z][a-zA-Z0-9]*)"
    r"(?:\s+[^\s/>=<]+(?:\s*=\s*(?:\"[^\"]*\"|'[^']*'|[^\s><'\"]*))?)*"
    r"\s*(/?)>"
)
_SIMPLE_END = re.compile(r"</([a-zA-Z][a-zA-Z0-9]*)\s*>")
_CDATA_ELEMS = frozenset(
    getattr(HTMLParser, "CDATA_CONTENT_ELEMENTS", ("script", "style"))
)

_ENTITY_MAP = {
    "amp": "&", "lt": "<", "gt": ">", "quot": '"', "apos": "'", "nbsp": " ",
}


class StrictParseError(ValueError):
    """Raised by the strict pass on malformed (unbalanced) HTML."""


class _Node:
    __slots__ = ("tag", "attrs", "children", "parent")

    def __init__(self, tag: str, attrs=None, parent=None):
        self.tag = tag
        # raw attr pairs as handed by the parser (None for the fast
        # scanner, which discards them); nothing downstream reads attrs,
        # so skip the former per-node dict materialization (hot alloc)
        self.attrs = attrs
        self.children: list = []
        self.parent = parent


class _Text:
    __slots__ = ("data", "start", "end", "norm")

    def __init__(self, data: str, start: int, end: int):
        self.data = data
        self.start = start
        self.end = end
        self.norm = None  # lazy whitespace-collapsed strip (see _norm)


def _norm(t: _Text) -> str:
    """Whitespace-collapsed, stripped text of a node — computed once
    (measure_tree and block emission both need it).

    ``" ".join(s.split())`` is byte-identical to ``_WS_RE.sub(" ",
    s).strip()`` (both use the Unicode whitespace class; verified over the
    full codepoint range) but runs in C with no regex machinery — this is
    one of the kernel's hottest calls."""
    v = t.norm
    if v is None:
        v = " ".join(t.data.split())
        t.norm = v
    return v


class _DomBuilder(HTMLParser):
    """Build a minimal DOM with source-offset tracking on text nodes."""

    def __init__(self, src: str, strict: bool):
        # convert_charrefs=False keeps handle_data chunks aligned with the
        # raw source so text-node offsets are exact.
        super().__init__(convert_charrefs=False)
        self.src = src
        self.strict = strict
        self.root = _Node("#root")
        self.cur = self.root
        # absolute offset of the start of each source line (getpos() is
        # (lineno, col); lineno is 1-based)
        self._line_starts = [0]
        for m in re.finditer("\n", src):
            self._line_starts.append(m.end())

    def _abs(self) -> int:
        line, col = self.getpos()
        return self._line_starts[line - 1] + col

    # -- tag handling --------------------------------------------------------
    def handle_starttag(self, tag, attrs):
        tag = tag.lower()
        if tag in VOID_TAGS:
            self.cur.children.append(_Node(tag, attrs, self.cur))
            return
        node = _Node(tag, attrs, self.cur)
        self.cur.children.append(node)
        self.cur = node

    def handle_startendtag(self, tag, attrs):
        self.cur.children.append(_Node(tag.lower(), attrs, self.cur))

    def handle_endtag(self, tag):
        tag = tag.lower()
        if tag in VOID_TAGS:
            return
        # walk up to the nearest matching open tag
        node = self.cur
        while node is not self.root and node.tag != tag:
            node = node.parent
        if node is self.root:
            if self.strict:
                raise StrictParseError(f"unmatched closing tag </{tag}>")
            return  # lenient: ignore stray close
        if self.strict and node is not self.cur:
            raise StrictParseError(f"mis-nested closing tag </{tag}>")
        self.cur = node.parent

    # -- text handling -------------------------------------------------------
    def handle_data(self, data):
        start = self._abs()
        self.cur.children.append(_Text(data, start, start + len(data)))

    def handle_entityref(self, name):
        start = self._abs()
        ch = _ENTITY_MAP.get(name, f"&{name};")
        self.cur.children.append(_Text(ch, start, start + len(name) + 2))

    def handle_charref(self, name):
        start = self._abs()
        try:
            cp = int(name[1:], 16) if name.lower().startswith("x") else int(name)
            ch = chr(cp)
        except ValueError:
            ch = f"&#{name};"
        self.cur.children.append(_Text(ch, start, start + len(name) + 3))

    def finish(self) -> _Node:
        self.close()
        if self.strict and self.cur is not self.root:
            raise StrictParseError(f"unclosed tag <{self.cur.tag}>")
        return self.root


class _FastDomBuilder:
    """Single-pass scanner building the same DOM as ``_DomBuilder``, with
    byte-identical node boundaries and offsets — but without html.parser's
    per-chunk position bookkeeping and method dispatch (measured ~56% of
    the extraction kernel).

    It clones the exact decision branches of CPython's
    ``html.parser.HTMLParser.goahead`` (including the feed()+close()
    two-phase bail semantics) for the constructs it accepts; sources
    containing ``<!`` or ``<?`` (comments, doctypes, marked sections,
    processing instructions) are routed by :func:`parse_html` to the
    stdlib-backed builder instead. Equivalence between the two is
    enforced by fixture-corpus and property tests
    (tests/test_extract_fuzz.py: fast-vs-stdlib A/B over adversarial
    soup, random unicode, and the synthetic corpus).
    """

    def __init__(self, src: str, strict: bool):
        self.src = src
        self.strict = strict
        self.root = _Node("#root")
        self.cur = self.root

    # -- tree actions (mirror _DomBuilder) -----------------------------------
    def _start(self, tag: str):
        if tag in VOID_TAGS:
            self.cur.children.append(_Node(tag, None, self.cur))
            return
        node = _Node(tag, None, self.cur)
        self.cur.children.append(node)
        self.cur = node

    def _startend(self, tag: str):
        self.cur.children.append(_Node(tag, None, self.cur))

    def _end(self, tag: str):
        if tag in VOID_TAGS:
            return
        node = self.cur
        while node is not self.root and node.tag != tag:
            node = node.parent
        if node is self.root:
            if self.strict:
                raise StrictParseError(f"unmatched closing tag </{tag}>")
            return
        if self.strict and node is not self.cur:
            raise StrictParseError(f"mis-nested closing tag </{tag}>")
        self.cur = node.parent

    def _text(self, data: str, start: int, end: int):
        self.cur.children.append(_Text(data, start, end))

    def _entityref(self, name: str, start: int):
        ch = _ENTITY_MAP.get(name, f"&{name};")
        self._text(ch, start, start + len(name) + 2)

    def _charref(self, name: str, start: int):
        try:
            cp = int(name[1:], 16) if name.lower().startswith("x") else int(name)
            ch = chr(cp)
        except ValueError:
            ch = f"&#{name};"
        self._text(ch, start, start + len(name) + 3)

    # -- scanner (clones html.parser goahead; feed(src)+close() semantics) --
    def run(self) -> _Node:
        """Stdlib ``feed(src)`` runs ``goahead(end=0)``; a bail (``break``)
        leaves the remainder buffered and ``close()`` RE-SCANS it with
        ``goahead(end=1)``. We emulate the two passes with an ``end`` flag:
        a phase-0 bail flips the flag and continues scanning in place; a
        phase-1 bail emits the untouched remainder verbatim (the stdlib
        post-loop).

        Well-formed start/end tags (the overwhelming majority of real
        input) are claimed by two anchored fast-path regexes whose accepted
        language is a strict subset of the stdlib tag grammar with
        provably identical consumption — each claim skips the stdlib's
        locatestarttagend/tagfind/attrfind regex cascade (~40% of kernel
        time). Anything the fast patterns refuse falls through to the
        goahead-clone slow path unchanged; fast-vs-stdlib A/B fuzz tests
        enforce the equivalence."""
        src = self.src
        n = len(src)
        i = 0
        end = False
        cdata_elem: str | None = None
        interesting_search = _hp.interesting_normal.search
        simple_start = _SIMPLE_START.match
        simple_end = _SIMPLE_END.match
        cdata_elems = _CDATA_ELEMS
        void_tags = VOID_TAGS
        Node = _Node
        Text = _Text
        while i < n:
            m = interesting_search(src, i)
            if m:
                j = m.start()
            else:
                if cdata_elem:
                    # unterminated cdata content is swallowed (stdlib:
                    # goahead breaks; post-loop skips when cdata_elem set)
                    return self._finish()
                j = n
            if i < j:
                cur = self.cur
                cur.children.append(Text(src[i:j], i, j))
            i = j
            if i == n:
                break
            if src[i] == "<":
                fm = simple_start(src, i)
                if fm is not None:
                    tag = fm.group(1).lower()
                    cur = self.cur
                    if fm.group(2) or tag in void_tags:
                        # self-closing or void: append, don't descend
                        # (identical node shape via _startend/_start)
                        cur.children.append(Node(tag, None, cur))
                    else:
                        node = Node(tag, None, cur)
                        cur.children.append(node)
                        self.cur = node
                        if tag in cdata_elems:
                            cdata_elem = tag
                            interesting_search = re.compile(
                                r"</\s*%s\s*>" % tag, re.I
                            ).search
                    i = fm.end()
                    continue
                fm = simple_end(src, i)
                if fm is not None:
                    tag = fm.group(1).lower()
                    k = fm.end()
                    if cdata_elem is not None and tag != cdata_elem:
                        # non-matching close inside cdata content is data
                        # (stdlib parse_endtag cdata branch)
                        cur = self.cur
                        cur.children.append(Text(src[i:k], i, k))
                    else:
                        self._end(tag)
                        cdata_elem = None
                        interesting_search = _hp.interesting_normal.search
                    i = k
                    continue
                if _hp.starttagopen.match(src, i):
                    k, cdata_elem = self._parse_starttag(i, cdata_elem)
                    if cdata_elem:
                        interesting_search = re.compile(
                            r"</\s*%s\s*>" % cdata_elem, re.I
                        ).search
                elif src.startswith("</", i):
                    k, cdata_elem = self._parse_endtag(i, cdata_elem)
                    if cdata_elem is None:
                        interesting_search = _hp.interesting_normal.search
                elif i + 1 < n:
                    self._text("<", i, i + 1)
                    k = i + 1
                elif not end:
                    end = True
                    continue
                else:  # trailing '<': post-loop emits it
                    self._text(src[i:n], i, n)
                    return self._finish()
                if k < 0:
                    if not end:
                        end = True
                        continue  # re-process the construct in end mode
                    # unterminated construct in end mode: emit up to the
                    # next '>' (inclusive) / next '<' / one char, as data
                    k = src.find(">", i + 1)
                    if k < 0:
                        k = src.find("<", i + 1)
                        if k < 0:
                            k = i + 1
                    else:
                        k += 1
                    self._text(src[i:k], i, k)
                i = k
            elif src.startswith("&#", i):
                m = _hp.charref.match(src, i)
                if m:
                    name = m.group()[2:-1]
                    self._charref(name, i)
                    k = m.end()
                    if not src.startswith(";", k - 1):
                        k -= 1
                    i = k
                    continue
                if ";" in src[i:]:  # bail by consuming '&#'
                    self._text(src[i : i + 2], i, i + 2)
                    i += 2
                    if not end:
                        # phase-0 bail: close() re-scans the remainder
                        end = True
                        continue
                elif not end:
                    end = True
                    continue  # re-enter this branch in end mode
                if i < n:  # phase-1 bail: post-loop emits remainder
                    self._text(src[i:n], i, n)
                return self._finish()
            else:  # '&'
                m = _hp.entityref.match(src, i)
                if m:
                    self._entityref(m.group(1), i)
                    k = m.end()
                    if not src.startswith(";", k - 1):
                        k -= 1
                    i = k
                    continue
                m = _hp.incomplete.match(src, i)
                if m:
                    if not end:
                        end = True
                        continue
                    if m.group() == src[i:]:
                        i += 1  # trailing incomplete ref: '&' dropped
                    if i < n:
                        self._text(src[i:n], i, n)
                    return self._finish()
                elif i + 1 < n:
                    self._text("&", i, i + 1)
                    i += 1
                elif not end:
                    end = True
                    continue
                else:  # trailing lone '&': post-loop emits it
                    self._text(src[i:n], i, n)
                    return self._finish()
        return self._finish()

    def _parse_starttag(self, i: int, cdata_elem):
        src = self.src
        endpos = self._whole_start_tag(i)
        if endpos < 0:
            return -1, cdata_elem
        m = _hp.tagfind_tolerant.match(src, i + 1)
        tag = m.group(1).lower()
        k = m.end()
        while k < endpos:  # attribute scan fixes k for the junk-tail check
            am = _hp.attrfind_tolerant.match(src, k)
            if not am:
                break
            k = am.end()
        end = src[k:endpos].strip()
        if end not in (">", "/>"):
            self._text(src[i:endpos], i, endpos)
            return endpos, cdata_elem
        if end.endswith("/>"):
            self._startend(tag)
        else:
            self._start(tag)
            if tag in _hp.HTMLParser.CDATA_CONTENT_ELEMENTS:
                return endpos, tag
        return endpos, cdata_elem

    def _whole_start_tag(self, i: int) -> int:
        src = self.src
        m = _hp.locatestarttagend_tolerant.match(src, i)
        j = m.end()
        nxt = src[j : j + 1]
        if nxt == ">":
            return j + 1
        if nxt == "/":
            if src.startswith("/>", j):
                return j + 2
            return -1 if src.startswith("/", j) else (j if j > i else i + 1)
        if nxt == "":
            return -1
        if nxt in "abcdefghijklmnopqrstuvwxyz=/ABCDEFGHIJKLMNOPQRSTUVWXYZ":
            return -1
        return j if j > i else i + 1

    def _parse_endtag(self, i: int, cdata_elem):
        src = self.src
        m = _hp.endendtag.search(src, i + 1)
        if not m:
            return -1, cdata_elem
        gtpos = m.end()
        m = _hp.endtagfind.match(src, i)
        if not m:
            if cdata_elem is not None:
                self._text(src[i:gtpos], i, gtpos)
                return gtpos, cdata_elem
            nm = _hp.tagfind_tolerant.match(src, i + 2)
            if not nm:
                if src[i : i + 3] == "</>":
                    return i + 3, cdata_elem
                # bogus comment: consume to '>' (handle_comment is a no-op)
                pos = src.find(">", i + 2)
                return (-1 if pos == -1 else pos + 1), cdata_elem
            tagname = nm.group(1).lower()
            gtpos = src.find(">", nm.end())
            self._end(tagname)
            return gtpos + 1, cdata_elem
        elem = m.group(1).lower()
        if cdata_elem is not None and elem != cdata_elem:
            self._text(src[i:gtpos], i, gtpos)
            return gtpos, cdata_elem
        self._end(elem)
        return gtpos, None

    def _finish(self) -> _Node:
        if self.strict and self.cur is not self.root:
            raise StrictParseError(f"unclosed tag <{self.cur.tag}>")
        return self.root


def _fast_parser_available() -> bool:
    """The fast scanner leans on CPython ``html.parser`` private regexes;
    if an interpreter renames or drops any of them, fall back to the
    stdlib path instead of crashing (or silently drifting) inside a
    worker task. Checked ONCE at import."""
    import html.parser as _hp

    required = (
        "interesting_normal", "starttagopen", "charref", "entityref",
        "incomplete", "tagfind_tolerant", "attrfind_tolerant",
        "locatestarttagend_tolerant", "endendtag", "endtagfind",
    )
    return all(
        hasattr(_hp, a) for a in required
    ) and hasattr(_hp.HTMLParser, "CDATA_CONTENT_ELEMENTS")


_FAST_AVAILABLE = _fast_parser_available()


def parse_html(src: str, strict: bool, impl: str = "auto") -> _Node:
    """DOM parse. ``impl``: "auto" uses the fast scanner unless the source
    contains constructs it refuses (``<!``/``<?``) or the interpreter
    lacks the stdlib privates it mirrors; "fast"/"stdlib" force a path
    (tests compare the two for equivalence)."""
    if impl == "fast" and not _FAST_AVAILABLE:
        raise RuntimeError(
            "impl='fast' requested but this interpreter's html.parser "
            "lacks the private scanner attributes the fast path mirrors; "
            "use impl='auto' or 'stdlib'"
        )
    if impl == "stdlib" or (
        impl == "auto"
        and (not _FAST_AVAILABLE or "<!" in src or "<?" in src)
    ):
        b = _DomBuilder(src, strict)
        b.feed(src)
        return b.finish()
    return _FastDomBuilder(src, strict).run()


# --- tree measurement -------------------------------------------------------

def _iter_text(node) -> list:
    """All _Text descendants in document order, skipping STRIP_TAGS subtrees."""
    out = []
    stack = [node]
    while stack:
        n = stack.pop()
        if isinstance(n, _Text):
            out.append(n)
            continue
        if n.tag in STRIP_TAGS:
            continue
        stack.extend(reversed(n.children))
    return out


def _text_len(node) -> int:
    return sum(len(_norm(t)) for t in _iter_text(node))


def _link_text_len(node) -> int:
    total = 0
    stack = [node]
    while stack:
        n = stack.pop()
        if isinstance(n, _Text):
            continue
        if n.tag in STRIP_TAGS:
            continue
        if n.tag == "a":
            total += _text_len(n)
            continue
        stack.extend(reversed(n.children))
    return total


def link_density(node) -> float:
    tl = _text_len(node)
    if tl == 0:
        return 0.0
    return _link_text_len(node) / tl


# --- main-content selection -------------------------------------------------

def _measure_tree_ordered(root: _Node) -> tuple:
    """One iterative pass computing (text_len, link_text_len) per element
    node — memoizes what _text_len/_link_text_len would recompute per
    candidate during scoring (the former O(depth x nodes) hot spot).
    Returns (sizes, order) where ``order`` is the document-order preorder
    of non-stripped element nodes — exactly the candidate scan
    select_main_content needs, saving it a second traversal."""
    sizes: dict[int, tuple] = {}
    order: list[_Node] = []
    stack = [root]
    while stack:
        n = stack.pop()
        if type(n) is _Text:
            continue
        if n.tag in STRIP_TAGS:
            sizes[id(n)] = (0, 0)
            continue
        order.append(n)
        stack.extend(reversed(n.children))
    for n in reversed(order):
        tl = ll = 0
        for c in n.children:
            if type(c) is _Text:
                tl += len(_norm(c))
            else:
                ctl, cll = sizes[id(c)]
                tl += ctl
                ll += cll
        if n.tag == "a":
            ll = tl
        sizes[id(n)] = (tl, ll)
    return sizes, order


def measure_tree(root: _Node) -> dict:
    """Per-element (text_len, link_text_len) map (public form)."""
    return _measure_tree_ordered(root)[0]


def _density_from(sizes: dict, node) -> float:
    tl, ll = sizes.get(id(node), (0, 0))
    return (ll / tl) if tl else 0.0


def select_main_content(root: _Node, sizes: dict | None = None,
                        order: list | None = None) -> _Node:
    """Pick the main-content subtree.

    1. first <article> or <main> in document order, if any;
    2. else the best-scoring container among body/div/section where
       score = own_text_len * (1 - link_density) — ties broken by document
       order (first wins).
    3. else the root.

    ``order`` (the preorder list _measure_tree_ordered already built) skips
    the re-traversal when provided.
    """
    if sizes is None:
        sizes, order = _measure_tree_ordered(root)
    if order is None:
        order = []
        stack = [root]
        while stack:
            n = stack.pop()
            if isinstance(n, _Text) or n.tag in STRIP_TAGS:
                continue
            order.append(n)
            stack.extend(reversed(n.children))

    for n in order:
        if n.tag in ("article", "main"):
            return n

    best, best_score = None, -1.0
    for n in order:
        if n.tag not in ("body", "div", "section"):
            continue
        tl, ll = sizes.get(id(n), (0, 0))
        score = tl * (1.0 - ((ll / tl) if tl else 0.0))
        if score > best_score:
            best, best_score = n, score
    return best if best is not None else root


# --- block emission ---------------------------------------------------------

def _inline_text(node) -> str:
    """Render inline content: bold/italic/code markers, whitespace collapsed."""
    ch = node.children
    if len(ch) == 1 and type(ch[0]) is _Text:
        # single-text fast path (the overwhelmingly common block shape)
        return " ".join(ch[0].data.split())
    parts: list[str] = []

    def walk(n):
        if isinstance(n, _Text):
            parts.append(n.data)
            return
        if n.tag in STRIP_TAGS:
            return
        if n.tag == "br":
            parts.append(" ")
            return
        marker = {"b": "**", "strong": "**", "i": "*", "em": "*", "code": "`"}.get(n.tag)
        if marker:
            inner_start = len(parts)
            for c in n.children:
                walk(c)
            inner = " ".join("".join(parts[inner_start:]).split())
            del parts[inner_start:]
            if inner:
                parts.append(f"{marker}{inner}{marker}")
            return
        for c in n.children:
            walk(c)

    walk(node)
    return " ".join("".join(parts).split())


def _raw_text(node) -> str:
    """Verbatim text content (for <pre>/<code> blocks)."""
    return "".join(t.data for t in _iter_text(node))


def _span_of(node):
    texts = _iter_text(node)
    if not texts:
        return None
    return (texts[0].start, texts[-1].end)


def _render_list(node, ordered: bool, depth: int, lines: list[str]) -> None:
    idx = 0
    for c in node.children:
        if isinstance(c, _Text) or c.tag != "li":
            continue
        idx += 1
        # split the li's own inline content from nested lists
        own_parts, nested = [], []
        for cc in c.children:
            if not isinstance(cc, _Text) and cc.tag in LIST_TAGS:
                nested.append(cc)
            else:
                own_parts.append(cc)
        holder = _Node("#li")
        holder.children = own_parts
        txt = _inline_text(holder)
        prefix = f"{idx}. " if ordered else "- "
        if txt:
            lines.append("  " * depth + prefix + txt)
        for nl in nested:
            _render_list(nl, nl.tag == "ol", depth + 1, lines)


def _render_table(node):
    """Returns (markdown, n_rows, n_cols, caption) — the metadata triple
    is the M10 analog of the reference's per-table ``num_rows``/
    ``num_cols``/caption extraction (``app/main.py:770-853``); n_rows
    counts DATA rows (header excluded), caption comes from a <caption>
    child (M11, ``app/main.py:829-831``)."""
    rows: list[list[str]] = []
    header: list[str] | None = None
    caption = ""
    for c in node.children:
        if not isinstance(c, _Text) and c.tag == "caption":
            caption = _inline_text(c)
            break

    def collect_rows(n):
        for c in n.children:
            if isinstance(c, _Text):
                continue
            if c.tag == "tr":
                yield c
            elif c.tag in ("thead", "tbody", "tfoot"):
                yield from collect_rows(c)

    for tr in collect_rows(node):
        cells = [
            (c.tag, _inline_text(c))
            for c in tr.children
            if not isinstance(c, _Text) and c.tag in ("td", "th")
        ]
        if not cells:
            continue
        values = [v for _, v in cells]
        if header is None and all(t == "th" for t, _ in cells):
            header = values
        else:
            rows.append(values)

    if header is None:
        if not rows:
            return "", 0, 0, caption
        header, rows = rows[0], rows[1:]
    ncols = max([len(header)] + [len(r) for r in rows]) if (header or rows) else 0
    if ncols == 0:
        return "", 0, 0, caption
    header = header + [""] * (ncols - len(header))
    out = ["| " + " | ".join(header) + " |",
           "| " + " | ".join(["---"] * ncols) + " |"]
    for r in rows:
        r = r + [""] * (ncols - len(r))
        out.append("| " + " | ".join(r) + " |")
    return "\n".join(out), len(rows), ncols, caption


class BlockCollector:
    """Walk a subtree in document order and emit markdown blocks.

    Mirrors the reference's page-ordered serialization contract (M12):
    blocks come out exactly in document order; filtered blocks are counted
    in ``n_stripped``.
    """

    def __init__(self, sizes: dict | None = None):
        self.blocks: list[str] = []       # markdown text per block
        self.spans: list[tuple] = []      # (start, end, kind) per block
        self.n_stripped = 0
        self.sizes = sizes                # memoized (text_len, link_len)
        self.tables: list[dict] = []      # M10 metadata per emitted table

    def _emit(self, text: str, node, kind: str):
        if not text:
            self.n_stripped += 1
            return
        span = _span_of(node)
        self.blocks.append(text)
        self.spans.append((span[0] if span else 0, span[1] if span else 0, kind))

    def walk(self, node) -> None:
        if isinstance(node, _Text):
            txt = _norm(node)
            if txt:
                if len(txt) < MIN_BLOCK_CHARS:
                    self.n_stripped += 1
                else:
                    self.blocks.append(txt)
                    self.spans.append((node.start, node.end, "para"))
            return
        tag = node.tag
        if tag in STRIP_TAGS:
            self.n_stripped += 1
            return
        if tag in HEADING_TAGS:
            txt = _inline_text(node)
            if len(txt) < MIN_BLOCK_CHARS - 4:  # headings may be short
                self.n_stripped += 1
                return
            self._emit("#" * int(tag[1]) + " " + txt, node, "heading")
            return
        if tag == "p":
            txt = _inline_text(node)
            density = (
                _density_from(self.sizes, node)
                if self.sizes is not None
                else link_density(node)
            )
            if len(txt) < MIN_BLOCK_CHARS or density > MAX_LINK_DENSITY:
                self.n_stripped += 1
                return
            self._emit(txt, node, "para")
            return
        if tag in LIST_TAGS:
            lines: list[str] = []
            _render_list(node, tag == "ol", 0, lines)
            self._emit("\n".join(lines), node, "list")
            return
        if tag == "pre":
            raw = _raw_text(node)
            raw = raw.strip("\n")
            if not raw.strip():
                self.n_stripped += 1
                return
            self._emit(f"```\n{raw}\n```", node, "code")
            return
        if tag == "table":
            md, n_rows, n_cols, caption = _render_table(node)
            if md:
                # ids mirror the reference's `table-{counter}` scheme
                # (app/main.py:785), counting emitted tables
                self.tables.append(
                    {
                        "id": f"table-{len(self.tables) + 1}",
                        "n_rows": n_rows,
                        "n_cols": n_cols,
                        "caption": caption,
                    }
                )
            self._emit(md, node, "table")
            return
        if tag == "blockquote":
            inner = BlockCollector()
            for c in node.children:
                inner.walk(c)
            self.n_stripped += inner.n_stripped
            if inner.blocks:
                quoted = "\n".join(
                    "> " + ln for b in inner.blocks for ln in b.split("\n")
                )
                span = _span_of(node)
                self.blocks.append(quoted)
                self.spans.append((span[0] if span else 0, span[1] if span else 0, "quote"))
            return
        if tag == "hr":
            return  # structural only; no text payload
        # container tags: recurse
        for c in node.children:
            self.walk(c)


def extract_html(src: str, strict: bool):
    """Full HTML extraction.

    Returns (blocks, spans, n_stripped, tables). Raises StrictParseError
    in strict mode on malformed input.
    """
    root = parse_html(src, strict)
    sizes, order = _measure_tree_ordered(root)
    main = select_main_content(root, sizes, order)
    col = BlockCollector(sizes)
    col.walk(main)
    if not col.blocks and main is not root:
        # fallback ladder step: main-content selection produced nothing ->
        # whole-DOM pass (analog of the whole-doc serialize fallback,
        # reference app/main.py:443-450)
        col = BlockCollector(sizes)
        col.walk(root)
    return col.blocks, col.spans, col.n_stripped, col.tables
