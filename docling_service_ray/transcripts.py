"""Deterministic synthetic transcript corpus (FIXTURES.md §1).

Schema is exactly the BASELINE.json input_hint shape::

    conv_id:string, turn_idx:int32, role:string, text:string,
    tool:string, ts:timestamp[us]

Content classes mirror the reference's golden-input generator
(``/root/reference/test_pdf_generator.py:35-224``): HTML with boilerplate,
HTML tables with totals rows, bold-lead-in lists, code blocks, PDF-style
positioned text, plain text, and the edge cases of the reference's
transforms (empty, whitespace-only, all-boilerplate, at-threshold blocks,
duplicate text, malformed HTML, one ~1MB turn inside the mega
conversation).

Everything is a pure function of (seed, conv, turn) — order-independent
and reproducible regardless of which worker generates which conversation.
Rows are written in a deterministically shuffled turn order so tests prove
ordering is RESTORED by the pipeline, not inherited from the file.
"""

from __future__ import annotations

import hashlib
import os
import random

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42
FIXTURE_VERSION = 3  # bump to invalidate /tmp caches when generators change
BASE_TS_US = 1_767_225_600_000_000  # 2026-01-01T00:00:00Z in microseconds

SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)

# scale-factor directory name -> number of conversations
SF_CONVS = {"sf0.001": 50, "sf0.01": 500, "sf0.1": 50_000}

_DUP_TEXT = (
    "This exact paragraph is duplicated verbatim across many turns to "
    "exercise the exact-dedup path of the engine."
)

_WORDS = (
    "data engine pipeline extraction layout reading order block table "
    "column stream shuffle partition checkpoint lineage arrow batch actor "
    "turn conversation transcript markdown heading paragraph quality token "
    "document corpus model training sample filter score hash group sort"
).split()


def _rng(conv: int, turn: int, salt: str = "") -> random.Random:
    h = hashlib.blake2b(
        f"{SEED}:{conv}:{turn}:{salt}".encode(), digest_size=8
    ).digest()
    return random.Random(int.from_bytes(h, "big"))


def _sentence(r: random.Random, lo=6, hi=14) -> str:
    n = r.randint(lo, hi)
    ws = [r.choice(_WORDS) for _ in range(n)]
    ws[0] = ws[0].capitalize()
    return " ".join(ws) + "."


def _paragraph(r: random.Random, nlo=3, nhi=7) -> str:
    return " ".join(_sentence(r) for _ in range(r.randint(nlo, nhi)))


def _html_boiler(r: random.Random) -> str:
    lvl = r.randint(1, 3)
    heads = [f"<h{lvl}>{_sentence(r, 3, 6)[:-1]}</h{lvl}>"]
    paras = "".join(f"<p>{_paragraph(r)}</p>" for _ in range(r.randint(4, 9)))
    nav = "".join(f'<a href="/x{i}">link {i}</a>' for i in range(5))
    return (
        "<html><head><title>t</title><style>p{color:red}</style></head><body>"
        f"<nav>{nav}</nav><header><p>Site header boilerplate text</p></header>"
        f"<aside><p>{_sentence(r)}</p></aside>"
        f"<article>{heads[0]}{paras}</article>"
        f"<footer><p>Copyright footer</p></footer>"
        "<script>var x=1;</script></body></html>"
    )


def _html_table(r: random.Random) -> str:
    ncol = r.randint(3, 5)
    nrow = r.randint(4, 10)
    hdr = "".join(f"<th>Col {c}</th>" for c in range(ncol))
    rows = "".join(
        "<tr>" + "".join(f"<td>{r.randint(0, 999)}</td>" for _ in range(ncol)) + "</tr>"
        for _ in range(nrow)
    )
    total = "<tr>" + "".join(f"<td><b>{r.randint(0,9999)}</b></td>" for _ in range(ncol)) + "</tr>"
    return (
        f"<html><body><p>{_paragraph(r,1,2)}</p>"
        f"<table><tr>{hdr}</tr>{rows}{total}</table></body></html>"
    )


def _html_list(r: random.Random) -> str:
    items = "".join(
        f"<li><b>{r.choice(_WORDS)}</b>: {_sentence(r)}</li>" for _ in range(r.randint(5, 10))
    )
    tag = r.choice(["ul", "ol"])
    return f"<html><body><h2>{_sentence(r,3,5)[:-1]}</h2><{tag}>{items}</{tag}></body></html>"


def _code_block(r: random.Random) -> str:
    lines = "\n".join(
        f"    value_{i} = compute({r.randint(0, 99)})" for i in range(r.randint(8, 20))
    )
    return (
        f"<html><body><p>{_sentence(r)}</p>"
        f"<pre>def pipeline():\n{lines}\n    return value_0</pre></body></html>"
    )


def _layout_doc(r: random.Random) -> str:
    lines = ["%%LAYOUT%%"]
    npages = r.randint(2, 4)
    for page in range(1, npages + 1):
        two_col = r.random() < 0.4
        # header/footer fragments that the zone filter must drop
        lines.append(f"{page}|72.0|20.0|Running header page {page}")
        lines.append(f"{page}|72.0|770.0|Footer page {page}")
        if two_col:
            ys = sorted(r.uniform(60, 740) for _ in range(r.randint(3, 7)))
            for y in ys:
                lines.append(f"{page}|72.0|{y:.1f}|{_sentence(r)}")
            ys = sorted(r.uniform(60, 740) for _ in range(r.randint(3, 7)))
            for y in ys:
                lines.append(f"{page}|320.0|{y:.1f}|{_sentence(r)}")
        else:
            ys = sorted(r.uniform(60, 740) for _ in range(r.randint(6, 14)))
            for y in ys:
                lines.append(f"{page}|72.0|{y:.1f}|{_sentence(r)}")
    return "\n".join(lines)


def _plain_doc(r: random.Random) -> str:
    paras = [_paragraph(r, 2, 5) for _ in range(r.randint(3, 7))]
    return ("\n" * r.randint(1, 3)).join(p + "  " for p in paras)


def _edge_case(r: random.Random, conv: int, turn: int) -> str:
    kind = r.randint(0, 6)
    if kind == 0:
        return ""
    if kind == 1:
        return "   \n\t \n  "
    if kind == 2:  # 100% boilerplate -> empty extraction (fallback ladder)
        return (
            "<html><body><nav><a href='/'>home</a></nav>"
            "<script>x()</script><footer><p>ft</p></footer></body></html>"
        )
    if kind == 3:  # exactly-at-threshold blocks (MIN_BLOCK_CHARS=5 boundary)
        return "<html><body><p>abcd</p><p>abcde</p><p>abc</p></body></html>"
    if kind == 4:  # duplicate text across turns (exact-dedup path)
        return _DUP_TEXT
    if kind == 5:  # malformed HTML -> lenient parser path
        return f"<html><body><p>{_sentence(r)}<p>{_sentence(r)}</b></body>"
    # mixed threshold fragments in layout
    return "%%LAYOUT%%\n1|72.0|100.0|abcd\n1|72.0|120.0|abcde fragment long enough"


def turn_text(conv: int, turn: int) -> str:
    """Deterministic text for turn (conv, turn)."""
    if conv == 0 and turn == 5:
        # the ~1MB mega-turn inside the mega-conversation
        r = _rng(conv, turn, "mega")
        para = _paragraph(r, 4, 6)
        return "\n\n".join(para for _ in range(1_000_000 // (len(para) + 2) + 1))
    r = _rng(conv, turn)
    roll = r.random()
    if roll < 0.25:
        return _html_boiler(r)
    if roll < 0.35:
        return _html_table(r)
    if roll < 0.45:
        return _html_list(r)
    if roll < 0.55:
        return _code_block(r)
    if roll < 0.70:
        return _layout_doc(r)
    if roll < 0.90:
        return _plain_doc(r)
    return _edge_case(r, conv, turn)


def n_turns_for(conv: int) -> int:
    """Zipf-skewed turn counts; conv 0 is the mega-conversation."""
    if conv == 0:
        return 400  # >10x the ~12-turn median
    r = _rng(conv, -1, "nturns")
    # geometric-ish: median ~12, tail to ~64
    n = 4 + min(60, int(r.expovariate(1.0 / 12.0)))
    return n


def conv_rows(conv: int) -> dict:
    """All rows of one conversation, in deterministically SHUFFLED order."""
    n = n_turns_for(conv)
    r = _rng(conv, -2, "order")
    order = list(range(n))
    r.shuffle(order)
    conv_id = f"conv-{conv:07d}"
    texts, roles, tools, idxs, tss = [], [], [], [], []
    for t in order:
        rt = _rng(conv, t, "role")
        if t == 0 and rt.random() < 0.3:
            role, tool = "system", ""
        elif rt.random() < 0.15:
            role, tool = "tool", rt.choice(["search", "browser", "python", "calc"])
        else:
            role, tool = ("user", "") if t % 2 == 0 else ("assistant", "")
        idxs.append(t)
        roles.append(role)
        tools.append(tool)
        texts.append(turn_text(conv, t))
        tss.append(BASE_TS_US + conv * 3_600_000_000 + t * 7_000_000)
    return {
        "conv_id": [conv_id] * n,
        "turn_idx": idxs,
        "role": roles,
        "text": texts,
        "tool": tools,
        "ts": tss,
    }


def conv_batch_table(convs) -> pa.Table:
    cols = {k: [] for k in ("conv_id", "turn_idx", "role", "text", "tool", "ts")}
    for c in convs:
        rows = conv_rows(int(c))
        for k in cols:
            cols[k].extend(rows[k])
    arrays = [
        pa.array(cols["conv_id"], pa.string()),
        pa.array(cols["turn_idx"], pa.int32()),
        pa.array(cols["role"], pa.string()),
        pa.array(cols["text"], pa.string()),
        pa.array(cols["tool"], pa.string()),
        pa.array(cols["ts"], pa.timestamp("us")),
    ]
    return pa.Table.from_arrays(arrays, schema=SCHEMA)


def sf_name(sf_dir: str) -> str:
    return os.path.basename(os.path.normpath(sf_dir))


def n_convs_for_sf(sf_dir: str) -> int:
    """Conversations per scale factor; GRAFT_N_CONVS env overrides (used by
    bench --scaling to amortize fixed costs over a larger same-input run)."""
    override = os.environ.get("GRAFT_N_CONVS")
    if override:
        return int(override)
    return SF_CONVS.get(sf_name(sf_dir), 50)


def ensure_transcripts(sf_dir: str, out_root: str = "/tmp/graft_transcripts") -> str:
    """Generate (once, cached) the transcript parquet for a scale factor.

    Uses Ray Data to parallelize generation when Ray is up (bench scale);
    falls back to a driver-side loop for tiny corpora. Returns the parquet
    directory path. Output is sharded so the extraction pipeline reads many
    files (resume/lineage granularity).
    """
    n_convs = n_convs_for_sf(sf_dir)
    # cache keyed by content version AND corpus size so a size override
    # never serves a stale corpus
    out_dir = os.path.join(
        out_root, f"v{FIXTURE_VERSION}", f"{sf_name(sf_dir)}-{n_convs}"
    )
    done = os.path.join(out_dir, "_DONE")
    if os.path.exists(done):
        return out_dir
    # generate into a process-private staging dir, then atomically rename:
    # concurrent generators (e.g. two test sessions) can never observe or
    # corrupt a half-written corpus; the loser of the rename race discards
    stage_dir = f"{out_dir}.stage-{os.getpid()}"
    os.makedirs(stage_dir, exist_ok=True)

    n_shards = max(1, min(128, n_convs // 25))
    shard_of = lambda c: c % n_shards  # noqa: E731

    use_ray = False
    if n_convs > 500:
        try:
            import ray

            use_ray = ray.is_initialized()
        except ImportError:
            use_ray = False

    if use_ray:
        import ray

        @ray.remote
        def write_shard(shard: int) -> str:
            convs = [c for c in range(n_convs) if shard_of(c) == shard]
            tbl = conv_batch_table(convs)
            path = os.path.join(stage_dir, f"shard-{shard:04d}.parquet")
            pq.write_table(tbl, path)
            return path

        ray.get([write_shard.remote(s) for s in range(n_shards)])
    else:
        for shard in range(n_shards):
            convs = [c for c in range(n_convs) if shard_of(c) == shard]
            tbl = conv_batch_table(convs)
            pq.write_table(tbl, os.path.join(stage_dir, f"shard-{shard:04d}.parquet"))

    with open(os.path.join(stage_dir, "_DONE"), "w") as f:
        f.write("ok\n")
    try:
        os.rename(stage_dir, out_dir)
    except OSError:
        import shutil

        if os.path.exists(done):
            # another process won the race with identical deterministic content
            shutil.rmtree(stage_dir, ignore_errors=True)
        else:
            # stale partial dir from an interrupted run — replace it
            shutil.rmtree(out_dir, ignore_errors=True)
            os.rename(stage_dir, out_dir)
    return out_dir

def oracle_frame(sf_dir: str):
    """Driver-side oracle: the full expected per-turn extraction, as a
    pandas DataFrame sorted by (conv_id, turn_idx). Used only in tests at
    tiny scale."""
    import pandas as pd

    from .extract import extract_turn

    n_convs = n_convs_for_sf(sf_dir)
    recs = []
    for conv in range(n_convs):
        conv_id = f"conv-{conv:07d}"
        for t in range(n_turns_for(conv)):
            res = extract_turn(turn_text(conv, t))
            recs.append(
                {
                    "conv_id": conv_id,
                    "turn_idx": t,
                    "extracted_text": res.extracted_text,
                    "n_blocks": res.n_blocks,
                    "ok": res.ok,
                }
            )
    return pd.DataFrame(recs).sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
