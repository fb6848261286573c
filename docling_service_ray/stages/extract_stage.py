"""Actor-pool extraction stage.

The Ray-Data analog of the reference's converter cache (ST1,
``app/main.py:155-197``): one warm extractor per actor, built once in
``__init__``, applied per Arrow batch in ``__call__``. The stage is run as

    ds.map_batches(ExtractTurns, batch_format="pyarrow",
                   zero_copy_batch=True, concurrency=(min, max),
                   batch_size=B, num_cpus=1)

Per-row failures become (ok=False, error=...) VALUES, not raised task
errors (M2 analog, ``app/main.py:227-230``) so the stream keeps flowing and
failures stay inspectable downstream.
"""

from __future__ import annotations

import pyarrow as pa

from ..extract import extract_turn

SPAN_TYPE = pa.list_(
    pa.struct([("start", pa.int32()), ("end", pa.int32()), ("kind", pa.string())])
)
STATS_TYPE = pa.struct(
    [
        ("n_blocks", pa.int32()),
        ("n_stripped", pa.int32()),
        ("n_chars_in", pa.int64()),
        ("n_chars_out", pa.int64()),
    ]
)

# columns the stage appends to the input batch
OUTPUT_FIELDS = [
    ("extracted_text", pa.large_string()),
    ("spans", SPAN_TYPE),
    ("stats", STATS_TYPE),
    ("ok", pa.bool_()),
    ("error", pa.string()),
    ("extractor_path", pa.string()),
]


def extract_batch(batch: pa.Table) -> pa.Table:
    """Pure function form: append extraction columns to an Arrow batch.

    Extraction itself is per-string Python (a parser can't be a SIMD
    kernel), but all column assembly is Arrow and the input batch is
    zero-copy.
    """
    texts = batch.column("text")
    out_text: list[str] = []
    spans: list[list] = []
    stats: list[dict] = []
    oks: list[bool] = []
    errors: list[str] = []
    paths: list[str] = []
    for v in texts:
        r = extract_turn(v.as_py())
        out_text.append(r.extracted_text)
        spans.append(
            [{"start": s, "end": e, "kind": k} for (s, e, k) in r.spans]
        )
        stats.append(
            {
                "n_blocks": r.n_blocks,
                "n_stripped": r.n_stripped,
                "n_chars_in": r.n_chars_in,
                "n_chars_out": r.n_chars_out,
            }
        )
        oks.append(r.ok)
        errors.append(r.error)
        paths.append(r.extractor_path)

    arrays = [
        pa.array(out_text, pa.large_string()),
        pa.array(spans, SPAN_TYPE),
        pa.array(stats, STATS_TYPE),
        pa.array(oks, pa.bool_()),
        pa.array(errors, pa.string()),
        pa.array(paths, pa.string()),
    ]
    for (name, _), arr in zip(OUTPUT_FIELDS, arrays):
        batch = batch.append_column(name, arr)
    return batch


class ExtractTurns:
    """Stateful actor-pool callable. State (compiled regex banks, tag
    tables) lives at module import inside each actor process; ``__init__``
    touches it once so the first batch pays no warmup."""

    def __init__(self):
        # warm the extractor code path once per actor
        extract_turn("<html><body><p>warmup paragraph text</p></body></html>")
        extract_turn("%%LAYOUT%%\n1|72.0|100.0|warmup fragment line")

    def __call__(self, batch: pa.Table) -> pa.Table:
        return extract_batch(batch)


def apply_extract(ds, *, concurrency=None, batch_size: int = 256, num_cpus: float = 1):
    """Attach the extraction stage to a Dataset.

    ``concurrency=None`` sizes a FIXED actor pool to the cluster:
    total_cpus - 2 (two slots left for the read/write task ops so the
    pipeline never serializes behind the pool). Fixed beats autoscaling
    here: extraction dominates every run that matters, and a fixed pool
    spawns all actors immediately instead of paying a ramp-up on each run.
    ``batch_size`` is deliberately small because turn texts average a few
    KiB but include ~1 MB outliers (SURVEY.md §7.4 "very wide rows").
    """
    if concurrency is None:
        try:
            import ray

            total = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        except Exception:  # pragma: no cover
            total = 8
        # ~80% of slots extract; the rest keep the read/write task ops fed
        # (extract:read CPU ratio measured ~4.7:1 on the synthetic corpus)
        concurrency = max(2, int(total * 0.8))
    return ds.map_batches(
        ExtractTurns,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=num_cpus,
    )
