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
# M10 analog (reference app/main.py:770-853): per-table dims + caption
TABLES_TYPE = pa.list_(
    pa.struct(
        [
            ("id", pa.string()),
            ("n_rows", pa.int32()),
            ("n_cols", pa.int32()),
            ("caption", pa.string()),
        ]
    )
)
# M4 analog (reference app/main.py:630-633): normalized round(.,4) positions
POSITIONS_TYPE = pa.list_(
    pa.struct(
        [
            ("page", pa.int32()),
            ("x_norm", pa.float64()),
            ("y_norm", pa.float64()),
        ]
    )
)

# columns the stage appends to the input batch
OUTPUT_FIELDS = [
    ("extracted_text", pa.large_string()),
    ("spans", SPAN_TYPE),
    ("stats", STATS_TYPE),
    ("tables", TABLES_TYPE),
    ("positions", POSITIONS_TYPE),
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
    tables: list[list] = []
    positions: list[list] = []
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
        tables.append(r.tables)
        positions.append(r.positions)
        oks.append(r.ok)
        errors.append(r.error)
        paths.append(r.extractor_path)

    arrays = [
        pa.array(out_text, pa.large_string()),
        pa.array(spans, SPAN_TYPE),
        pa.array(stats, STATS_TYPE),
        pa.array(tables, TABLES_TYPE),
        pa.array(positions, POSITIONS_TYPE),
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


def build_extract_kwargs(*, concurrency=None, batch_size: int = 256,
                         num_cpus: float = 1, num_gpus: float | None = None,
                         resources: dict | None = None,
                         mode: str = "actors") -> dict:
    """map_batches kwargs for the extraction stage (exposed for unit tests
    and for cluster placement without running the stage).

    Device/resource plumbing (ST2 analog, reference app/main.py:161-180):
    ``num_gpus``/``resources`` flow through to the actor pool so a GPU
    extractor schedules onto GPU nodes; the sandbox has no GPU to
    exercise, but the stage is cluster-placeable.

    ``mode="actors"`` (default): stateful fixed actor pool — fastest for
    extraction-dominated pipelines (warm state, no task setup). But a
    fixed pool HOLDS its CPU reservation even when idle, which starves any
    downstream all-to-all (shuffle ran at parallelism ~1.2 behind a full
    pool). ``mode="tasks"`` runs the same kernel as a task pool: slots are
    released as batches finish, so a downstream shuffle streams at full
    width with no materialize barrier — use for pipelines that continue
    into a groupby/sort.
    """
    kwargs: dict = dict(
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        num_cpus=num_cpus,
    )
    if mode == "tasks":
        kwargs["fn"] = extract_batch
        # an explicit cap applies to task pools too (map_batches accepts
        # concurrency for tasks); only the actor-pool DEFAULT sizing below
        # is actor-specific
        if concurrency is not None:
            kwargs["concurrency"] = concurrency
    else:
        kwargs["fn"] = ExtractTurns
        if concurrency is None:
            try:
                import ray

                total = (
                    int(ray.cluster_resources().get("CPU", 8))
                    if ray.is_initialized()
                    else 8
                )
            except Exception:  # pragma: no cover
                total = 8
            # reserve ~2 ABSOLUTE slots for the read/write task ops, not a
            # fraction: measured on the sf0.1 corpus, pools of (width-2)
            # beat 0.8*width at every width (32 cpus: 30 actors 35.7s vs
            # 25 actors 40.3s vs 32 actors 58.9s — a full-width pool
            # starves I/O and collapses; 8 cpus: 6 beats 7). The I/O
            # overlap need is a constant couple of cores, not 20% of the
            # node.
            concurrency = max(2, total - 2)
        kwargs["concurrency"] = concurrency
    if num_gpus is not None:
        kwargs["num_gpus"] = num_gpus
    if resources is not None:
        kwargs["resources"] = resources
    return kwargs


def apply_extract(ds, *, concurrency=None, batch_size: int = 256,
                  num_cpus: float = 1, num_gpus: float | None = None,
                  resources: dict | None = None, mode: str = "actors"):
    """Attach the extraction stage to a Dataset (see build_extract_kwargs
    for the mode/resource semantics).

    ``batch_size`` is deliberately small because turn texts average a few
    KiB but include ~1 MB outliers (SURVEY.md §7.4 "very wide rows").
    """
    kwargs = build_extract_kwargs(
        concurrency=concurrency, batch_size=batch_size, num_cpus=num_cpus,
        num_gpus=num_gpus, resources=resources, mode=mode,
    )
    fn = kwargs.pop("fn")
    return ds.map_batches(fn, **kwargs)
