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


OUTPUT_NAMES = tuple(name for name, _ in OUTPUT_FIELDS)


def extract_batch(batch: pa.Table, outputs=None, project=None) -> pa.Table:
    """Pure function form: append extraction columns to an Arrow batch.

    Extraction itself is per-string Python (a parser can't be a SIMD
    kernel), but all column assembly is Arrow and the input batch is
    zero-copy.

    ``outputs`` prunes the appended columns (projection pushdown INTO the
    UDF): a consumer that only keeps ``extracted_text`` shouldn't pay the
    per-row span-dict / stats-struct assembly or ship those bytes through
    the object store. None = all of :data:`OUTPUT_NAMES`; output schema
    order always follows OUTPUT_FIELDS regardless of request order.

    ``project`` selects the FINAL emitted columns (input + appended), so
    consumed input columns (the raw ``text``) can be dropped inside the
    UDF instead of riding the object store to a downstream Project — at
    sf0.1 the raw text is ~half the extract operator's output bytes.
    """
    if outputs is None:
        want = frozenset(OUTPUT_NAMES)
    else:
        want = frozenset(outputs)
        unknown = want.difference(OUTPUT_NAMES)
        if unknown:
            raise ValueError(f"unknown extract outputs: {sorted(unknown)}")
    texts = batch.column("text")
    want_spans = "spans" in want
    want_stats = "stats" in want
    want_tables = "tables" in want
    want_positions = "positions" in want
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
        if want_spans:
            spans.append(
                [{"start": s, "end": e, "kind": k} for (s, e, k) in r.spans]
            )
        if want_stats:
            stats.append(
                {
                    "n_blocks": r.n_blocks,
                    "n_stripped": r.n_stripped,
                    "n_chars_in": r.n_chars_in,
                    "n_chars_out": r.n_chars_out,
                }
            )
        if want_tables:
            tables.append(r.tables)
        if want_positions:
            positions.append(r.positions)
        oks.append(r.ok)
        errors.append(r.error)
        paths.append(r.extractor_path)

    builders = {
        "extracted_text": lambda: pa.array(out_text, pa.large_string()),
        "spans": lambda: pa.array(spans, SPAN_TYPE),
        "stats": lambda: pa.array(stats, STATS_TYPE),
        "tables": lambda: pa.array(tables, TABLES_TYPE),
        "positions": lambda: pa.array(positions, POSITIONS_TYPE),
        "ok": lambda: pa.array(oks, pa.bool_()),
        "error": lambda: pa.array(errors, pa.string()),
        "extractor_path": lambda: pa.array(paths, pa.string()),
    }
    for name in OUTPUT_NAMES:
        if name in want:
            batch = batch.append_column(name, builders[name]())
    if project is not None:
        batch = batch.select(list(project))
    return batch


class ExtractTurns:
    """Stateful actor-pool callable. State (compiled regex banks, tag
    tables) lives at module import inside each actor process; ``__init__``
    touches it once so the first batch pays no warmup."""

    def __init__(self, outputs=None, project=None):
        self._outputs = tuple(outputs) if outputs is not None else None
        self._project = tuple(project) if project is not None else None
        # warm the extractor code path once per actor
        extract_turn("<html><body><p>warmup paragraph text</p></body></html>")
        extract_turn("%%LAYOUT%%\n1|72.0|100.0|warmup fragment line")

    def __call__(self, batch: pa.Table) -> pa.Table:
        return extract_batch(
            batch, outputs=self._outputs, project=self._project
        )


def build_extract_kwargs(*, concurrency=None, batch_size: int = 256,
                         num_cpus: float = 1, num_gpus: float | None = None,
                         resources: dict | None = None,
                         mode: str = "actors",
                         outputs=None, project=None) -> dict:
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
    fn_extra: dict = {}
    if outputs is not None:
        fn_extra["outputs"] = tuple(outputs)
    if project is not None:
        fn_extra["project"] = tuple(project)
    if mode == "tasks":
        kwargs["fn"] = extract_batch
        if fn_extra:
            kwargs["fn_kwargs"] = fn_extra
        # an explicit cap applies to task pools too (map_batches accepts
        # concurrency for tasks); only the actor-pool DEFAULT sizing below
        # is actor-specific
        if concurrency is not None:
            kwargs["concurrency"] = concurrency
    else:
        kwargs["fn"] = ExtractTurns
        if fn_extra:
            kwargs["fn_constructor_kwargs"] = fn_extra
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
                  resources: dict | None = None, mode: str = "actors",
                  outputs=None, project=None):
    """Attach the extraction stage to a Dataset (see build_extract_kwargs
    for the mode/resource semantics; ``outputs`` prunes appended columns
    and ``project`` selects the final emitted columns, see
    :func:`extract_batch`).

    ``batch_size`` is deliberately small because turn texts average a few
    KiB but include ~1 MB outliers (SURVEY.md §7.4 "very wide rows").
    """
    kwargs = build_extract_kwargs(
        concurrency=concurrency, batch_size=batch_size, num_cpus=num_cpus,
        num_gpus=num_gpus, resources=resources, mode=mode, outputs=outputs,
        project=project,
    )
    fn = kwargs.pop("fn")
    return ds.map_batches(fn, **kwargs)
