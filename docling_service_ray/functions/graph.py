"""Distributed connected components over an edge Dataset.

Near-dup pair sets are a GRAPH: pair-local policies ("drop the larger id
of each verified pair", :func:`..stages.dedup.dedup_corpus`) act on edges
one at a time, but "keep exactly one document per duplicate CLUSTER"
needs the transitive closure — connected components. The reference has
no graph operator at all (its dedup is a driver-side hash dict,
``scripts/r2_migrate_xxhash.py:171``); this is an engine-completeness
operator a 100 TB training-data pipeline needs.

Algorithm: iterative min-label propagation (the Pregel/GraphX formulation)
with DELTA frontiers —

- every node starts labelled with its own id;
- each round, nodes whose label changed last round (the *frontier*) push
  their label to their neighbours; every node takes the min of its current
  label and the pushed labels;
- converged when the frontier is empty.

The delta-frontier is sound because labels only decrease and edges are
static: if a neighbour's label did not change in round k, its value was
already folded into the node's label in round k-1.

Scale shape, by frontier size per round:

- **partitioned regime** (big frontiers): the symmetric edge table and
  the label table are hash-split by node ONCE into per-bucket object
  store tables (raw Ray tasks — the shared-partitioned-state shape the
  Dataset API can't express across iterations); each round moves ONLY
  the pushed ``(nbr, min label)`` rows between buckets, O(edges
  incident to the frontier), never the edge or label tables themselves.
- **broadcast tail** (small frontiers): map-only rounds against a
  ``ray.put`` frontier dict, zero shuffles.
- a generic per-round bucketed-join round (O(E) exchange) survives only
  as the fallback for the rare case where a frontier REGROWS past the
  broadcast threshold after the partitioned phase ended.

The frontier — the only thing the driver ever sees a COUNT of — shrinks
geometrically after the first rounds. Round count is bounded by the
largest component's diameter: duplicate clusters are near-cliques
(diameter 2-3 in practice), so the loop is short; ``max_rounds`` guards
pathological chains loudly.

Label order: the component representative is the MINIMUM id — numeric
order for integer ids, lexicographic for string ids (consistent with the
per-bucket pandas ``min``).
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd
import pyarrow as pa

from .hashing import bucket_column
from .joins import bucketed_hash_join

logger = logging.getLogger(__name__)

_BUCKET = "__cc_bucket"
_SIDE = "__cc_side"


def _key_type(typ: pa.DataType) -> pa.DataType:
    """Normalize a node-id Arrow type (same contract as the dedup chain:
    integer or string, anything else fails at the API boundary)."""
    if pa.types.is_integer(typ):
        return pa.int64()
    if pa.types.is_string(typ) or pa.types.is_large_string(typ):
        return pa.large_string()
    raise TypeError(
        f"connected_components node ids must be integer or string, got {typ}"
    )


def _ids(values, id_type: pa.DataType) -> pa.Array:
    if isinstance(values, np.ndarray) and values.dtype == object:
        values = values.tolist()
    return pa.array(values, id_type)


def _broadcast_round(edges_sym, labels, frontier, id_type: pa.DataType):
    """One map-only propagation round for a small frontier.

    The frontier's ``(node, label)`` rows are collected (bounded by the
    caller's ``broadcast_frontier_max``) and ``ray.put`` once; every edge
    block looks them up map-side and emits its per-block min pushed label
    per neighbour; the driver combines those partial mins (rows bounded
    by the frontier's distinct neighbours) and broadcasts them back over
    the label blocks for a map-side min-update. No shuffle, no sort —
    and, unlike the shuffle regime, the round's block count stays exactly
    the label table's block count, so repeated rounds don't fragment
    blocks or grow sort cost."""
    import ray

    fdf = frontier.to_pandas()
    fmap = pd.Series(fdf["label"].to_numpy(), index=fdf["node"].to_numpy())
    fref = ray.put(fmap)

    def push_partial(t: pa.Table) -> pa.Table:
        fm = ray.get(fref)
        node = t["node"].to_numpy(zero_copy_only=False)
        nbr = t["nbr"].to_numpy(zero_copy_only=False)
        lab = pd.Series(node).map(fm)
        hit = lab.notna().to_numpy()
        if not hit.any():
            return pa.table({"node": _ids([], id_type),
                             "label": _ids([], id_type)})
        g = (pd.Series(lab.to_numpy()[hit], index=nbr[hit])
             .groupby(level=0, sort=False).min())
        return pa.table({"node": _ids(g.index.to_numpy(), id_type),
                         "label": _ids(g.to_numpy(), id_type)})

    pushed = edges_sym.map_batches(
        push_partial, batch_format="pyarrow"
    ).to_pandas()
    if len(pushed) == 0:
        empty = frontier.map_batches(
            lambda t: t.slice(0, 0), batch_format="pyarrow"
        ).materialize()
        return labels, empty
    pmap = pushed.groupby("node", sort=False)["label"].min()
    pref = ray.put(pmap)

    def apply_push(t: pa.Table) -> pa.Table:
        pm = ray.get(pref)
        node = pd.Series(t["node"].to_numpy(zero_copy_only=False))
        lab = t["label"].to_numpy(zero_copy_only=False).copy()
        hit = node.isin(pm.index).to_numpy()
        changed = np.zeros(len(node), np.int8)
        if hit.any():
            pushed_vals = pm.loc[node[hit]].to_numpy()
            cur = lab[hit]
            take = pushed_vals < cur
            if take.any():
                new_sub = cur.copy()
                new_sub[take] = pushed_vals[take]
                lab[hit] = new_sub
                changed[np.flatnonzero(hit)[take]] = 1
        return pa.table({"node": _ids(node.to_numpy(), id_type),
                         "label": _ids(lab, id_type),
                         "changed": pa.array(changed)})

    merged = labels.map_batches(apply_push, batch_format="pyarrow").materialize()
    import pyarrow.compute as pc

    new_labels = merged.select_columns(["node", "label"])
    new_frontier = merged.map_batches(
        lambda t: t.filter(pc.equal(t["changed"], 1)).select(
            ["node", "label"]),
        batch_format="pyarrow",
    ).materialize()
    return new_labels, new_frontier


def _empty_pair(id_type: pa.DataType, cols=("node", "label")) -> pa.Table:
    return pa.table({c: pa.array([], id_type) for c in cols})


def _split_refs_by_bucket(ds, n_buckets: int, id_type: pa.DataType,
                          cols: tuple):
    """Hash-partition a (node, ...) dataset ONCE into one consolidated
    Arrow table ref per bucket, held in the object store. This is the
    'shared partitioned state' shape the Dataset API cannot express
    across iterations — raw Ray tasks by design."""
    import pyarrow.compute as pc
    import ray

    bucketed = ds.map_batches(
        lambda t: bucket_column(t, "node", n_buckets, _BUCKET),
        batch_format="pyarrow",
    )

    @ray.remote
    def split(tbl: pa.Table):
        # empty blocks can arrive schema-less (map UDFs skip zero-row
        # batches at high parallelism) — treat them as no rows anywhere
        if tbl.num_rows == 0 or _BUCKET not in tbl.column_names:
            out = [_empty_pair(id_type, cols)] * n_buckets
            return out if n_buckets > 1 else out[0]
        out = []
        for b in range(n_buckets):
            sub = tbl.filter(pc.equal(tbl[_BUCKET], b))
            out.append(sub.drop_columns([_BUCKET]).select(list(cols)))
        return out if n_buckets > 1 else out[0]

    @ray.remote
    def concat(*tbls: pa.Table) -> pa.Table:
        tbls = [t for t in tbls if t.num_rows]
        if not tbls:
            return _empty_pair(id_type, cols)
        return pa.concat_tables(tbls).combine_chunks()

    block_refs = bucketed.to_arrow_refs()
    split_refs = [
        split.options(num_returns=n_buckets if n_buckets > 1 else 1).remote(r)
        for r in block_refs
    ]
    if n_buckets == 1:
        split_refs = [[r] for r in split_refs]
    return [
        concat.remote(*[split_refs[blk][b] for blk in range(len(block_refs))])
        for b in range(n_buckets)
    ]


def _partitioned_cc_rounds(edges_sym, labels, *, n_buckets: int,
                           id_type: pa.DataType, stop_below: int,
                           max_rounds: int, round_offset: int = 0,
                           frontier=None):
    """Big-frontier label-propagation rounds with STATIC partitioned state.

    The symmetric edge table and the label table are each hash-split by
    ``node`` into ``n_buckets`` object-store tables ONCE; every round then
    moves only the pushed ``(nbr, min label)`` rows between buckets —
    O(edges incident to the frontier) — instead of re-shuffling the full
    edge and label tables the way the generic per-round bucketed join
    did. Runs until the frontier drops to ``stop_below`` (the broadcast
    tail's territory) or converges; returns
    ``(labels_ds, frontier_ds, rounds_used)`` as plain Datasets.

    ``frontier`` (optional): resume from an existing frontier Dataset —
    the regrowth re-entry path — instead of treating every node as fresh.
    """
    import ray
    import ray.data as rd

    @ray.remote
    def tbl_count(t: pa.Table) -> int:
        return t.num_rows

    edge_parts = _split_refs_by_bucket(
        edges_sym, n_buckets, id_type, ("node", "nbr"))
    label_parts = _split_refs_by_bucket(
        labels, n_buckets, id_type, ("node", "label"))
    if frontier is None:
        frontier_parts = list(label_parts)  # round 0: every node fresh
    else:
        frontier_parts = _split_refs_by_bucket(
            frontier, n_buckets, id_type, ("node", "label"))
    f_counts = ray.get([tbl_count.remote(r) for r in frontier_parts])

    @ray.remote
    def push(edge_tbl: pa.Table, frontier_tbl: pa.Table):
        """Per-source-bucket push: frontier labels flow across this
        bucket's edges; output pre-split by the TARGET node's bucket."""
        out = [_empty_pair(id_type) for _ in range(n_buckets)]
        if edge_tbl.num_rows and frontier_tbl.num_rows:
            fmap = pd.Series(
                frontier_tbl["label"].to_numpy(zero_copy_only=False),
                index=frontier_tbl["node"].to_numpy(zero_copy_only=False),
            )
            node = edge_tbl["node"].to_numpy(zero_copy_only=False)
            nbr = edge_tbl["nbr"].to_numpy(zero_copy_only=False)
            lab = pd.Series(node).map(fmap)
            hit = lab.notna().to_numpy()
            if hit.any():
                g = (pd.Series(lab.to_numpy()[hit], index=nbr[hit])
                     .groupby(level=0, sort=False).min())
                tgt = pa.table({"node": _ids(g.index.to_numpy(), id_type),
                                "label": _ids(g.to_numpy(), id_type)})
                tgt = bucket_column(tgt, "node", n_buckets, _BUCKET)
                import pyarrow.compute as pc
                for b in range(n_buckets):
                    out[b] = tgt.filter(
                        pc.equal(tgt[_BUCKET], b)).drop_columns([_BUCKET])
        return out if n_buckets > 1 else out[0]

    @ray.remote(num_returns=3)
    def update(label_tbl: pa.Table, *pushed: pa.Table):
        """Per-bucket min-merge: labels take the min of current value and
        every pushed label; changed rows form the new frontier slice."""
        pushed = [p for p in pushed if p.num_rows]
        if not pushed or not label_tbl.num_rows:
            return label_tbl, _empty_pair(id_type), 0
        pdf = pd.concat([p.to_pandas() for p in pushed])
        pmap = pdf.groupby("node", sort=False)["label"].min()
        node = pd.Series(label_tbl["node"].to_numpy(zero_copy_only=False))
        lab = label_tbl["label"].to_numpy(zero_copy_only=False).copy()
        hit = node.isin(pmap.index).to_numpy()
        changed = np.zeros(len(node), bool)
        if hit.any():
            pv = pmap.loc[node[hit]].to_numpy()
            cur = lab[hit]
            take = pv < cur
            if take.any():
                new_sub = cur.copy()
                new_sub[take] = pv[take]
                lab[hit] = new_sub
                changed[np.flatnonzero(hit)[take]] = True
        new_labels = pa.table({"node": _ids(node.to_numpy(), id_type),
                               "label": _ids(lab, id_type)})
        frontier = new_labels.filter(pa.array(changed))
        return new_labels, frontier, frontier.num_rows

    rounds = 0
    while sum(f_counts) > stop_below:
        if rounds + round_offset >= max_rounds:
            break
        pushed_matrix = [
            push.options(
                num_returns=n_buckets if n_buckets > 1 else 1
            ).remote(edge_parts[b], frontier_parts[b])
            for b in range(n_buckets)
        ]
        if n_buckets == 1:
            pushed_matrix = [[r] for r in pushed_matrix]
        results = [
            update.remote(
                label_parts[b],
                *[pushed_matrix[s][b] for s in range(n_buckets)],
            )
            for b in range(n_buckets)
        ]
        label_parts = [r[0] for r in results]
        frontier_parts = [r[1] for r in results]
        f_counts = ray.get([r[2] for r in results])
        rounds += 1
        logger.info(
            "connected_components round %d (partitioned): frontier=%d",
            rounds + round_offset, sum(f_counts))

    labels_ds = rd.from_arrow_refs(label_parts).materialize()
    frontier_ds = rd.from_arrow_refs(frontier_parts).materialize()
    return labels_ds, frontier_ds, rounds


def connected_components(edges, *, src: str = "a", dst: str = "b",
                         nodes=None, node_col: str | None = None,
                         n_buckets: int = 32, max_rounds: int = 64,
                         id_type: pa.DataType | None = None,
                         broadcast_frontier_max: int = 65536,
                         use_partitioned: bool = True,
                         partitioned_min_frontier: int = 2048):
    """Connected components of the undirected graph given by ``edges``.

    Returns a Dataset ``(node, component)`` with one row per distinct
    node, where ``component`` is the minimum node id reachable from it.
    ``nodes`` (optional, with id column ``node_col``) adds isolated
    vertices that appear in no edge — they come back as their own
    singleton component.

    Rounds run in one of three regimes, picked from the (free,
    metadata-only) frontier count:

    - **partitioned regime** (initial frontier >
      ``partitioned_min_frontier``): edges and labels hash-split once
      into per-bucket object-store tables; every round moves only the
      pushed labels (see module docstring). Runs to convergence.
    - **shuffle fallback** (frontier > ``broadcast_frontier_max`` in the
      Dataset loop, e.g. after frontier regrowth): with
      ``use_partitioned`` on (the default) this RE-ENTERS the
      partitioned-state regime from the current frontier — one split
      pass, then O(pushed labels) per round; only
      ``use_partitioned=False`` takes the legacy O(E)-per-round
      2-shuffle join round.
    - **broadcast tail** (frontier <= ``broadcast_frontier_max``): the
      frontier's labels are collected to the driver, ``ray.put`` ONCE,
      and the whole round is map-only — push = a map over the
      (materialized) edge blocks against the broadcast frontier dict,
      partial-min'd per block; update = a map over the label blocks
      against the broadcast combined push. Zero shuffles. Because label
      propagation's frontier shrinks geometrically after the first
      rounds, most rounds of a big run — and EVERY round of a small one
      — take this path. Driver memory is bounded by the frontier's
      labels plus the per-block-min'd pushes (O(distinct neighbours of
      the frontier)); lower the threshold for hub-heavy graphs.

    Pass ``id_type`` when the edge dataset's lineage contains a shuffle
    (e.g. verified near-dup pairs): probing ``.schema()`` on such a
    dataset silently executes the upstream once (see
    ``bucketed_hash_join``'s docstring).
    """
    from .arrow_util import arrow_schema_of

    if id_type is None:
        id_type = _key_type(arrow_schema_of(edges).field(src).type)
    else:
        id_type = _key_type(id_type)

    # ---- symmetric edge table (node -> nbr), reused every round --------
    def symmetrize(t: pa.Table) -> pa.Table:
        a, b = t[src], t[dst]
        return pa.table({
            "node": pa.chunked_array([a.combine_chunks(), b.combine_chunks()]).cast(id_type),
            "nbr": pa.chunked_array([b.combine_chunks(), a.combine_chunks()]).cast(id_type),
        })

    # materialized ONCE: the symmetric table is re-joined every round, and
    # node_rows below reads from it too — deriving node_rows from the raw
    # ``edges`` lineage instead would silently re-execute the entire
    # upstream (e.g. a full minhash LSH + verify chain) a second time
    edges_sym = edges.select_columns([src, dst]).map_batches(
        symmetrize, batch_format="pyarrow"
    ).materialize()

    # ---- initial labels: every distinct node labelled with itself ------
    # edges_sym's "node" column already holds both endpoints of every edge
    def edge_nodes(t: pa.Table) -> pa.Table:
        uniq = t["node"].combine_chunks().unique()  # pre-shuffle dedup
        return pa.table({"node": uniq})

    node_rows = edges_sym.select_columns(["node"]).map_batches(
        edge_nodes, batch_format="pyarrow"
    )
    if nodes is not None:
        if node_col is None:
            raise ValueError("nodes dataset requires node_col")

        def extra_nodes(t: pa.Table) -> pa.Table:
            return pa.table({
                "node": t[node_col].combine_chunks().cast(id_type).unique()
            })

        node_rows = node_rows.union(
            nodes.select_columns([node_col]).map_batches(
                extra_nodes, batch_format="pyarrow"
            )
        )

    def distinct_bucket(grp: pa.Table) -> pa.Table:
        uniq = grp["node"].combine_chunks().unique()
        return pa.table({"node": uniq, "label": uniq})

    labels = node_rows.map_batches(
        lambda t: bucket_column(t, "node", n_buckets, _BUCKET),
        batch_format="pyarrow",
    ).groupby(_BUCKET).map_groups(
        distinct_bucket, batch_format="pyarrow"
    ).materialize()

    frontier = labels  # round 0: every node is newly labelled
    label_schema = pa.schema([("node", id_type), ("label", id_type)])
    edge_schema = pa.schema([("node", id_type), ("nbr", id_type)])

    def min_label_bucket(grp: pa.Table) -> pa.Table:
        df = grp.to_pandas()
        new = df.groupby("node", sort=False)["label"].min()
        old = df.loc[df[_SIDE] == 0].set_index("node")["label"]
        old = old.reindex(new.index)  # every node has a side-0 self row
        changed = (new.to_numpy() != old.to_numpy())
        return pa.table({
            "node": _ids(new.index.to_numpy(), id_type),
            "label": _ids(new.to_numpy(), id_type),
            "changed": pa.array(changed, pa.int8()),
        })

    # big initial frontier: run the partitioned-state regime TO
    # CONVERGENCE — edges and labels are hash-split ONCE and only pushed
    # labels move per round; even at a tiny tail frontier a partitioned
    # round is a handful of object-store tasks, measured cheaper than the
    # broadcast round's two Dataset executions. Below
    # ``partitioned_min_frontier`` the two split passes don't amortize
    # and the Dataset loop (broadcast tail / join fallback) runs instead.
    # (``use_partitioned=False`` pins the legacy join-per-round fallback
    # in tests; production callers leave it on.)
    rounds_done = 0
    if use_partitioned and frontier.count() > max(
            0, min(partitioned_min_frontier, broadcast_frontier_max)):
        labels, frontier, rounds_done = _partitioned_cc_rounds(
            edges_sym, labels, n_buckets=n_buckets, id_type=id_type,
            stop_below=0, max_rounds=max_rounds)

    rnd = rounds_done
    while rnd < max_rounds:
        n_front = frontier.count()  # materialized: metadata read, no work
        if n_front == 0:
            break
        rnd += 1
        if n_front <= broadcast_frontier_max:
            labels, frontier = _broadcast_round(
                edges_sym, labels, frontier, id_type)
            logger.info(
                "connected_components round %d (broadcast): frontier=%d",
                rnd, frontier.count())
            continue
        if use_partitioned:
            # frontier regrew past the broadcast threshold: RE-ENTER the
            # partitioned-state regime from the current frontier instead
            # of paying the generic O(E)-per-round join fallback (the
            # splits cost one pass; every subsequent round moves only
            # pushed labels)
            labels, frontier, used = _partitioned_cc_rounds(
                edges_sym, labels, frontier=frontier, n_buckets=n_buckets,
                id_type=id_type, stop_below=0, max_rounds=max_rounds,
                round_offset=rnd - 1)
            if used == 0:  # max_rounds already consumed
                break
            rnd = rnd - 1 + used
            continue
        # push frontier labels across edges: (node, nbr, label) -> (nbr, label)
        pushed = bucketed_hash_join(
            edges_sym, frontier.select_columns(["node", "label"]),
            "node", n_buckets=n_buckets,
            lschema=edge_schema, rschema=label_schema,
        ).map_batches(
            lambda t: pa.table({"node": t["nbr"], "label": t["label"],
                                _SIDE: pa.array(np.ones(t.num_rows, np.int8))}),
            batch_format="pyarrow",
        )
        current = labels.select_columns(["node", "label"]).map_batches(
            lambda t: t.append_column(
                _SIDE, pa.array(np.zeros(t.num_rows, np.int8))),
            batch_format="pyarrow",
        )
        merged = current.union(pushed).map_batches(
            lambda t: bucket_column(t, "node", n_buckets, _BUCKET),
            batch_format="pyarrow",
        ).groupby(_BUCKET).map_groups(
            min_label_bucket, batch_format="pyarrow"
        ).materialize()
        labels = merged.select_columns(["node", "label"])
        import pyarrow.compute as pc

        frontier = merged.map_batches(
            lambda t: t.filter(pc.equal(t["changed"], 1)).select(
                ["node", "label"]),
            batch_format="pyarrow",
        ).materialize()
        logger.info("connected_components round %d: frontier=%d",
                    rnd, frontier.count())
    if frontier.count() > 0:
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} "
            "rounds (component diameter exceeds max_rounds; raise it)"
        )

    return labels.map_batches(
        lambda t: pa.table({"node": t["node"], "component": t["label"]}),
        batch_format="pyarrow",
    )


def cluster_representatives(components, *, keep: str = "min"):
    """From a ``(node, component)`` assignment, the kept ids — one
    representative per cluster. ``keep='min'`` keeps the component label
    itself (the minimum member), a pure filter with no extra shuffle."""
    if keep != "min":
        raise ValueError("only keep='min' is implemented")
    import pyarrow.compute as pc

    return components.map_batches(
        lambda t: pa.table(
            {"node": t.filter(pc.equal(t["node"], t["component"]))["node"]}
        ),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# PageRank (integer fixed-point, partitioned-state rounds)
# ---------------------------------------------------------------------------

_PR_BUCKET = "__pr_bucket"


def _split_refs_by_bucket_tbl(ds, n_buckets: int, empty: pa.Table,
                              key: str = "node"):
    """Generalization of :func:`_split_refs_by_bucket` for tables whose
    columns are not all the id type: hash-partition by ``key`` ONCE into
    one consolidated Arrow table ref per bucket."""
    import pyarrow.compute as pc
    import ray

    cols = empty.column_names
    bucketed = ds.map_batches(
        lambda t: bucket_column(t, key, n_buckets, _PR_BUCKET),
        batch_format="pyarrow",
    )

    @ray.remote
    def split(tbl: pa.Table):
        if tbl.num_rows == 0 or _PR_BUCKET not in tbl.column_names:
            out = [empty] * n_buckets
            return out if n_buckets > 1 else out[0]
        out = []
        for b in range(n_buckets):
            sub = tbl.filter(pc.equal(tbl[_PR_BUCKET], b))
            out.append(sub.drop_columns([_PR_BUCKET]).select(cols))
        return out if n_buckets > 1 else out[0]

    @ray.remote
    def concat(*tbls: pa.Table) -> pa.Table:
        tbls = [t.cast(empty.schema) for t in tbls if t.num_rows]
        if not tbls:
            return empty
        return pa.concat_tables(tbls).combine_chunks()

    block_refs = bucketed.to_arrow_refs()
    split_refs = [
        split.options(num_returns=n_buckets if n_buckets > 1 else 1).remote(r)
        for r in block_refs
    ]
    if n_buckets == 1:
        split_refs = [[r] for r in split_refs]
    return [
        concat.remote(*[split_refs[blk][b] for blk in range(len(block_refs))])
        for b in range(n_buckets)
    ]


def pagerank_int(edges, nodes, *, src: str = "a", dst: str = "b",
                 node_col: str = "node", iters: int = 10,
                 damping_num: int = 85, damping_den: int = 100,
                 scale: int = 1_000_000, n_buckets: int = 16):
    """Distributed PageRank with INTEGER fixed-point arithmetic — every
    quantity is an int64 count of rank units (``scale`` units per node
    initially), so the result is bitwise deterministic regardless of
    block layout, summation order, or parallelism (float PageRank is
    not: float addition does not associate).

    Update rule, per round (exactly ``iters`` rounds — fixed iteration
    count, no convergence test, so an external oracle can reproduce the
    result exactly):

        send(v->u)  = (damping_num * r[v]) // (damping_den * outdeg(v))
        dang        = sum over outdeg==0 of (damping_num * r[v]) // damping_den
        r'[u]       = tele + dang // N + sum of incoming send
        tele        = (scale * (damping_den - damping_num)) // damping_den

    Floor losses are dropped (deterministically) rather than
    redistributed; both the SQL oracle and the reference implementation
    in tests use the identical rule.

    Scale shape — the same partitioned-state regime as
    :func:`_partitioned_cc_rounds`: edges (by source) and per-node state
    (node, outdeg, rank) are hash-split ONCE into per-bucket object-store
    tables; each round moves only the (dst, contribution-partial) rows
    between buckets — already combined per (src-bucket, dst) — plus ONE
    int per bucket (the dangling-mass partial) to the driver. The driver
    never sees a node table. Per-round Dataset executions: zero.

    Contract: every ``src``/``dst`` id must appear in ``nodes`` (sources
    are mapped against co-bucketed state and would KeyError; destinations
    outside ``nodes`` are dropped with their rank mass). Multi-edges send
    multiply; self-loops are allowed.

    Returns a Dataset of ``(node, rank_ppm)``.
    """
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    id_type = pa.int64()
    n_total = nodes.count()
    if n_total == 0:
        # return the empty TABLE directly: a Dataset wrapping an empty
        # block arrives schema-less at consumers (Ray drops the schema
        # with the last row), losing the (node, rank_ppm) contract
        return pa.table({"node": pa.array([], id_type),
                         "rank_ppm": pa.array([], pa.int64())})
    tele = (scale * (damping_den - damping_num)) // damping_den

    e = edges.map_batches(
        lambda t: pa.table({"node": t[src].cast(id_type),
                            "dst": t[dst].cast(id_type)}),
        batch_format="pyarrow",
    )
    empty_edges = pa.table({"node": pa.array([], id_type),
                            "dst": pa.array([], id_type)})
    edge_parts = _split_refs_by_bucket_tbl(e, n_buckets, empty_edges)

    def deg_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "node" not in t.column_names:
            return pa.table({"node": pa.array([], id_type),
                             "outdeg": pa.array([], pa.int64())})
        vc = pd.Series(t["node"].to_numpy(zero_copy_only=False)).value_counts()
        return pa.table({"node": pa.array(vc.index.to_numpy(), id_type),
                         "outdeg": pa.array(vc.to_numpy(), pa.int64())})

    deg = e.map_batches(deg_partial, batch_format="pyarrow") \
        .groupby("node").aggregate(Sum("outdeg", alias_name="outdeg"))
    empty_deg = pa.table({"node": pa.array([], id_type),
                          "outdeg": pa.array([], pa.int64())})
    deg_parts = _split_refs_by_bucket_tbl(deg, n_buckets, empty_deg)

    nd = nodes.map_batches(
        lambda t: pa.table({"node": t[node_col].cast(id_type)}),
        batch_format="pyarrow",
    )
    empty_nodes = pa.table({"node": pa.array([], id_type)})
    node_parts = _split_refs_by_bucket_tbl(nd, n_buckets, empty_nodes)

    @ray.remote
    def init_state(node_tbl: pa.Table, deg_tbl: pa.Table) -> pa.Table:
        ids = node_tbl["node"].to_numpy(zero_copy_only=False)
        od = (
            pd.Series(ids)
            .map(pd.Series(deg_tbl["outdeg"].to_numpy(zero_copy_only=False),
                           index=deg_tbl["node"].to_numpy(zero_copy_only=False)))
            .fillna(0)
            .to_numpy(dtype=np.int64)
        ) if deg_tbl.num_rows else np.zeros(len(ids), np.int64)
        return pa.table({
            "node": pa.array(ids, id_type),
            "outdeg": pa.array(od, pa.int64()),
            "rank_ppm": pa.array(np.full(len(ids), scale, np.int64)),
        })

    state_parts = [init_state.remote(node_parts[b], deg_parts[b])
                   for b in range(n_buckets)]

    empty_contrib = pa.table({"node": pa.array([], id_type),
                              "contrib": pa.array([], pa.int64())})

    @ray.remote
    def push(edge_tbl: pa.Table, state_tbl: pa.Table):
        """Per-source-bucket sends, pre-combined per (this bucket, dst),
        pre-split by the destination's bucket; last return is this
        bucket's dangling-mass partial."""
        import pyarrow.compute as pc

        out = [empty_contrib] * n_buckets
        rank = state_tbl["rank_ppm"].to_numpy(zero_copy_only=False)
        od = state_tbl["outdeg"].to_numpy(zero_copy_only=False)
        dang = int(np.sum((damping_num * rank[od == 0]) // damping_den))
        if edge_tbl.num_rows and state_tbl.num_rows:
            smap = pd.DataFrame(
                {"r": rank, "o": od},
                index=state_tbl["node"].to_numpy(zero_copy_only=False),
            )
            s = edge_tbl["node"].to_numpy(zero_copy_only=False)
            d = edge_tbl["dst"].to_numpy(zero_copy_only=False)
            rs = smap["r"].loc[s].to_numpy()
            os_ = smap["o"].loc[s].to_numpy()
            send = (damping_num * rs) // (damping_den * os_)
            g = pd.Series(send, index=d).groupby(level=0, sort=False).sum()
            tgt = pa.table({"node": pa.array(g.index.to_numpy(), id_type),
                            "contrib": pa.array(g.to_numpy(), pa.int64())})
            tgt = bucket_column(tgt, "node", n_buckets, _PR_BUCKET)
            out = [
                tgt.filter(pc.equal(tgt[_PR_BUCKET], b))
                .drop_columns([_PR_BUCKET])
                for b in range(n_buckets)
            ]
        return (*out, dang)

    @ray.remote
    def update(state_tbl: pa.Table, per_node: int, *contribs) -> pa.Table:
        ids = state_tbl["node"].to_numpy(zero_copy_only=False)
        new = np.full(len(ids), tele + per_node, np.int64)
        live = [c for c in contribs if c.num_rows]
        if live and len(ids):
            cdf = pd.concat([c.to_pandas() for c in live])
            cmap = cdf.groupby("node", sort=False)["contrib"].sum()
            add = pd.Series(ids).map(cmap).fillna(0).to_numpy(dtype=np.int64)
            new = new + add
        return pa.table({
            "node": pa.array(ids, id_type),
            "outdeg": state_tbl["outdeg"],
            "rank_ppm": pa.array(new, pa.int64()),
        })

    for _ in range(iters):
        outs = [
            push.options(num_returns=n_buckets + 1).remote(
                edge_parts[b], state_parts[b])
            for b in range(n_buckets)
        ]
        dang_total = sum(ray.get([outs[b][n_buckets]
                                  for b in range(n_buckets)]))
        per_node = dang_total // n_total
        state_parts = [
            update.remote(state_parts[b], per_node,
                          *[outs[s][b] for s in range(n_buckets)])
            for b in range(n_buckets)
        ]

    return rd.from_arrow_refs(state_parts).select_columns(
        ["node", "rank_ppm"])


# ---------------------------------------------------------------------------
# Triangle counting (wedge-closing self-join)
# ---------------------------------------------------------------------------

def triangle_counts(edges, nodes, *, src: str = "a", dst: str = "b",
                    node_col: str = "node", n_buckets: int = 32):
    """Per-node triangle counts over an undirected graph — the third
    classic graph primitive next to :func:`connected_components` and
    :func:`pagerank_int`, and the standard wedge-closing formulation:

    1. adjacency: edges grouped by their SMALLER endpoint (one bucket
       shuffle) — so every triangle ``a < b < c`` is generated exactly
       once, as the wedge ``(b, c)`` anchored at ``a``;
    2. wedges: each node emits all pairs of its greater neighbors
       (vectorized ``triu_indices`` per node, never a Python pair loop);
    3. closing: wedges semi-join the edge set on ``(b, c)`` — both sides
       bucketed by the SAME hash of ``b``, per-bucket vectorized pandas
       merge (one more shuffle);
    4. counts: every closed wedge credits its three corners; partial
       counts union with a zero row per node so triangle-free nodes
       appear with 0.

    Contract: ``edges`` must be UNIQUE undirected edges with
    ``src < dst`` (normalize+dedup upstream if needed; duplicates would
    double-count). Wedge fan-out is sum over nodes of C(deg⁺, 2) — for
    power-law graphs apply the standard degree-ordering reduction
    upstream (orient each edge toward the higher-degree endpoint) to
    bound it; not needed for the bounded-degree graphs this engine's
    dedup-cluster workloads produce.
    """
    import ray.data as rd
    from ray.data.aggregate import Sum

    id_type = pa.int64()

    def norm(t: pa.Table) -> pa.Table:
        return pa.table({"u": t[src].cast(id_type), "v": t[dst].cast(id_type)})

    e = edges.map_batches(norm, batch_format="pyarrow")
    eb = e.map_batches(
        lambda t: bucket_column(t, "u", n_buckets, _PR_BUCKET),
        batch_format="pyarrow",
    )

    def wedges_bucket(grp: pa.Table) -> pa.Table:
        df = grp.drop_columns([_PR_BUCKET]).to_pandas()
        outs = {"anchor": [], "b": [], "c": []}
        for u, nbrs in df.groupby("u")["v"]:
            arr = np.sort(nbrs.to_numpy())
            if len(arr) < 2:
                continue
            i, j = np.triu_indices(len(arr), k=1)
            outs["anchor"].append(np.full(len(i), u, np.int64))
            outs["b"].append(arr[i])
            outs["c"].append(arr[j])
        if not outs["anchor"]:
            return pa.table({"anchor": pa.array([], id_type),
                             "b": pa.array([], id_type),
                             "c": pa.array([], id_type)})
        return pa.table({k: pa.array(np.concatenate(vs), id_type)
                         for k, vs in outs.items()})

    wedges = eb.groupby(_PR_BUCKET).map_groups(
        wedges_bucket, batch_format="pyarrow"
    )

    # co-locate wedges (by b) with edges (by u) under the SAME hash, then
    # close per bucket with one vectorized merge
    SIDE = "__tc_side"
    wb = wedges.map_batches(
        lambda t: bucket_column(t, "b", n_buckets, _PR_BUCKET)
        .append_column(SIDE, pa.array(np.zeros(t.num_rows, np.int8))),
        batch_format="pyarrow",
    )
    eb2 = e.map_batches(
        lambda t: pa.table({"anchor": pa.nulls(t.num_rows, id_type),
                            "b": t["u"], "c": t["v"]}),
        batch_format="pyarrow",
    ).map_batches(
        lambda t: bucket_column(t, "b", n_buckets, _PR_BUCKET)
        .append_column(SIDE, pa.array(np.ones(t.num_rows, np.int8))),
        batch_format="pyarrow",
    )

    def close_bucket(grp: pa.Table) -> pa.Table:
        df = grp.to_pandas()
        w = df[df[SIDE] == 0]
        ed = df[df[SIDE] == 1][["b", "c"]]
        if len(w) == 0 or len(ed) == 0:
            return pa.table({"node": pa.array([], id_type),
                             "n_partial": pa.array([], pa.int64())})
        hit = w.merge(ed, on=["b", "c"], how="inner")
        corners = np.concatenate([
            hit["anchor"].to_numpy(dtype=np.int64),
            hit["b"].to_numpy(dtype=np.int64),
            hit["c"].to_numpy(dtype=np.int64),
        ])
        vals, cnts = np.unique(corners, return_counts=True)
        return pa.table({"node": pa.array(vals, id_type),
                         "n_partial": pa.array(cnts.astype(np.int64))})

    partials = wb.union(eb2).groupby(_PR_BUCKET).map_groups(
        close_bucket, batch_format="pyarrow"
    )

    zeros = nodes.map_batches(
        lambda t: pa.table({
            "node": t[node_col].cast(id_type),
            "n_partial": pa.array(
                np.zeros(t.num_rows, np.int64)),
        }),
        batch_format="pyarrow",
    )
    return partials.union(zeros).groupby("node").aggregate(
        Sum("n_partial", alias_name="n_triangles")
    )
