"""Aggregate stage (A1/A2) — pre-aggregated counts, shuffle-light.

The reference has NO aggregations; the north_star mandates per-sink
groupby-aggregate counts by (sink/route, role, tool, ts-hour) and per
conv_id (BASELINE.json:L6; SURVEY.md §2.5 A1).

Scale design: a bare ``groupby(keys).count()`` shuffles every row. Every
aggregate here first reduces each batch to one row per distinct key
INSIDE ``map_batches`` (Arrow C++ hash aggregation), so only partials —
bounded by #blocks × per-block key cardinality — move between stages.

Two final-reduce modes:

- ``mode="tree"`` (default): partials → per-block combine → coalesce to
  one block (materialize barrier: streaming repartition fuses with the
  next map, so without the barrier the final combine would run per
  bundle, not per coalesced block — verified) → one exact combine.
  No shuffle at all. Correct whenever the FINAL result fits one block
  (aggregate cardinality ≤ ~10M rows) — true for sink/hour/route counts
  even at 10^12 turns.
- ``mode="shuffle"``: Ray's groupby shuffle. Needed when result
  cardinality itself is huge (e.g. per-conv counts over 10^9
  conversations). Costs a full sort-shuffle with ~10 s fixed overhead in
  this Ray version — measured; amortizes at real scale.
"""

from __future__ import annotations

import pyarrow as pa
from ray.data import Dataset
from ray.data.aggregate import Sum


def _rename(part: pa.Table, keys: list[str], alias: str) -> pa.Table:
    # Select by NAME before renaming: pyarrow group_by().aggregate()
    # column ORDER (keys-first vs aggregates-first) has differed across
    # pyarrow releases, so a positional rename could silently swap the
    # key and value columns under a version change.
    agg = [c for c in part.column_names if c not in keys]
    if len(agg) != 1:
        raise ValueError(f"expected one aggregate column, got {agg}")
    return part.select(keys + agg).rename_columns(keys + [alias])


def _tree_reduce(partials: Dataset, keys: list[str], alias: str,
                 mode: str, fanout: int = 16) -> Dataset:
    """Reduce partial tables (keys + alias sum column) to exact totals."""
    def combine(batch: pa.Table) -> pa.Table:
        part = batch.group_by(keys).aggregate([(alias, "sum")])
        return _rename(part, keys, alias)

    if mode == "shuffle":
        return partials.materialize().groupby(keys) \
            .aggregate(Sum(alias, alias_name=alias))
    if mode != "tree":
        raise ValueError(f"unknown aggregate mode {mode!r}")
    # per-bundle combine (fusion makes this a partial combine — fine),
    # then the exact final combine over ONE coalesced block
    lvl1 = partials.repartition(fanout).map_batches(
        combine, batch_format="pyarrow", batch_size=None)
    return lvl1.repartition(1).materialize().map_batches(
        combine, batch_format="pyarrow", batch_size=None)


def counts_by(ds: Dataset, keys: list[str], alias: str = "n",
              mode: str = "tree") -> Dataset:
    """Exact grouped row counts; columns ``keys + [alias]`` (name the SQL
    oracle column identically: ``COUNT(*) AS n``)."""
    def partial(batch: pa.Table) -> pa.Table:
        part = batch.select(keys).group_by(keys).aggregate([([], "count_all")])
        return _rename(part, keys, alias)

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    return _tree_reduce(partials, keys, alias, mode)


def grouped_sum(ds: Dataset, keys: list[str], value: str, alias: str,
                mode: str = "tree") -> Dataset:
    """Exact grouped sum with per-batch partial aggregation."""
    def partial(batch: pa.Table) -> pa.Table:
        part = batch.select(keys + [value]).group_by(keys).aggregate([(value, "sum")])
        return _rename(part, keys, alias)

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    return _tree_reduce(partials, keys, alias, mode)


def fused_counts(ds: Dataset, key_sets: dict[str, list[str]], alias: str = "n",
                 mode: str = "tree") -> Dataset:
    """SEVERAL grouped counts in ONE pass over the input.

    Each batch emits one partial-count table per key set, tagged
    ``_agg = name`` and null-padded to the union of key columns (Ray and
    Arrow group nulls correctly — verified); one reduce finishes all
    views. Filter the result on ``_agg`` to split views. At 100 TB this
    halves the number of full passes when a pipeline needs multiple
    aggregate views of one stream.
    """
    all_keys: list[str] = []
    for keys in key_sets.values():
        for k in keys:
            if k not in all_keys:
                all_keys.append(k)

    def partial(batch: pa.Table) -> pa.Table:
        pieces = []
        for name, keys in key_sets.items():
            part = batch.select(keys).group_by(keys).aggregate([([], "count_all")])
            part = _rename(part, keys, alias)
            arrays: list = [pa.array([name] * part.num_rows, type=pa.string())]
            names = ["_agg"]
            for k in all_keys:
                names.append(k)
                arrays.append(part[k] if k in keys
                              else pa.nulls(part.num_rows, batch.schema.field(k).type))
            names.append(alias)
            arrays.append(part[alias])
            pieces.append(pa.table(dict(zip(names, arrays))))
        return pa.concat_tables(pieces)

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    return _tree_reduce(partials, ["_agg"] + all_keys, alias, mode)


def topk_rows(ds: Dataset, order_col: str, id_col: str,
              k: int = 25) -> Dataset:
    """GLOBAL top-k rows under the total order (order_col DESC, id_col
    ASC) — the ungrouped sibling of ``grouped_topk``, for ranked
    retrieval results (BM25, PageRank centrality).

    Scale shape: each batch first prunes to its OWN top-k under the
    same total order (a combiner: any row in the global top-k is in
    its batch's top-k), so the final sort+limit runs over ≤ k × blocks
    rows, never the corpus. Rows with a null order or id value are
    excluded (SQL ORDER BY ... LIMIT ranking over non-null keys).
    """
    import polars as pl

    cols = [order_col, id_col]

    def prune(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch.select(cols)).drop_nulls(cols)
        return (df.sort(cols, descending=[True, False]).head(k)
                .to_arrow().cast(batch.select(cols).schema))

    pruned = ds.map_batches(prune, batch_format="pyarrow")
    return pruned.sort(cols, descending=[True, False]).limit(k)


def grouped_topk(ds: Dataset, group_key: str, order_col: str,
                 id_col: str, k: int = 5) -> Dataset:
    """Per-group top-k rows under the total order (order_col DESC,
    id_col ASC), with a 1-based ``rank`` column — row_number() OVER
    (PARTITION BY group ORDER BY ...) ≤ k, the per-language
    best-documents selection of a curation pipeline.

    Scale shape: each batch first reduces to AT MOST k rows per group
    it contains (polars sort + group head — a combiner under the same
    total order), so the shuffle moves ≤ k × blocks rows per group, not
    the corpus; the final per-group merge re-sorts ≤ k × blocks rows.
    Rows with a null group, order, or id value are excluded (SQL
    PARTITION BY/ORDER BY ranking semantics over non-null keys).
    """
    import pandas as pd
    import polars as pl

    cols = [group_key, order_col, id_col]

    def partial(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch.select(cols)).drop_nulls(cols)
        out = (df.sort([order_col, id_col], descending=[True, False])
               .group_by(group_key, maintain_order=True).head(k))
        return out.to_arrow()

    def final(g: "pd.DataFrame") -> "pd.DataFrame":
        g = g.sort_values([order_col, id_col],
                          ascending=[False, True]).head(k).copy()
        g["rank"] = pd.RangeIndex(1, len(g) + 1).astype("int64")
        return g

    parts = ds.map_batches(partial, batch_format="pyarrow")
    return parts.groupby(group_key).map_groups(final, batch_format="pandas")


def grouping_sets_counts(ds: Dataset, keys: list[str],
                         sets: list[list[str]], alias: str = "n", *,
                         sentinels: dict | None = None,
                         mode: str = "tree") -> Dataset:
    """``GROUP BY GROUPING SETS(sets)`` counts — the general multi-level
    aggregate behind ROLLUP (prefix sets) and CUBE (all subsets): one
    row per distinct key tuple of each requested grouping set.

    Scale shape: ONE pass, ONE reduce — each batch aggregates ONCE at
    the full-key level, re-aggregates that key-cardinality-bounded
    result per requested set (counts are additive), and emits
    sentinel-padded partials for every set at once; a single
    ``_tree_reduce`` over the padded key space finishes all sets
    together. Per batch that is ≤ Σ per-set distinct rows, and no set
    ever re-reads the corpus or adds an execution barrier.

    Rolled-up columns are filled with caller ``sentinels`` (required,
    one per key) instead of SQL's NULL markers so downstream
    grouping/hashing never meets a null key. The sentinel must be
    OUT-OF-DOMAIN for its column (a genuine value equal to it would
    merge into the subtotal row) and DEFINES the output key dtype:
    every set's key columns — including the finest — are cast to the
    sentinel's Arrow-inferred type, so all partials share one schema
    regardless of the input's width (int32/large_string/dict keys
    upcast; an impossible cast fails loudly). Rows with a genuine null
    in any key column are excluded first (mirror with ``WHERE k IS NOT
    NULL`` + ``COALESCE`` in the oracle). If the empty set (grand
    total) is requested, its row is emitted even for empty input
    (count 0 — SQL's documented behavior, verified in DuckDB) via a
    seed partial unioned into the reduce.
    """
    import ray

    if not keys:
        raise ValueError("grouping_sets_counts needs at least one key")
    if sentinels is None or set(sentinels) != set(keys):
        raise ValueError("pass one sentinel per key: sentinels={col: v}")
    norm = []
    for s in sets:
        if not set(s) <= set(keys):
            raise ValueError(f"grouping set {s!r} not a subset of keys")
        norm.append([k for k in keys if k in s])  # canonical key order
    if len({tuple(s) for s in norm}) != len(norm):
        raise ValueError("duplicate grouping sets")

    sent_arrays = {k: (sentinels[k], pa.scalar(sentinels[k]).type)
                   for k in keys}

    def _padded(g: pa.Table, kept: list[str], counts) -> pa.Table:
        cols = {}
        for k in keys:
            v, t = sent_arrays[k]
            if k in kept:
                cols[k] = g[k].cast(t)
            else:
                cols[k] = pa.array([v] * len(counts), t)
        cols[alias] = counts
        return pa.table(cols)

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.select(keys).drop_null()
        # one full-batch hash aggregation; every requested set
        # re-aggregates this key-bounded result, never the raw batch
        g = _rename(t.group_by(keys).aggregate([([], "count_all")]),
                    keys, alias)
        out = []
        for kept in norm:
            if kept == keys:
                out.append(_padded(g, keys, g[alias]))
            elif kept:
                lv = _rename(g.group_by(kept).aggregate([(alias, "sum")]),
                             kept, alias)
                out.append(_padded(lv, kept, lv[alias]))
            else:
                out.append(_padded(None, [], pa.array([t.num_rows],
                                                      pa.int64())))
        return pa.concat_tables(out)

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=None)
    if [] in norm:
        seed_cols = {k: pa.array([v], t)
                     for k, (v, t) in sent_arrays.items()}
        seed_cols[alias] = pa.array([0], pa.int64())
        parts = parts.union(ray.data.from_arrow(pa.table(seed_cols)))
    return _tree_reduce(parts, keys, alias, mode)


def rollup_counts(ds: Dataset, keys: list[str], alias: str = "n", *,
                  sentinels: dict | None = None,
                  mode: str = "tree") -> Dataset:
    """``GROUP BY ROLLUP(keys)`` counts: the prefix grouping sets —
    finest, each prefix subtotal, grand total. See
    `grouping_sets_counts` for the one-pass/one-reduce scale shape and
    the sentinel contract."""
    sets = [list(keys[:i]) for i in range(len(keys), -1, -1)]
    return grouping_sets_counts(ds, keys, sets, alias,
                                sentinels=sentinels, mode=mode)


def cube_counts(ds: Dataset, keys: list[str], alias: str = "n", *,
                sentinels: dict | None = None,
                mode: str = "tree") -> Dataset:
    """``GROUP BY CUBE(keys)`` counts: ALL 2^d key subsets (use small
    d; every subset re-aggregates the one full-key aggregate, so depth
    costs partial rows, not corpus passes). See `grouping_sets_counts`
    for the scale shape and sentinel contract."""
    from itertools import combinations

    sets = [list(c) for r in range(len(keys), -1, -1)
            for c in combinations(keys, r)]
    return grouping_sets_counts(ds, keys, sets, alias,
                                sentinels=sentinels, mode=mode)
