"""Aggregate stage (A1/A2) — pre-aggregated counts, shuffle-light.

The reference has NO aggregations; the north_star mandates per-sink
groupby-aggregate counts by (sink/route, role, tool, ts-hour) and per
conv_id (BASELINE.json:L6; SURVEY.md §2.5 A1).

Scale design: a bare ``groupby(keys).count()`` shuffles every row. Instead
each batch is first reduced to one row per distinct key *inside*
``map_batches`` using Arrow's ``Table.group_by`` (C++ hash aggregation),
so the all-to-all exchange moves only partial counts — orders of magnitude
smaller than the input at 100 TB (cardinality ≈ sinks × roles × tools ×
hours per batch). The final ``groupby(keys).aggregate(Sum)`` over partials
is exact; salting of hot conv_ids affects physical placement only, never
these aggregate keys (SURVEY.md §4.2.1).
"""

from __future__ import annotations

import pyarrow as pa
from ray.data import Dataset
from ray.data.aggregate import Sum


def _partial_counts(keys: list[str], count_alias: str):
    def fn(batch: pa.Table) -> pa.Table:
        part = batch.select(keys).group_by(keys).aggregate([([], "count_all")])
        return part.rename_columns(keys + [count_alias])

    return fn


def counts_by(ds: Dataset, keys: list[str], alias: str = "n") -> Dataset:
    """Exact grouped row counts with per-batch partial aggregation.

    Result columns: ``keys + [alias]`` (alias defaults to ``n`` — name it
    identically in oracle SQL: ``COUNT(*) AS n``).
    """
    partial = ds.map_batches(
        _partial_counts(keys, alias), batch_format="pyarrow", batch_size=None
    )
    out = partial.groupby(keys).aggregate(Sum(alias, alias_name=alias))
    return out


def grouped_sum(ds: Dataset, keys: list[str], value: str, alias: str) -> Dataset:
    """Exact grouped sum with per-batch partial aggregation."""

    def fn(batch: pa.Table) -> pa.Table:
        part = batch.select(keys + [value]).group_by(keys).aggregate([(value, "sum")])
        return part.rename_columns(keys + [alias])

    partial = ds.map_batches(fn, batch_format="pyarrow", batch_size=None)
    return partial.groupby(keys).aggregate(Sum(alias, alias_name=alias))
