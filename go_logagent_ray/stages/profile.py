"""Column profiling — per-column data-quality stats in one pass.

A corpus pipeline's standard pre-flight: row/null/NaN counts and value
ranges per column, computed as per-batch partials (one tiny row per
column per batch) merged by a small groupby — the shuffle moves
O(columns × blocks) rows regardless of data size. Only order-independent
stats are emitted (counts, min, max): a float SUM would depend on
reduction order and could not be oracle-compared exactly.

NaN semantics: min/max are defined OVER NON-NaN VALUES and NaNs are
counted separately in ``n_nan`` — engines disagree on NaN ordering
(Arrow kernels skip NaN, DuckDB sorts it greatest), so baking NaN into
min/max would silently diverge from any SQL oracle; the explicit count
keeps the comparison exact and is more useful profiling output anyway.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset
from ray.data.aggregate import Max, Min, Sum

from ..functions.arrow_utils import as_combined


def profile_numeric(ds: Dataset, columns: list[str]) -> Dataset:
    """Per-column (n, n_null, n_nan, min, max) over numeric columns, all
    values cast to float64 for a uniform output schema. Output: one row
    per column — (column:string, n:int64, n_null:int64, n_nan:int64,
    min:float64, max:float64); min/max are null for an all-null/NaN
    column."""

    def partial(batch: pa.Table) -> pa.Table:
        names, ns, nulls, nans, mins, maxs = [], [], [], [], [], []
        for c in columns:
            col = pc.cast(as_combined(batch[c]), pa.float64())
            v = col.to_numpy(zero_copy_only=False)
            # to_numpy renders nulls as NaN too — subtract them out
            n_nan = int(np.isnan(v).sum()) - col.null_count
            # mask NaN to null BEFORE min_max: on an all-NaN (or NaN+null)
            # batch pc.min_max returns +inf/-inf instead of null
            # (pyarrow 16.1), which would leak inf into the merged profile;
            # with NaN masked out an all-NaN batch yields null as documented
            masked = pc.if_else(pc.is_nan(col),
                                pa.scalar(None, type=pa.float64()), col)
            mm = pc.min_max(masked)
            names.append(c)
            ns.append(batch.num_rows)
            nulls.append(col.null_count)
            nans.append(n_nan)
            mins.append(mm["min"].as_py())
            maxs.append(mm["max"].as_py())
        return pa.table({
            "column": pa.array(names, type=pa.string()),
            "n": pa.array(ns, type=pa.int64()),
            "n_null": pa.array(nulls, type=pa.int64()),
            "n_nan": pa.array(nans, type=pa.int64()),
            "min": pa.array(mins, type=pa.float64()),
            "max": pa.array(maxs, type=pa.float64()),
        })

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    return partials.groupby("column").aggregate(
        Sum("n", alias_name="n"),
        Sum("n_null", alias_name="n_null"),
        Sum("n_nan", alias_name="n_nan"),
        Min("min", alias_name="min"),
        Max("max", alias_name="max"),
    )
