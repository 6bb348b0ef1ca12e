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


def grouped_zscore_filter(ds: Dataset, group_key: str, value_col: str,
                          z: int = 2) -> Dataset:
    """Per-group σ-outlier removal over an INTEGER column: keep rows
    with |x − μ_g| ≤ z·σ_g, the "drop length outliers per source"
    curation gate.

    Two-pass grouped-statistics shape (the grouped sibling of the
    global-quantile gate): pass 1 reduces every batch to one
    (group, n, Σx, Σx²) partial row per group — a tiny groupby merges
    them; the per-group thresholds broadcast as plain ints; pass 2 is
    a vectorized streaming filter.

    EXACT integer formulation — no float mean/std ever computed, so an
    oracle hash cannot drift on rounding:

        |x − S/n| ≤ z·σ  ⟺  (x·n − S)² ≤ z²·(n·Σx² − S²)

    evaluated vectorized in int64 when a conservative driver-side bound
    proves (x·n − S)² and the RHS fit (|x| ≤ √Σx² bounds |d|), else a
    per-row Python-int fallback for the comparison. REGIME: the
    (n, Σx, Σx²) partials themselves accumulate in int64, so each
    group needs n_g · max(x)² < 2^63 (e.g. 10⁹ rows of values ≤ 3·10⁴,
    or 10⁶ rows ≤ 10⁶) — per-row squares are multiply_checked and fail
    loudly, and beyond the sum bound the extension is a hi/lo split
    accumulator. Null group or value rows are dropped (SQL join
    semantics)."""
    import ray

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.select([group_key, value_col]).drop_null()
        x = t.column(value_col)
        x2 = pc.multiply_checked(pc.cast(x, pa.int64()),
                                 pc.cast(x, pa.int64()))
        p = pa.table({group_key: t.column(group_key),
                      "n": pa.nulls(t.num_rows, pa.int64()),
                      "s": pc.cast(x, pa.int64()),
                      "s2": x2}) \
            .set_column(1, "n", pa.array(np.ones(t.num_rows, np.int64))) \
            .group_by([group_key]) \
            .aggregate([("n", "sum"), ("s", "sum"), ("s2", "sum")])
        return p.select([group_key, "n_sum", "s_sum", "s2_sum"]) \
            .rename_columns([group_key, "n", "s", "s2"])

    parts = ds.map_batches(partial, batch_format="pyarrow")
    stats = parts.groupby(group_key).aggregate(
        Sum("n", alias_name="n"), Sum("s", alias_name="s"),
        Sum("s2", alias_name="s2"))
    # group cardinality is bounded (languages/sources); Python ints for
    # the exact arithmetic
    thr: dict = {}
    fits64 = True
    for b in stats.iter_batches(batch_format="pyarrow"):
        for g, n, s, s2 in zip(b[group_key].to_pylist(),
                               b["n"].to_pylist(), b["s"].to_pylist(),
                               b["s2"].to_pylist()):
            n, s, s2 = int(n), int(s), int(s2)
            rhs = z * z * (n * s2 - s * s)
            thr[g] = (n, s, rhs)
            # |d| = |x·n − S| ≤ n·√Σx² + |S| — conservative int64 proof
            d_bound = n * int(s2 ** 0.5 + 1) + abs(s)
            if d_bound * d_bound >= (1 << 63) or rhs >= (1 << 63):
                fits64 = False
    keys = list(thr)
    ref = ray.put((
        pa.array(keys),
        np.array([thr[g][0] for g in keys], np.int64) if fits64 else None,
        np.array([thr[g][1] for g in keys], np.int64) if fits64 else None,
        np.array([thr[g][2] for g in keys], np.int64) if fits64 else None,
        thr if not fits64 else None,
    ))

    def keep(batch: pa.Table) -> pa.Table:
        key_arr, n_a, s_a, rhs_a, tm = ray.get(ref)
        # null checks on the join columns only — other columns may
        # legitimately hold nulls
        t = batch.filter(pc.and_(pc.is_valid(batch[group_key]),
                                 pc.is_valid(batch[value_col])))
        if t.num_rows == 0:
            return t
        if tm is None:
            # vectorized int64 path (proven overflow-free above)
            idx = pc.index_in(as_combined(t[group_key]),
                              value_set=key_arr)
            valid = pc.is_valid(idx).to_numpy(zero_copy_only=False) \
                .astype(bool)
            ii = pc.fill_null(idx, 0).to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            x = t.column(value_col).to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            d = x * n_a[ii] - s_a[ii]
            mask = valid & (d * d <= rhs_a[ii])
            return t.filter(pa.array(mask))
        gs = t.column(group_key).to_pylist()
        xs = t.column(value_col).to_pylist()
        mask = np.zeros(t.num_rows, dtype=bool)
        for i, (g, x) in enumerate(zip(gs, xs)):
            st = tm.get(g)
            if st is not None:
                n, s, rhs = st
                d = int(x) * n - s
                mask[i] = d * d <= rhs
        return t.filter(pa.array(mask))

    return ds.map_batches(keep, batch_format="pyarrow")
