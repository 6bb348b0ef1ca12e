"""Bucketed range join — custom operator (interval containment at scale).

Joins POINTS (rows with a numeric ``value``) to RANGES (rows with
``lo``/``hi``) on ``lo ≤ value ≤ hi`` without an all-pairs comparison:
the value domain is cut into fixed-width buckets, each range EXPLODES to
every bucket it overlaps, each point maps to exactly ONE bucket, and one
``groupby(bucket)`` shuffle co-locates candidates; the containment test
runs vectorized inside each group. A (point, range) pair can only meet
in the point's bucket, so the output is duplicate-free by construction —
no second dedup pass.

Scale shape: work per group is |points in bucket| × |ranges overlapping
bucket|; pick ``width`` near the typical range length so ranges explode
to O(1) buckets and the per-group cross product stays bounded. Skewed
value distributions bound the largest group (same documented assumption
as the window family). Both sides may be large; neither is broadcast.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data import Dataset

from ..functions.arrow_utils import as_combined


def range_join_buckets(
    points: Dataset,
    ranges: Dataset,
    *,
    value: str,
    lo: str,
    hi: str,
    width: float,
    point_cols: list[str],
    range_cols: list[str],
) -> Dataset:
    """Inner containment join; output columns = point_cols + range_cols.
    Column name collisions must be resolved by the caller beforehand."""
    if width <= 0:
        raise ValueError("width must be positive")

    # resolve types EAGERLY — the per-batch closures must not capture the
    # Dataset objects themselves
    p_schema = points.schema()
    r_schema = ranges.schema()
    p_types = dict(zip(p_schema.names, p_schema.types))
    r_types = dict(zip(r_schema.names, r_schema.types))

    def explode_points(batch: pa.Table) -> pa.Table:
        v = as_combined(batch[value]).to_numpy(zero_copy_only=False)
        b = np.floor(v / width).astype(np.int64)
        out = {"_bucket": pa.array(b), "_side": pa.array(
            np.zeros(len(b), dtype=np.int8)), value: pa.array(v)}
        for c in point_cols:
            out[c] = as_combined(batch[c])
        for c in [lo, hi]:
            out[c] = pa.nulls(len(b), pa.float64())
        for c in range_cols:
            out[c] = pa.nulls(len(b), r_types[c])
        return pa.table(out)

    def explode_ranges(batch: pa.Table) -> pa.Table:
        lo_v = as_combined(batch[lo]).to_numpy(zero_copy_only=False)
        hi_v = as_combined(batch[hi]).to_numpy(zero_copy_only=False)
        b0 = np.floor(lo_v / width).astype(np.int64)
        b1 = np.floor(hi_v / width).astype(np.int64)
        reps = (b1 - b0 + 1).clip(min=0)
        idx = np.repeat(np.arange(len(lo_v)), reps)
        # bucket id per exploded row: b0[i], b0[i]+1, ..., b1[i]
        offs = np.concatenate([[0], np.cumsum(reps)[:-1]])
        b = b0[idx] + (np.arange(len(idx)) - offs[idx])
        out = {"_bucket": pa.array(b), "_side": pa.array(
            np.ones(len(b), dtype=np.int8)),
            value: pa.nulls(len(b), pa.float64()),
            lo: pa.array(lo_v[idx]), hi: pa.array(hi_v[idx])}
        for c in point_cols:
            out[c] = pa.nulls(len(b), p_types[c])
        for c in range_cols:
            out[c] = as_combined(batch[c]).take(pa.array(idx))
        return pa.table(out)

    pt = points.select_columns(
        list(dict.fromkeys([value] + point_cols))
    ).map_batches(explode_points, batch_format="pyarrow", zero_copy_batch=True)
    rg = ranges.select_columns(
        list(dict.fromkeys([lo, hi] + range_cols))
    ).map_batches(explode_ranges, batch_format="pyarrow", zero_copy_batch=True)
    both = pt.union(rg)

    out_cols = point_cols + range_cols

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        pts = g[g["_side"] == 0]
        rgs = g[g["_side"] == 1]
        if pts.empty or rgs.empty:
            return pts.iloc[0:0][out_cols]
        v = pts[value].to_numpy()
        lo_v = rgs[lo].to_numpy()
        hi_v = rgs[hi].to_numpy()
        hit_r, hit_p = np.nonzero(
            (lo_v[:, None] <= v[None, :]) & (v[None, :] <= hi_v[:, None]))
        out = {}
        for c in point_cols:
            out[c] = pts[c].to_numpy()[hit_p]
        for c in range_cols:
            out[c] = rgs[c].to_numpy()[hit_r]
        return pd.DataFrame(out, columns=out_cols)

    return both.groupby("_bucket").map_groups(per_bucket, batch_format="pandas")
