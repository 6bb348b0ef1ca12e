"""Bucketed range join — custom operator (interval containment at scale).

Joins POINTS (rows with a numeric ``value``) to RANGES (rows with
``lo``/``hi``) on ``lo ≤ value ≤ hi`` without an all-pairs comparison:
the value domain is cut into fixed-width buckets, each range EXPLODES to
every bucket it overlaps, each point maps to exactly ONE bucket, and one
``groupby(bucket)`` shuffle co-locates candidates; the containment test
runs vectorized inside each group. A (point, range) pair can only meet
in the point's bucket, so the output is duplicate-free by construction —
no second dedup pass.

The group function stays pure Arrow (``functions/cogroup.py``): sides
split by the ``_side`` tag BEFORE any conversion, output built with
typed Arrow takes — int64 ids keep exact precision (a pandas frame over
the null-padded union would float them and corrupt values above 2^53).

Scale shape: work per group is |points in bucket| × |ranges overlapping
bucket|; pick ``width`` near the typical range length so ranges explode
to O(1) buckets and the per-group cross product stays bounded. Skewed
value distributions bound the largest group (same documented assumption
as the window family). Both sides may be large; neither is broadcast.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data import Dataset

from ..functions.arrow_utils import as_combined
from ..functions.cogroup import pad_to_schema, split_sides


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
    union_types: dict[str, pa.DataType] = {"_bucket": pa.int64(),
                                           value: pa.float64(),
                                           lo: pa.float64(),
                                           hi: pa.float64()}
    union_types.update({c: p_types[c] for c in point_cols})
    union_types.update({c: r_types[c] for c in range_cols})

    def explode_points(batch: pa.Table) -> pa.Table:
        v = as_combined(batch[value]).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        cols = {"_bucket": pa.array(np.floor(v / width).astype(np.int64)),
                value: pa.array(v)}
        for c in point_cols:
            cols[c] = as_combined(batch[c])
        return pad_to_schema(cols, union_types, batch.num_rows, 0)

    def explode_ranges(batch: pa.Table) -> pa.Table:
        lo_v = as_combined(batch[lo]).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        hi_v = as_combined(batch[hi]).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        b0 = np.floor(lo_v / width).astype(np.int64)
        b1 = np.floor(hi_v / width).astype(np.int64)
        reps = (b1 - b0 + 1).clip(min=0)
        idx = np.repeat(np.arange(len(lo_v)), reps)
        # bucket id per exploded row: b0[i], b0[i]+1, ..., b1[i]
        offs = np.concatenate([[0], np.cumsum(reps)[:-1]])
        b = b0[idx] + (np.arange(len(idx)) - offs[idx])
        take = pa.array(idx)
        cols = {"_bucket": pa.array(b),
                lo: pa.array(lo_v[idx]), hi: pa.array(hi_v[idx])}
        for c in range_cols:
            cols[c] = as_combined(batch[c]).take(take)
        return pad_to_schema(cols, union_types, len(b), 1)

    pt = points.select_columns(
        list(dict.fromkeys([value] + point_cols))
    ).map_batches(explode_points, batch_format="pyarrow", zero_copy_batch=True)
    rg = ranges.select_columns(
        list(dict.fromkeys([lo, hi] + range_cols))
    ).map_batches(explode_ranges, batch_format="pyarrow", zero_copy_batch=True)
    both = pt.union(rg)

    def per_bucket(g: pa.Table) -> pa.Table:
        pts, rgs = split_sides(g)
        v = as_combined(pts[value]).to_numpy(zero_copy_only=False)
        lo_v = as_combined(rgs[lo]).to_numpy(zero_copy_only=False)
        hi_v = as_combined(rgs[hi]).to_numpy(zero_copy_only=False)
        hit_r, hit_p = np.nonzero(
            (lo_v[:, None] <= v[None, :]) & (v[None, :] <= hi_v[:, None]))
        tp, tr = pa.array(hit_p), pa.array(hit_r)
        cols = {c: as_combined(pts[c]).take(tp) for c in point_cols}
        cols.update({c: as_combined(rgs[c]).take(tr) for c in range_cols})
        return pa.table(cols)

    return both.groupby("_bucket").map_groups(per_bucket,
                                              batch_format="pyarrow")
