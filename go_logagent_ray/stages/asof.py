"""As-of (time-travel) join — a custom operator the reference lacks.

For each LEFT row, attach the RIGHT row with the greatest time ≤ the
left row's time within the same key (``direction="backward"``; the
semantics of SQL ``ASOF JOIN`` and ``pd.merge_asof``). The log-pipeline
use case: annotate each event with the most recent preceding state
change / error / deploy marker of the same conversation or user.

Ray-Data-first composition (SURVEY.md §2 custom-operator rule (a)):
the right side's join columns are renamed up front, both sides are
padded to one shared schema and UNIONED, then ``groupby(key).map_groups``
runs a sorted ``pd.merge_asof`` per key group — the single shuffle
co-locates each key's rows; no side is broadcast, so both sides may be
large. PARTITIONING ASSUMPTION (documented, same as the window family):
all rows of one key fit one group; skewed keys bound the largest task.
For a SMALL right side, skip this operator and use a broadcast lookup
(``stages/enrich.py``) instead.

Tie semantics: equal right-side times within a key resolve to the last
row in time-sorted order (pd.merge_asof behavior) — callers needing a
deterministic pick on ties should make the time key unique; the
oracle-checked query returns the matched TIME (identical under any tie
choice).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data import Dataset

from ..functions.arrow_utils import as_combined, set_column


def asof_join_backward(
    left: Dataset,
    right: Dataset,
    *,
    key: str,
    on: str,
    right_values: list[str],
    suffix: str = "_r",
) -> Dataset:
    """Inner backward as-of join. Output: every left column, plus
    ``on+suffix`` (the matched right time) and each right-value column
    (suffixed); left rows with no match drop (SQL ASOF JOIN inner
    semantics)."""
    on_r = on + suffix
    rv_out = [v + suffix for v in right_values]

    l_schema = left.schema()
    r_schema = right.schema()
    l_types = dict(zip(l_schema.names, l_schema.types))
    r_types = dict(zip(r_schema.names, r_schema.types))
    left_cols = list(l_schema.names)
    # shared union schema: left columns + renamed right columns + _side
    r_added = {on_r: r_types[on]}
    r_added.update({v + suffix: r_types[v] for v in right_values})

    def pad_left(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        for name, typ in r_added.items():
            batch = set_column(batch, name, pa.nulls(n, typ))
        return set_column(batch, "_side",
                          pa.array(np.zeros(n, dtype=np.int8)))

    def pad_right(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        out = {c: pa.nulls(n, l_types[c]) for c in left_cols}
        out[key] = as_combined(batch[key])
        out[on_r] = as_combined(batch[on])
        for v in right_values:
            out[v + suffix] = as_combined(batch[v])
        out["_side"] = pa.array(np.ones(n, dtype=np.int8))
        return pa.table(out)

    lt = left.map_batches(pad_left, batch_format="pyarrow",
                          zero_copy_batch=True)
    rt = right.select_columns(
        list(dict.fromkeys([key, on] + right_values))
    ).map_batches(pad_right, batch_format="pyarrow", zero_copy_batch=True)
    both = lt.union(rt)

    out_cols = left_cols + [on_r] + rv_out

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        lg = g[g["_side"] == 0][left_cols + [on_r] + rv_out]
        rg = g[g["_side"] == 1][[on_r] + rv_out]
        if lg.empty or rg.empty:
            return lg.iloc[0:0]
        lg = lg.drop(columns=[on_r] + rv_out)
        merged = pd.merge_asof(
            lg.sort_values(on), rg.sort_values(on_r),
            left_on=on, right_on=on_r, direction="backward")
        return merged[merged[on_r].notna()][out_cols]

    return both.groupby(key).map_groups(per_key, batch_format="pandas")
