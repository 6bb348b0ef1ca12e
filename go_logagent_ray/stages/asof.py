"""As-of (time-travel) join — a custom operator the reference lacks.

For each LEFT row, attach the RIGHT row with the greatest time ≤ the
left row's time within the same key (``direction="backward"``; the
semantics of SQL ``ASOF JOIN`` and ``pd.merge_asof``). The log-pipeline
use case: annotate each event with the most recent preceding state
change / error / deploy marker of the same conversation or user.

Ray-Data-first composition (SURVEY.md §2 custom-operator rule (a)):
the right side's join columns are renamed up front, both sides are
padded to one shared schema (``functions/cogroup.py``) and UNIONED,
then ``groupby(key)`` co-locates each key with ONE shuffle and a pure-
Arrow sorted searchsorted merge runs per group. The group function
never converts the null-padded union to pandas — sides are split and
matched with typed Arrow takes, so int64 columns keep exact precision
(a pandas frame over padding nulls would float them and corrupt ids
above 2^53). No side is broadcast, so both sides may be large.
PARTITIONING ASSUMPTION (documented, same as the window family): all
rows of one key fit one group. For a SMALL right side, skip this
operator and use a broadcast lookup (``stages/enrich.py``).

Tie semantics: equal right-side times within a key resolve to the last
equal-time row in the stable sort of shuffle arrival order — i.e. the
matched TIME is deterministic but WHICH tied right row wins is not.
Callers needing oracle-exact output on tied times must either make the
time key unique or return only the matched time (identical under any
tie choice), as the oracle-checked query does.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from ..functions.arrow_utils import as_combined
from ..functions.cogroup import pad_to_schema, split_sides


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
    r_types = dict(zip(r_schema.names, r_schema.types))
    left_cols = list(l_schema.names)
    union_types = dict(zip(l_schema.names, l_schema.types))
    union_types[on_r] = r_types[on]
    union_types.update({v + suffix: r_types[v] for v in right_values})

    def drop_null_join_cols(batch: pa.Table) -> pa.Table:
        # SQL ASOF JOIN semantics: a NULL key or NULL time matches
        # nothing. Dropped BEFORE the shuffle (less data moved) — and
        # before the numpy merge, where a null int64 time would become
        # NaN and sort as the LARGEST value, wrongly matching the
        # latest right row.
        mask = pc.and_kleene(pc.is_valid(batch[key]), pc.is_valid(batch[on]))
        return batch.filter(mask)

    def pad_left(batch: pa.Table) -> pa.Table:
        batch = drop_null_join_cols(batch)
        cols = {c: as_combined(batch[c]) for c in batch.column_names}
        return pad_to_schema(cols, union_types, batch.num_rows, 0)

    def pad_right(batch: pa.Table) -> pa.Table:
        batch = drop_null_join_cols(batch)
        cols = {key: as_combined(batch[key]),
                on_r: as_combined(batch[on])}
        for v in right_values:
            cols[v + suffix] = as_combined(batch[v])
        return pad_to_schema(cols, union_types, batch.num_rows, 1)

    lt = left.map_batches(pad_left, batch_format="pyarrow",
                          zero_copy_batch=True)
    rt = right.select_columns(
        list(dict.fromkeys([key, on] + right_values))
    ).map_batches(pad_right, batch_format="pyarrow", zero_copy_batch=True)
    both = lt.union(rt)

    def per_key(g: pa.Table) -> pa.Table:
        lg, rg = split_sides(g)
        lg = lg.select(left_cols)
        rg = rg.select([on_r] + rv_out)
        # pure-Arrow backward as-of: sort both sides, searchsorted picks
        # the LAST right row with time ≤ each left time (pd.merge_asof
        # semantics), then two typed takes — no pandas, so int64 columns
        # keep exact precision even when some left rows are unmatched
        l_on = as_combined(lg[on]).to_numpy(zero_copy_only=False)
        r_on = as_combined(rg[on_r]).to_numpy(zero_copy_only=False)
        l_idx = np.argsort(l_on, kind="stable")
        r_idx = np.argsort(r_on, kind="stable")
        pos = np.searchsorted(r_on[r_idx], l_on[l_idx], side="right") - 1
        keep = pos >= 0
        lt = lg.take(pa.array(l_idx[keep]))
        rt = rg.take(pa.array(r_idx[pos[keep]]))
        cols = {c: lt[c] for c in left_cols}
        cols.update({c: rt[c] for c in [on_r] + rv_out})
        return pa.table(cols)

    return both.groupby(key).map_groups(per_key, batch_format="pyarrow")
