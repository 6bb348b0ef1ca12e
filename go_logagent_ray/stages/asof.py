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

NULL semantics: rows with a null key or null time match nothing (SQL
ASOF JOIN); they are dropped BEFORE the shuffle.

PARTITIONING: the default path needs all rows of one key in one group
(unsalted grouping — same assumption as the window family). For hot
keys, pass ``salt_chunk`` to switch to the two-level SALTED variant:
rows group by ``(key, on // salt_chunk)`` — contiguous TIME chunks —
each chunk resolves its left rows locally and emits (a) matched rows,
(b) its still-unmatched left rows (those preceding the chunk's first
right row), and (c) ONE boundary row per chunk: the chunk's latest
right row. A tiny per-key second pass then as-of-joins the pending
lefts against the boundary rows — correct because a left row in chunk
c that failed locally can only match the LATEST right row of some
chunk < c, and every right row of an earlier chunk has strictly
smaller time. The second-pass group holds one row per chunk plus the
pending lefts, not per input row; size ``salt_chunk`` so chunks
usually contain right rows (a chunk with none forwards all its lefts).
``hot`` (e.g. from ``partition.hot_keys``) restricts salting to the
skewed keys. Results are identical to the unsalted path.

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
from ..functions.cogroup import SIDE_COL, pad_to_schema, split_sides


def _on_int64(col) -> np.ndarray:
    """The join-time column as int64 (timestamps pinned to µs first so
    a nanosecond coercion can never shift values)."""
    arr = as_combined(col)
    if pa.types.is_timestamp(arr.type):
        arr = arr.cast(pa.timestamp("us"))
    return arr.cast(pa.int64()).to_numpy(zero_copy_only=False)


def _merge_asof(lg: pa.Table, rg: pa.Table, on: str, on_r: str,
                left_cols: list[str], right_out: list[str],
                direction: str = "backward") -> tuple[pa.Table, pa.Table]:
    """Pure-Arrow local as-of merge: sort both sides, searchsorted picks
    the LAST right row with time ≤ each left time (backward) or the
    FIRST right row with time ≥ each left time (forward) —
    pd.merge_asof semantics — then two typed takes. Returns
    (matched rows, unmatched left rows)."""
    l_on = _on_int64(lg[on])
    r_on = _on_int64(rg[on_r]) if rg.num_rows else np.zeros(0, np.int64)
    l_idx = np.argsort(l_on, kind="stable")
    r_idx = np.argsort(r_on, kind="stable")
    if direction == "backward":
        pos = np.searchsorted(r_on[r_idx], l_on[l_idx], side="right") - 1
        keep = pos >= 0
    else:
        pos = np.searchsorted(r_on[r_idx], l_on[l_idx], side="left")
        keep = pos < len(r_on)
    lt = lg.take(pa.array(l_idx[keep]))
    rt = rg.take(pa.array(r_idx[pos[keep]]))
    cols = {c: lt[c] for c in left_cols}
    cols.update({c: rt[c] for c in right_out})
    matched = pa.table(cols)
    unmatched = lg.take(pa.array(l_idx[~keep]))
    return matched, unmatched


def asof_join_backward(
    left: Dataset,
    right: Dataset,
    *,
    key: str,
    on: str,
    right_values: list[str],
    suffix: str = "_r",
    salt_chunk: int | None = None,
    hot: set | None = None,
    direction: str = "backward",
) -> Dataset:
    """Inner as-of join (``direction``: "backward" = latest right ≤
    left time, the default; "forward" = earliest right ≥ left time).
    Output: every left column, plus ``on+suffix`` (the matched right
    time) and each right-value column (suffixed); left rows with no
    match drop (SQL ASOF JOIN inner semantics). ``salt_chunk`` (in
    units of ``on``; µs for timestamps) switches to the two-level
    salted path — see module docstring; the forward salted path is the
    exact mirror (boundary row = the chunk's EARLIEST right; a pending
    left can only match a LATER chunk's rights, all of which sit in
    later boundary rows)."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown direction {direction!r}")
    on_r = on + suffix
    rv_out = [v + suffix for v in right_values]

    l_schema = left.schema()
    r_schema = right.schema()
    r_types = dict(zip(r_schema.names, r_schema.types))
    left_cols = list(l_schema.names)
    union_types = dict(zip(l_schema.names, l_schema.types))
    union_types[on_r] = r_types[on]
    union_types.update({v + suffix: r_types[v] for v in right_values})
    chunk = None if salt_chunk is None else max(1, int(salt_chunk))
    if chunk is not None:
        union_types["_salt"] = pa.int64()
    hot_list = None if hot is None else list(hot)

    def _salt_of(keys_arr, on_arr, n: int) -> np.ndarray:
        o = _on_int64(on_arr)
        salt = o // chunk
        if hot_list is not None:
            keys_np = as_combined(keys_arr).to_numpy(zero_copy_only=False)
            if keys_np.dtype.kind in "iu":   # int keys: vectorized isin
                hot_np = np.asarray(hot_list, dtype=keys_np.dtype)
            else:
                keys_np = np.asarray(keys_np, dtype=object)
                hot_np = np.asarray(hot_list, dtype=object)
            salt = np.where(np.isin(keys_np, hot_np), salt, np.int64(0))
        return salt.astype(np.int64)

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
        if chunk is not None:
            cols["_salt"] = pa.array(
                _salt_of(batch[key], batch[on], batch.num_rows))
        return pad_to_schema(cols, union_types, batch.num_rows, 0)

    def pad_right(batch: pa.Table) -> pa.Table:
        batch = drop_null_join_cols(batch)
        cols = {key: as_combined(batch[key]),
                on_r: as_combined(batch[on])}
        for v in right_values:
            cols[v + suffix] = as_combined(batch[v])
        if chunk is not None:
            cols["_salt"] = pa.array(
                _salt_of(batch[key], batch[on], batch.num_rows))
        return pad_to_schema(cols, union_types, batch.num_rows, 1)

    lt = left.map_batches(pad_left, batch_format="pyarrow",
                          zero_copy_batch=True)
    rt = right.select_columns(
        list(dict.fromkeys([key, on] + right_values))
    ).map_batches(pad_right, batch_format="pyarrow", zero_copy_batch=True)
    both = lt.union(rt)
    out_cols = left_cols + [on_r] + rv_out

    if chunk is None:
        def per_key(g: pa.Table) -> pa.Table:
            lg, rg = split_sides(g)
            matched, _ = _merge_asof(
                lg.select(left_cols), rg.select([on_r] + rv_out),
                on, on_r, left_cols, [on_r] + rv_out, direction)
            return matched

        return both.groupby(key).map_groups(per_key, batch_format="pyarrow")

    # ---------------- salted two-level path ----------------
    # Stage-1 output rides the same union schema, with the _side tag
    # reused as a ROLE: 0 = matched (final), 1 = pending left,
    # 2 = chunk-boundary right row.
    hot_set = None if hot is None else set(hot)

    def per_chunk(g: pa.Table) -> pa.Table:
        lg, rg = split_sides(g)
        lg = lg.select(left_cols)
        rgk = rg.select([key, on_r] + rv_out)
        rg = rg.select([on_r] + rv_out)
        matched, pending = _merge_asof(lg, rg, on, on_r, left_cols,
                                       [on_r] + rv_out, direction)
        pieces = [pad_to_schema({c: matched[c] for c in out_cols},
                                union_types, matched.num_rows, 0)]
        if hot_set is not None and g.num_rows:
            # hot-gated mode: a NON-hot key rides salt 0, so this chunk
            # holds the WHOLE key — its pending lefts can never match
            # (no earlier chunk exists) and no later chunk will need its
            # boundary row.  Emitting neither keeps the stitch stage's
            # group count at hot-keys × chunks instead of every key.
            kv = g.column(key)[0].as_py()
            if kv not in hot_set:
                return pieces[0]
        if pending.num_rows:
            pieces.append(pad_to_schema({c: pending[c] for c in left_cols},
                                        union_types, pending.num_rows, 1))
        if rgk.num_rows:
            # boundary = the chunk's LATEST right row for backward
            # (last equal-time row in stable order, matching the local
            # tie choice) / EARLIEST for forward (first equal-time row)
            r_on = _on_int64(rgk[on_r])
            order = np.argsort(r_on, kind="stable")
            bi = int(order[-1] if direction == "backward" else order[0])
            b = rgk.slice(bi, 1)
            pieces.append(pad_to_schema(
                {c: as_combined(b[c]) for c in [key, on_r] + rv_out},
                union_types, 1, 2))
        return pa.concat_tables(pieces)

    # materialize once: two consumers (matched pass-through + the tiny
    # boundary-stitch shuffle) must not re-run the wide stage-1 shuffle
    s1 = both.groupby([key, "_salt"]).map_groups(
        per_chunk, batch_format="pyarrow").materialize()

    def only_matched(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.equal(batch[SIDE_COL], 0)).select(out_cols)

    def only_rest(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.not_equal(batch[SIDE_COL], 0))

    done = s1.map_batches(only_matched, batch_format="pyarrow",
                          zero_copy_batch=True)
    rest = s1.map_batches(only_rest, batch_format="pyarrow",
                          zero_copy_batch=True)

    def stitch(g: pa.Table) -> pa.Table:
        side = g[SIDE_COL]
        lg = g.filter(pc.equal(side, 1)).select(left_cols)
        rg = g.filter(pc.equal(side, 2)).select([on_r] + rv_out)
        # a pending left (chunk c) can only match a boundary right of a
        # chunk < c, and ALL boundary rights of earlier chunks have
        # strictly smaller time than any chunk-c left — so a plain
        # backward merge over boundary rows is exact
        matched, _ = _merge_asof(lg, rg, on, on_r, left_cols,
                                 [on_r] + rv_out, direction)
        return matched

    late = rest.groupby(key).map_groups(stitch, batch_format="pyarrow")
    return done.union(late)
