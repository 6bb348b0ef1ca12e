"""Per-key ordered / windowed aggregates (custom operator family W).

Ray Data has no event-time windows; stream-shaped semantics are expressed
as "partition by key, sort within partition" per the Ray streaming-shaped
pattern: ``groupby(key).map_groups(fn)`` where ``fn`` sees one FULL key
group and applies ordered logic with pandas/numpy.

PARTITIONING ASSUMPTION (documented per SURVEY.md §2 custom-operator
rule): by default each operator needs all rows of one key in one group
(unsalted grouping), with hot-key skew bounding the largest group. Both
``conv_gap_stats`` AND ``session_windows`` offer a SALTED two-level
variant (``salt_chunk=...``): rows group by ``(key, order//salt_chunk)``
— contiguous order-ranges — each sub-group emits an associative partial
(gap stats: count/internal max gap/boundary timestamps; sessions: the
chunk's local sessions), and a tiny second groupby re-merges partials
per key across chunk boundaries. A hot conversation then never pins a
whole task; results are identical to the unsalted path (for sessions,
under a ts-monotone-in-order precondition that is CHECKED at runtime).
``hot`` (e.g. from ``partition.hot_keys``) restricts salting to the
skewed keys so normal keys keep single-group partials.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data import Dataset

from ..functions.arrow_utils import as_combined, set_column


def _make_add_salt(key: str, order: str, chunk: int, hot: set | None):
    """Shared (key, order//chunk) salting stage for the two-level window
    variants; ``hot`` restricts salting to the skewed keys."""
    def add_salt(batch: pa.Table) -> pa.Table:
        o = as_combined(batch[order]).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        salt = o // chunk
        if hot is not None:
            keys = np.asarray(as_combined(batch[key]).to_pylist(),
                              dtype=object)
            salt = np.where(np.isin(keys, list(hot)), salt, 0)
        return set_column(batch, "_salt", pa.array(salt, type=pa.int64()))

    return add_salt


def conv_gap_stats(ds: Dataset, key: str = "conv_id", ts: str = "ts",
                   order: str = "turn_idx", *,
                   salt_chunk: int | None = None,
                   hot: set | None = None) -> Dataset:
    """Per-conversation ordered stats: turn count, max inter-turn gap (µs).

    The ordered diff needs each conversation's rows consecutive and
    sorted by ``order``. Default path: one group per key. Salted path
    (``salt_chunk`` set): two-level associative merge as described in the
    module docstring — exact for any chunking because ``order // chunk``
    buckets are contiguous in sort order, so every consecutive-row gap is
    either inside one bucket or between two adjacent bucket boundaries.
    """
    if salt_chunk is not None:
        return _gap_stats_salted(ds, key, ts, order, salt_chunk, hot)

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order)
        t = g[ts].to_numpy().astype("datetime64[us]").astype(np.int64)
        gap = int(np.diff(t).max()) if len(t) > 1 else 0
        return pd.DataFrame({key: [g[key].iloc[0]],
                             "n_turns": np.array([len(g)], dtype=np.int64),
                             "max_gap_us": np.array([gap], dtype=np.int64)})

    return ds.groupby(key).map_groups(per_group, batch_format="pandas")


def _gap_stats_salted(ds: Dataset, key: str, ts: str, order: str,
                      salt_chunk: int, hot: set | None) -> Dataset:
    """Two-level assoc merge: (key, order//chunk) partials → per-key merge."""
    chunk = max(1, int(salt_chunk))
    add_salt = _make_add_salt(key, order, chunk, hot)

    # "no internal gap" sentinel for single-row partials: 0 would CLAMP a
    # true negative max gap (out-of-order timestamps) and diverge from
    # the unsalted path, which only falls back to 0 when the whole key
    # has a single row
    _NOGAP = np.iinfo(np.int64).min

    def partial(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order)
        t = g[ts].to_numpy().astype("datetime64[us]").astype(np.int64)
        gap = int(np.diff(t).max()) if len(t) > 1 else _NOGAP
        return pd.DataFrame({
            key: [g[key].iloc[0]],
            "_first_order": np.array([g[order].iloc[0]], dtype=np.int64),
            "_first_ts": np.array([t[0]], dtype=np.int64),
            "_last_ts": np.array([t[-1]], dtype=np.int64),
            "n_turns": np.array([len(g)], dtype=np.int64),
            "max_gap_us": np.array([gap], dtype=np.int64),
        })

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("_first_order")
        cand = [v for v in g["max_gap_us"].to_numpy() if v != _NOGAP]
        if len(g) > 1:
            cross = g["_first_ts"].to_numpy()[1:] - g["_last_ts"].to_numpy()[:-1]
            cand.extend(int(c) for c in cross)
        gap = max(cand) if cand else 0  # single-row key → 0, like unsalted
        return pd.DataFrame({key: [g[key].iloc[0]],
                             "n_turns": np.array([g["n_turns"].sum()], dtype=np.int64),
                             "max_gap_us": np.array([int(gap)], dtype=np.int64)})

    salted = ds.map_batches(add_salt, batch_format="pyarrow",
                            zero_copy_batch=True)
    partials = salted.groupby([key, "_salt"]).map_groups(
        partial, batch_format="pandas")
    return partials.groupby(key).map_groups(merge, batch_format="pandas")


def tumbling_window_counts(ds: Dataset, key: str, ts: str,
                           window: str = "hour") -> Dataset:
    """Tumbling event-time windows = floor_temporal + grouped counts —
    no per-group Python at all (the cheap path when order is irrelevant)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..functions.arrow_utils import as_combined, set_column
    from .aggregate import counts_by

    def add_window(batch: pa.Table) -> pa.Table:
        w = pc.floor_temporal(as_combined(batch[ts]), unit=window)
        return set_column(batch, "window_start", w)

    with_w = ds.map_batches(add_window, batch_format="pyarrow",
                            zero_copy_batch=True)
    return counts_by(with_w, [key, "window_start"], alias="n")


def sliding_window_counts(ds: Dataset, key: str, ts: str,
                          length_us: int, hop_us: int,
                          alias: str = "n") -> Dataset:
    """Hopping/sliding event-time windows: counts per (key, window_start)
    where windows start every ``hop_us`` and span ``length_us``
    (``length_us`` must be a multiple of ``hop_us``). Each row explodes
    to its length/hop covering windows inside ``map_batches`` (no
    per-group Python, order-free), then the usual pre-aggregated count
    shuffle. length == hop degenerates to tumbling windows."""
    import pyarrow as pa

    from ..functions.arrow_utils import as_combined
    from .aggregate import counts_by

    if length_us % hop_us != 0 or length_us <= 0 or hop_us <= 0:
        raise ValueError("length_us must be a positive multiple of hop_us")
    n_win = length_us // hop_us

    def explode(batch: pa.Table) -> pa.Table:
        t = as_combined(batch[ts]).cast(pa.timestamp("us")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        base = (t // hop_us) * hop_us  # latest window containing the row
        starts = (base[:, None]
                  - np.arange(n_win, dtype=np.int64)[None, :] * hop_us)
        keys = as_combined(batch[key])
        idx = pa.array(np.repeat(np.arange(len(t)), n_win))
        return pa.table({
            key: keys.take(idx),
            "window_start": pa.array(starts.reshape(-1),
                                     type=pa.int64()).cast(pa.timestamp("us")),
        })

    exploded = ds.map_batches(explode, batch_format="pyarrow",
                              zero_copy_batch=True)
    return counts_by(exploded, [key, "window_start"], alias=alias)


def session_windows(ds: Dataset, key: str = "conv_id", ts: str = "ts",
                    order: str = "turn_idx",
                    gap_us: int = 600_000_000, *,
                    salt_chunk: int | None = None,
                    hot: set | None = None) -> Dataset:
    """Session windowing: split each conversation where the inter-turn gap
    exceeds ``gap_us``; emits (key, session_idx, n_turns, start_ts, end_ts).

    Default path: full, ordered conversations (unsalted grouping). Salted
    path (``salt_chunk``): sessions ARE mergeable across contiguous
    order-range chunks — each (key, order//chunk) sub-group emits its
    LOCAL sessions plus boundary info, and a per-key second pass stitches
    sessions across chunk boundaries (gap ≤ gap_us → merge) and
    renumbers. The merge task holds one row per LOCAL SESSION, not per
    turn — a hot conversation with few gaps costs O(chunks), not
    O(turns). Results identical to the unsalted path PROVIDED ``ts`` is
    non-decreasing in ``order`` within each key (true for transcript
    data by construction) — the stitch compares session boundary
    timestamps, which equal the boundary TURNS' timestamps only under
    that monotonicity."""
    if salt_chunk is not None:
        return _session_windows_salted(ds, key, ts, order, gap_us,
                                       salt_chunk, hot)

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order)
        t = g[ts].to_numpy().astype("datetime64[us]").astype(np.int64)
        new_session = np.zeros(len(t), dtype=np.int64)
        if len(t) > 1:
            new_session[1:] = (np.diff(t) > gap_us).astype(np.int64)
        sid = np.cumsum(new_session)
        out = []
        for s in np.unique(sid):
            m = sid == s
            out.append((g[key].iloc[0], int(s), int(m.sum()),
                        t[m].min(), t[m].max()))
        return pd.DataFrame(out, columns=[key, "session_idx", "n_turns",
                                          "start_us", "end_us"])

    return ds.groupby(key).map_groups(per_group, batch_format="pandas")


def _session_windows_salted(ds: Dataset, key: str, ts: str, order: str,
                            gap_us: int, salt_chunk: int,
                            hot: set | None) -> Dataset:
    """Two-level session windowing: local sessions per (key, order//chunk)
    → per-key boundary stitch (sessions whose inter-chunk gap ≤ gap_us
    merge; ``session_idx`` renumbered in order)."""
    chunk = max(1, int(salt_chunk))
    add_salt = _make_add_salt(key, order, chunk, hot)

    def local_sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order)
        t = g[ts].to_numpy().astype("datetime64[us]").astype(np.int64)
        if len(t) > 1 and (np.diff(t) < 0).any():
            # the stitch compares session BOUNDARY timestamps, which only
            # equal the boundary TURNS' timestamps when ts is monotone in
            # order — fail loudly instead of silently diverging from the
            # unsalted path
            raise ValueError(
                "session_windows(salt_chunk=...) requires ts non-decreasing "
                f"in {order!r} within each key; found out-of-order "
                f"timestamps for key {g[key].iloc[0]!r} — use "
                "salt_chunk=None for non-monotone data")
        brk = np.zeros(len(t), dtype=np.int64)
        if len(t) > 1:
            brk[1:] = (np.diff(t) > gap_us).astype(np.int64)
        sid = np.cumsum(brk)
        first_order = g[order].to_numpy()[0]
        rows = []
        for s in np.unique(sid):
            m = sid == s
            rows.append((g[key].iloc[0], int(first_order), int(s),
                         int(m.sum()), int(t[m].min()), int(t[m].max())))
        return pd.DataFrame(rows, columns=[key, "_chunk_order", "_local_sid",
                                           "n_turns", "start_us", "end_us"])

    def stitch(g: pd.DataFrame) -> pd.DataFrame:
        # sessions ordered by (chunk position, local idx); within a chunk
        # locals are already gap-split, so only adjacent-session
        # boundaries can merge
        g = g.sort_values(["_chunk_order", "_local_sid"])
        n = g["n_turns"].to_numpy()
        start = g["start_us"].to_numpy()
        end = g["end_us"].to_numpy()
        # PER-KEY monotonicity check: the local check only sees one chunk,
        # so a ts inversion that straddles a chunk boundary (or a key
        # whose chunks hold single rows) would pass it and silently
        # diverge from the unsalted path. Under monotone ts every
        # session's start is ≥ the previous session's end (a chunk's
        # first/last session boundaries ARE its first/last turn ts), so
        # any start[i] < end[i-1] proves an inversion.
        if len(g) > 1 and bool((start[1:] < end[:-1]).any()):
            raise ValueError(
                "session_windows(salt_chunk=...) requires ts non-decreasing "
                f"in order within each key; found out-of-order timestamps "
                f"across chunk boundaries for key {g[key].iloc[0]!r} — use "
                "salt_chunk=None for non-monotone data")
        out_n, out_s, out_e = [n[0]], [start[0]], [end[0]]
        for i in range(1, len(g)):
            if start[i] - out_e[-1] <= gap_us:
                out_n[-1] += n[i]
                out_s[-1] = min(out_s[-1], start[i])
                out_e[-1] = max(out_e[-1], end[i])
            else:
                out_n.append(n[i]); out_s.append(start[i]); out_e.append(end[i])
        return pd.DataFrame({
            key: [g[key].iloc[0]] * len(out_n),
            "session_idx": np.arange(len(out_n), dtype=np.int64),
            "n_turns": np.array(out_n, dtype=np.int64),
            "start_us": np.array(out_s, dtype=np.int64),
            "end_us": np.array(out_e, dtype=np.int64),
        })

    salted = ds.map_batches(add_salt, batch_format="pyarrow",
                            zero_copy_batch=True)
    locals_ = salted.groupby([key, "_salt"]).map_groups(
        local_sessions, batch_format="pandas")
    return locals_.groupby(key).map_groups(stitch, batch_format="pandas")


# ------------------------------------------------- rolling active users


def user_day_pairs_partial(*, user_col: str = "user_id",
                           ts_col: str = "ts", merge_shards: int = 64):
    """Per-batch reduction to DISTINCT (user, epoch-day) pairs sharded
    by ``hash(user) % merge_shards`` — THE user-activity partial shared
    by rolling_active_users and the cohort-retention query (both
    oracles mirror the same ``CAST(ts AS DATE)`` int64 epoch-day
    convention; a day-derivation or shard-convention fix belongs HERE,
    not at either call site). Null users/timestamps are excluded."""
    import polars as pl

    from ..functions.hashing import shard_series_i32

    def partial(batch: pa.Table) -> pa.Table:
        df = (pl.from_arrow(batch.select([user_col, ts_col]))
              .drop_nulls([user_col, ts_col]))
        part = (df.with_columns(
                    pl.col(ts_col).cast(pl.Date).cast(pl.Int64)
                    .alias("day"))
                .select([user_col, "day"]).unique())
        return part.with_columns(
            shard_series_i32(part, [user_col], merge_shards)).to_arrow()

    return partial


def wau_kernels(*, user_col: str = "user_id", ts_col: str = "ts",
                window_days: int = 7, merge_shards: int = 64):
    """(partial, final_shard) for the rolling-window active-user count
    (DAU/WAU/MAU — the calendar-window cousin of the event-time
    sessions above) — module-level so the
    split→partial→shard-group→merge composition is property-testable
    without a Ray session.

    ``partial`` reduces a batch to its DISTINCT (user, epoch-day) pairs
    (int64 days, the retention-query convention, so no timestamp
    formatting drifts vs SQL) sharded by ``hash(user) % merge_shards``;
    a user's pairs all land on one shard, so per-shard distinct counts
    sum EXACTLY across shards. ``final_shard`` re-distincts its pairs,
    expands each to the ``window_days`` report days it keeps the user
    active for (a cross join against the 0..w-1 offset column — tiny),
    and emits per-(report-day) distinct-user count partials. Report
    days with no activity of their own are filtered AFTER the merge
    (the result is calendar-bounded) against the days-present census.
    """
    import polars as pl

    partial = user_day_pairs_partial(
        user_col=user_col, ts_col=ts_col, merge_shards=merge_shards)

    offs = pl.DataFrame({"_off": pl.Series(
        range(window_days), dtype=pl.Int64)})

    def final_shard(g: pa.Table) -> pa.Table:
        df = (pl.from_arrow(g).drop("_shard")
              .unique([user_col, "day"]))
        e = df.join(offs, how="cross").with_columns(
            (pl.col("day") + pl.col("_off")).alias("report_day"))
        out = (e.unique([user_col, "report_day"])
               .group_by("report_day")
               .agg(pl.len().cast(pl.Int64).alias("wau"))
               .rename({"report_day": "day"}))
        return out.select(["day", "wau"]).to_arrow()

    return partial, final_shard


def rolling_active_users(ds: Dataset, *, user_col: str = "user_id",
                         ts_col: str = "ts", window_days: int = 7,
                         merge_shards: int = 64) -> Dataset:
    """(day, wau) per calendar day with any activity: the count of
    distinct users active in the trailing ``window_days``-day window
    [day - window_days + 1, day].

    Scale shape: only distinct (user, day) PAIRS shuffle — bounded by
    users × active days, far below event rows — in one
    ``hash(user) % merge_shards`` exchange; the pairs stream is
    materialized once for its two consumers (the day census and the
    shard merge). The days-present census is per-block distinct days
    (calendar-bounded at any corpus size) merged on the driver and the
    final filter streams over the tiny merged (day, wau) table.
    """
    import ray

    from .aggregate import grouped_sum

    partial, final_shard = wau_kernels(
        user_col=user_col, ts_col=ts_col, window_days=window_days,
        merge_shards=merge_shards)
    pairs = ds.map_batches(partial, batch_format="pyarrow").materialize()

    import pyarrow.compute as pc

    def day_partial(batch: pa.Table) -> pa.Table:
        return pa.table({"day": pc.unique(batch.column("day"))})

    day_chunks = [b.column("day").to_numpy(zero_copy_only=False)
                  for b in pairs.select_columns(["day"])
                  .map_batches(day_partial, batch_format="pyarrow")
                  .iter_batches(batch_format="pyarrow")]
    present = np.unique(np.concatenate(day_chunks)) if day_chunks \
        else np.zeros(0, np.int64)
    present_ref = ray.put(present)

    shard_counts = pairs.groupby("_shard").map_groups(
        final_shard, batch_format="pyarrow")
    merged = grouped_sum(shard_counts, ["day"], "wau", alias="wau")

    def keep_present(batch: pa.Table) -> pa.Table:
        days = ray.get(present_ref)
        mask = pa.array(np.isin(
            as_combined(batch["day"]).to_numpy(zero_copy_only=False),
            days))
        return batch.filter(mask)

    return merged.map_batches(keep_present, batch_format="pyarrow")
