"""Event-sequence transition mining — the session-path rollup of log
analytics: order each entity's events in time and count corpus-wide
(from_state, to_state) transitions, i.e. the edge weights of the
first-order Markov chain over event types. The reference agent's
filter chain tags and routes single events; path analysis is the
cross-event complement every log-analytics stack grows (funnel and
retention queries are its cousins — both already in this repo).

Scale shape: per-entity ORDER is required, so unlike the count-style
stages this one must co-locate each entity's rows — ONE shuffle of the
four pruned columns (entity, order keys, state), sharded by
``hash(entity) % merge_shards`` rather than per-entity groups (the
multiline/throttle group-count discipline: Ray's groupby plans
per-distinct-key groups, and entity counts grow with the corpus while
merge_shards is the fixed cluster-sized knob). Within a shard the sort,
the per-entity lag, and the (from, to) count are each one vectorized
polars kernel; a shard emits at most n_states² count partials, and a
tiny grouped sum finishes across shards.

Null semantics: rows with a null entity, order key, or state are
excluded before sequencing (SQL window-function convention over
non-null keys — mirrored in the oracle's WHERE clause); the first event
of each entity has no predecessor and contributes no transition.
"""

from __future__ import annotations

import pyarrow as pa
from ray.data import Dataset


def transition_kernels(*, entity_col: str = "user_id",
                       order_cols: tuple[str, ...] = ("ts", "event_id"),
                       state_col: str = "event_type",
                       merge_shards: int = 64):
    """(partial, final_shard) — module-level so the
    split→partial→shard-group→merge composition is property-testable
    without a Ray session (tests/test_sharded_properties.py pattern).

    ``partial`` only prunes, null-filters, and tags the shard — it must
    NOT pre-aggregate (order across batches matters), so the shuffle
    moves rows, bounded by the 4-column projection."""
    import polars as pl

    from ..functions.hashing import shard_series_i32

    cols = [entity_col, *order_cols, state_col]

    def partial(batch: pa.Table) -> pa.Table:
        # cast guards all-null blocks arriving as Null dtype; nulls in
        # any sequencing column are excluded on both sides
        df = (pl.from_arrow(batch.select(cols))
              .with_columns(pl.col(state_col).cast(pl.Utf8))
              .drop_nulls(cols))
        return df.with_columns(
            shard_series_i32(df, [entity_col], merge_shards)).to_arrow()

    def final_shard(g: pa.Table) -> pa.Table:
        df = (pl.from_arrow(g).drop("_shard")
              .sort([entity_col, *order_cols]))
        df = df.with_columns(
            pl.col(state_col).shift(1).over(entity_col)
            .alias("from_type"))
        out = (df.drop_nulls("from_type")
               .group_by(["from_type", state_col])
               .agg(pl.len().cast(pl.Int64).alias("n"))
               .rename({state_col: "to_type"}))
        return out.select(["from_type", "to_type", "n"]).to_arrow()

    return partial, final_shard


def transition_counts(ds: Dataset, *, entity_col: str = "user_id",
                      order_cols: tuple[str, ...] = ("ts", "event_id"),
                      state_col: str = "event_type",
                      merge_shards: int = 64) -> Dataset:
    """One row per observed state transition: (from_type, to_type, n).

    ``order_cols`` must be a TOTAL order within an entity (pass a
    unique tiebreaker last) or tied rows make the lag nondeterministic
    between runs and vs the SQL oracle. ``merge_shards`` is the scale
    knob; shard-count invariance is pinned by tests."""
    from .aggregate import grouped_sum

    partial, final_shard = transition_kernels(
        entity_col=entity_col, order_cols=order_cols,
        state_col=state_col, merge_shards=merge_shards)
    parts = ds.map_batches(partial, batch_format="pyarrow")
    shard_counts = parts.groupby("_shard").map_groups(
        final_shard, batch_format="pyarrow")
    # transitions of one (from, to) pair occur across many entities and
    # therefore shards — a tiny grouped sum (≤ n_states² rows per
    # shard) finishes exactly
    return grouped_sum(shard_counts, ["from_type", "to_type"], "n",
                       alias="n")
