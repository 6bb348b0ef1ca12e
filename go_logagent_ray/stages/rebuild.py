"""Conversation reconstruction: turns -> one row per conversation.

The north-star invariant (BASELINE.json ``input_hint``) is per-turn
TEXT EQUALITY under stable (conv_id, turn_idx) ordering. This stage
proves it at conversation granularity: each conversation's turns are
concatenated in turn order and digested with md5, so any reordering,
dropped turn, or single-byte text difference changes the digest. The
same operation is the first step of training-data assembly (turn
stream -> whole-conversation documents).

Scale: one ``groupby(conv_id).map_groups`` task per conversation.
Per-group memory is bounded by the conversation's own length (a
conversation must fit in one context anyway), so skew across
conversations affects task balance only, never memory; consult the
top-k hot-key census (stages/partition.py) upstream if a pathological
conversation dominates. The digest is order-sensitive and therefore
NOT mergeable across chunks - this is inherently a co-located-group
operator, unlike the mergeable window stats in stages/window.py.

Reference parity: go-logagent keeps no cross-event state, so this has
no reference analog [U]; it exists for the transcript-assembly side of
the north star.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

from ray.data import Dataset


def rebuild_conversations(ds: Dataset, *, conv_col: str = "conv_id",
                          order_col: str = "turn_idx",
                          text_col: str = "text",
                          sep: str = "\n") -> Dataset:
    """One row per conversation: (conv_id, n_turns:int64, n_chars:int64,
    text_md5:string) where text_md5 is md5 of the turn texts joined by
    ``sep`` in stable ``order_col`` order and n_chars is the joined
    length in code points (== DuckDB ``length(string_agg(...))``).

    Null-turn semantics mirror SQL ``string_agg``: null texts are
    skipped from the concatenation (no separator for them) while
    ``n_turns`` still counts every row; a conversation whose turns are
    ALL null gets null ``n_chars``/``text_md5`` (string_agg -> NULL)."""

    def one(group: pa.Table) -> pa.Table:
        import polars as pl

        # vectorized stable sort + join (the multiline_join pattern) —
        # no per-row Python; md5 runs ONCE on the single joined string.
        # Cast guards all-null blocks arriving as Null dtype;
        # ignore_nulls pinned so null turns join to '' (string_agg
        # parity) with the all-null case restored to NULL below.
        # nulls_last pinned: polars sorts nulls FIRST by default where
        # numpy argsort and DuckDB `ORDER BY` put them LAST — a null
        # order key must not move its text to the front of the digest.
        df = pl.from_arrow(group.select([order_col, text_col])) \
            .with_columns(pl.col(text_col).cast(pl.Utf8)) \
            .sort(order_col, nulls_last=True, maintain_order=True)
        agg = df.select(
            pl.col(text_col).str.join(sep, ignore_nulls=True).alias("_j"),
            pl.col(text_col).is_not_null().any().alias("_p"))
        if bool(agg["_p"][0]):
            joined = agg["_j"][0]
            n_chars, md5 = len(joined), hashlib.md5(
                joined.encode("utf-8")).hexdigest()
        else:
            n_chars, md5 = None, None
        return pa.table({
            conv_col: group.column(conv_col).slice(0, 1),
            "n_turns": pa.array([group.num_rows], pa.int64()),
            "n_chars": pa.array([n_chars], pa.int64()),
            "text_md5": pa.array([md5], pa.string()),
        })

    return ds.groupby(conv_col).map_groups(one, batch_format="pyarrow")
