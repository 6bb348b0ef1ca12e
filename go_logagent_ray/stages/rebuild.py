"""Conversation reconstruction: turns -> one row per conversation.

The north-star invariant (BASELINE.json ``input_hint``) is per-turn
TEXT EQUALITY under stable (conv_id, turn_idx) ordering. This stage
proves it at conversation granularity: each conversation's turns are
concatenated in turn order and digested with md5, so any reordering,
dropped turn, or single-byte text difference changes the digest. The
same operation is the first step of training-data assembly (turn
stream -> whole-conversation documents).

Scale: ONE groupby co-locates every turn of a conversation — on
``hash(conv_id) % merge_shards``, not the raw conv_id (one Ray group
per conversation drowns in per-group task overhead — the
throttle/minhash group-count lesson). Inside a shard the sort + join
is one vectorized polars group_by across ALL of the shard's
conversations; only the md5 digest runs per conversation (hashlib has
no vectorized form — the call count equals the old per-group shape,
with thousands of Ray tasks collapsed into merge_shards). A shard
holds ~corpus/merge_shards rows; size the shard count to the cluster.
Measured both ways at sf0.1 (~1.5k conversations): per-conv map_groups
is ~0.5 s faster there — too few groups for the overhead to bite —
while at 10^9 conversations the per-group Python frame construction
is the dominant cost; the sharded shape is the scale contract, and the
toy-scale delta sits inside the VM noise band. The digest is
order-sensitive and therefore NOT mergeable across chunks — this is
inherently a co-located-group operator, unlike the mergeable window
stats in stages/window.py.

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
                          sep: str = "\n",
                          merge_shards: int = 64) -> Dataset:
    """One row per conversation: (conv_id, n_turns:int64, n_chars:int64,
    text_md5:string) where text_md5 is md5 of the turn texts joined by
    ``sep`` in stable ``order_col`` order and n_chars is the joined
    length in code points (== DuckDB ``length(string_agg(...))``).

    Null-turn semantics mirror SQL ``string_agg``: null texts are
    skipped from the concatenation (no separator for them) while
    ``n_turns`` still counts every row; a conversation whose turns are
    ALL null gets null ``n_chars``/``text_md5`` (string_agg -> NULL).

    Only the (conv, order, text) columns are consumed — any other
    input column, including a pre-existing ``_shard``, is dropped,
    never clobbered. ``merge_shards`` is the scale knob (a shard holds
    ~corpus/merge_shards rows; shard-count invariance of the result is
    pinned by tests/test_shard_invariance.py)."""
    add_shard, per_shard = rebuild_kernels(
        conv_col=conv_col, order_col=order_col, text_col=text_col,
        sep=sep, merge_shards=merge_shards)
    parts = ds.map_batches(add_shard, batch_format="pyarrow")
    return parts.groupby("_shard").map_groups(per_shard,
                                              batch_format="pyarrow")


def rebuild_kernels(*, conv_col: str, order_col: str, text_col: str,
                    sep: str, merge_shards: int):
    """(add_shard, per_shard) for the conversation rebuild —
    module-level so the composition is property-testable without a Ray
    session (tests/test_sharded_properties.py)."""
    import polars as pl

    from ..functions.hashing import shard_series_i32

    def add_shard(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch.select([conv_col, order_col, text_col]))
        return df.with_columns(
            shard_series_i32(df, [conv_col], merge_shards)).to_arrow()

    def per_shard(g: pa.Table) -> pa.Table:
        # vectorized stable sort + per-conv join across the whole shard
        # (the multiline_join pattern) — no per-row Python; md5 runs
        # once per conversation on its single joined string. Cast
        # guards all-null blocks arriving as Null dtype; ignore_nulls
        # pinned so null turns join to '' (string_agg parity) with the
        # all-null case restored to NULL below. nulls_last pinned:
        # polars sorts nulls FIRST by default where numpy argsort and
        # DuckDB `ORDER BY` put them LAST — a null order key must not
        # move its text to the front of the digest.
        df = pl.from_arrow(g.select([conv_col, order_col, text_col])) \
            .with_columns(pl.col(text_col).cast(pl.Utf8)) \
            .sort([conv_col, order_col], nulls_last=True,
                  maintain_order=True)
        agg = (df.group_by(conv_col, maintain_order=True)
               .agg(pl.len().cast(pl.Int64).alias("n_turns"),
                    pl.col(text_col).str.join(sep, ignore_nulls=True)
                    .alias("_j"),
                    pl.col(text_col).is_not_null().any().alias("_p")))
        js = agg.get_column("_j").to_list()
        ps = agg.get_column("_p").to_list()
        md5s = [hashlib.md5(j.encode("utf-8")).hexdigest() if p else None
                for j, p in zip(js, ps)]
        n_chars = [len(j) if p else None for j, p in zip(js, ps)]
        return pa.table({
            conv_col: agg.get_column(conv_col).to_arrow(),
            "n_turns": agg.get_column("n_turns").to_arrow()
            .cast(pa.int64()),
            "n_chars": pa.array(n_chars, pa.int64()),
            "text_md5": pa.array(md5s, pa.string()),
        })

    return add_shard, per_shard
