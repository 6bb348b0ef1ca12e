"""Sequence packing: greedily pack documents into token-budget bins —
the step that turns variable-length documents into fixed-budget
training sequences (padding waste ∝ leftover budget).

Greedy packing is inherently sequential, so a distributed version must
bound the sequential span.  Contract: packing runs independently inside
fixed-width doc_id ranges (``pack_group = doc_id // group_width``);
within a group, docs are taken in doc_id order and a new bin starts
whenever adding the next doc would exceed ``budget`` (a bin always
accepts at least one doc, so oversized docs get a bin of their own).
Bins never cross groups — that is the documented partitioning
assumption, and what makes the operator scale: each group is at most
``group_width`` rows.

Scale shape: token counts are computed per batch FIRST (vectorized
polars split-len) and the text column is dropped, so the groupby
shuffles only compact (doc_id, group, tok) rows; the per-group Python
loop is bounded by ``group_width``.
"""

from __future__ import annotations

import numpy as np
import polars as pl
import pyarrow as pa
from ray.data import Dataset

PACK_BUDGET = 256
PACK_GROUP_WIDTH = 64


def pack_documents(ds: Dataset, *, budget: int = PACK_BUDGET,
                   group_width: int = PACK_GROUP_WIDTH,
                   text_field: str = "text",
                   id_field: str = "doc_id",
                   merge_shards: int = 64) -> Dataset:
    """(doc_id, pack_group, bin_idx, tok) — bin assignment per doc.

    The co-locating groupby runs on ``hash(pack_group) % merge_shards``,
    not the raw pack_group: a 10^12-doc corpus has ~10^10 width-64
    groups, and Ray's per-group overhead would dominate (the
    throttle/minhash group-count lesson). The sequential packing loop
    runs over the shard's rows with a reset at every group boundary —
    same total row count, bins still never cross groups. A merge shard
    holds ~corpus/merge_shards compact (id, group, tok) rows — 24 B
    each, no text — so ``merge_shards`` is the scale knob: size it so
    one shard fits a worker's heap (shard-count invariance of the
    result is pinned by tests/test_shard_invariance.py). Only the
    (id, text) columns are consumed, so an input ``_shard`` column is
    dropped, never clobbered."""
    toks, pack = pack_kernels(budget=budget, group_width=group_width,
                              text_field=text_field, id_field=id_field,
                              merge_shards=merge_shards)
    compact = ds.map_batches(toks, batch_format="pyarrow")
    return compact.groupby("_shard").map_groups(
        pack, batch_format="pyarrow")


def pack_kernels(*, budget: int, group_width: int, text_field: str,
                 id_field: str, merge_shards: int):
    """(toks, pack) — module-level so the composition is
    property-testable without a Ray session
    (tests/test_sharded_properties.py)."""
    if budget <= 0 or group_width <= 0:
        raise ValueError("budget and group_width must be positive")
    n_shards = np.uint64(max(1, int(merge_shards)))

    def toks(batch: pa.Table) -> pa.Table:
        from ..functions.hashing import mix_shard_i64

        df = pl.from_arrow(batch.select([id_field, text_field]))
        out = df.select(
            pl.col(id_field),
            (pl.col(id_field) // group_width).alias("pack_group"),
            pl.col(text_field).str.split(" ").list.len()
              .cast(pl.Int64).alias("tok"),
        )
        grp = out.get_column("pack_group").to_numpy()
        return out.with_columns(pl.Series(
            "_shard", mix_shard_i64(grp, int(n_shards)))).to_arrow()

    def pack(shard: pa.Table) -> pa.Table:
        ids = shard.column(id_field).to_numpy(zero_copy_only=False)
        tok = shard.column("tok").to_numpy(zero_copy_only=False)
        grp = shard.column("pack_group").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, grp))  # group-major, doc order within
        ids, tok, grp = ids[order], tok[order], grp[order]
        bin_idx = np.empty(len(ids), dtype=np.int64)
        cur_bin, cur_tok = 0, 0
        for i, t in enumerate(tok):
            if i > 0 and grp[i] != grp[i - 1]:
                cur_bin, cur_tok = 0, 0  # bins never cross groups
            elif i > 0 and cur_tok + t > budget:
                cur_bin += 1
                cur_tok = 0
            bin_idx[i] = cur_bin
            cur_tok += t
        return pa.table({id_field: ids, "pack_group": grp,
                         "bin_idx": bin_idx, "tok": tok})

    return toks, pack
