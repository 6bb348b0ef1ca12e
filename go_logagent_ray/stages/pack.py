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
                   id_field: str = "doc_id") -> Dataset:
    """(doc_id, pack_group, bin_idx, tok) — bin assignment per doc."""
    if budget <= 0 or group_width <= 0:
        raise ValueError("budget and group_width must be positive")

    def toks(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch.select([id_field, text_field]))
        out = df.select(
            pl.col(id_field),
            (pl.col(id_field) // group_width).alias("pack_group"),
            pl.col(text_field).str.split(" ").list.len()
              .cast(pl.Int64).alias("tok"),
        )
        return out.to_arrow()

    compact = ds.map_batches(toks, batch_format="pyarrow")

    def pack(group: pa.Table) -> pa.Table:
        ids = group.column(id_field).to_numpy(zero_copy_only=False)
        tok = group.column("tok").to_numpy(zero_copy_only=False)
        grp = group.column("pack_group").to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")
        ids, tok, grp = ids[order], tok[order], grp[order]
        bin_idx = np.empty(len(ids), dtype=np.int64)
        cur_bin, cur_tok = 0, 0
        for i, t in enumerate(tok):  # bounded by group_width
            if i > 0 and cur_tok + t > budget:
                cur_bin += 1
                cur_tok = 0
            bin_idx[i] = cur_bin
            cur_tok += t
        return pa.table({id_field: ids, "pack_group": grp,
                         "bin_idx": bin_idx, "tok": tok})

    return compact.groupby("pack_group").map_groups(
        pack, batch_format="pyarrow")
