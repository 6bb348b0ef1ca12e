"""Document chunking: explode each document into fixed-size word
windows (size W, stride S) — the preprocessing step that turns raw
documents into training-sequence-sized pieces.

Not in the reference; first-class per the training-data mandate.

Scale shape: a pure per-batch flat-map — no shuffle, no state.  The
only loop is over the chunk INDEX (bounded by max_words / stride); each
iteration is a polars list-slice + join over the whole batch, so work
is vectorized across documents.  Output rows are (doc_id, chunk_idx,
n_words, chunk_text); a 100 TB corpus streams through with row-count
amplification ~len/stride and no driver involvement.
"""

from __future__ import annotations

import numpy as np
import polars as pl
import pyarrow as pa
from ray.data import Dataset

CHUNK_SIZE = 32
CHUNK_STRIDE = 24


def _out_schema(batch: pa.Table, id_field: str) -> pa.Schema:
    """Canonical explode output schema. Every branch of every chunker
    casts to THIS, because the branches otherwise disagree on string
    width: polars ``to_arrow`` emits large_string while hand-built
    empty/loop tables emit string — Ray 2.49 then sees blocks with
    different schemas and strict block concatenation fails.
    chunk_text canonicalizes UP to large_string: the polars branches'
    cast becomes a no-op, and a down-cast could overflow 32-bit
    offsets on a batch holding > 2 GiB of exploded chunk text."""
    return pa.schema([(id_field, batch.schema.field(id_field).type),
                      ("chunk_idx", pa.int64()),
                      ("n_words", pa.int64()),
                      ("chunk_text", pa.large_string())])


def chunk_batch_fn(*, size: int = CHUNK_SIZE, stride: int = CHUNK_STRIDE,
                   text_field: str = "text", id_field: str = "doc_id"):
    """The per-batch explode as a standalone callable — used by
    ``chunk_documents`` and registrable in config filter chains."""
    if stride <= 0 or size <= 0:
        raise ValueError("size and stride must be positive")

    def explode(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch.select([id_field, text_field]))
        # null text emits NO chunks — matching the SQL oracle, where
        # string_split(NULL) → NULL → unnest(range(NULL)) is zero rows;
        # without the filter a null list.len() becomes NaN and
        # int(NaN) kills the whole map task.  The cast guards all-null
        # blocks whose column arrives as Null dtype (no str namespace).
        df = df.with_columns(pl.col(text_field).cast(pl.Utf8))
        df = df.filter(pl.col(text_field).is_not_null())
        df = df.with_columns(
            pl.col(text_field).str.split(" ").alias("_w"))
        df = df.with_columns(pl.col("_w").list.len().alias("_n"))
        if stride == size and len(df) and \
                int(df["_n"].max()) > 16 * size:
            # Deep batch of non-overlapping windows: one token explode +
            # window cum-count + group_by is O(tokens) — the loop below
            # re-scans the batch once per chunk INDEX, so a 10k-word doc
            # would force ~500 passes. For shallow batches (few chunks
            # per doc, the common short-document case) the loop's 3-4
            # cheap passes beat the explode's token-row blowup —
            # measured both ways at sf0.1; crossover ~16 chunks.
            # empty_as_null pinned: the polars default flips in 2.0,
            # and a null token row would poison the cum-count below
            # (unreachable today — str.split never yields [] — but the
            # semantics must not depend on a changing default)
            tok = (df.select([id_field, "_w"]).with_row_index("_r")
                   .explode("_w", empty_as_null=False))
            tok = tok.with_columns(
                ((pl.col("_w").cum_count().over("_r") - 1) // size)
                .cast(pl.Int64).alias("chunk_idx"))
            seg = (tok.group_by(["_r", "chunk_idx"], maintain_order=True)
                   .agg(pl.col(id_field).first(),
                        pl.len().cast(pl.Int64).alias("n_words"),
                        pl.col("_w").str.join(" ").alias("chunk_text")))
            return seg.select([id_field, "chunk_idx", "n_words",
                               "chunk_text"]).to_arrow() \
                .cast(_out_schema(batch, id_field))
        n = df["_n"].to_numpy()
        if len(n) == 0:
            return _out_schema(batch, id_field).empty_table()
        max_chunks = int((n.max() - 1) // stride + 1)
        ids_out, idx_out, nw_out, txt_out = [], [], [], []
        for k in range(max_chunks):
            sel = n > k * stride
            if not sel.any():
                break
            sub = df.filter(pl.Series(sel))
            piece = sub.select(
                pl.col(id_field),
                pl.col("_w").list.slice(k * stride, size).alias("_c"),
            ).with_columns(
                pl.col("_c").list.len().alias("_cn"),
                pl.col("_c").list.join(" ").alias("_ct"),
            )
            ids_out.append(piece[id_field].to_numpy())
            idx_out.append(np.full(len(piece), k, dtype=np.int64))
            nw_out.append(piece["_cn"].to_numpy().astype(np.int64))
            txt_out.append(piece["_ct"])
        return pa.table({
            id_field: np.concatenate(ids_out),
            "chunk_idx": np.concatenate(idx_out),
            "n_words": np.concatenate(nw_out),
            "chunk_text": pl.concat(txt_out).to_arrow(),
        }).cast(_out_schema(batch, id_field))

    return explode


def cdc_chunk_fn(*, avg_size: int = 20, text_field: str = "text",
                 id_field: str = "doc_id", token_hash: str = "polars"):
    """Content-defined chunking (CDC) explode: a chunk ends AFTER any
    word whose 64-bit hash ≡ 0 (mod ``avg_size``) — expected chunk
    length ``avg_size`` words, boundaries determined by LOCAL content
    only (the Rabin/anchor technique from dedup storage systems).

    Why it exists: fixed-grid windows are alignment-blind — insert one
    word at the front of a duplicated document and every k-word window
    shifts, so no window text repeats. CDC boundaries re-synchronize
    one anchor after any insertion/deletion, so all later chunks of a
    shifted duplicate hash identically again.

    ``token_hash="polars"`` is the production mode (vectorized);
    ``"md5"`` anchors on DuckDB's ``md5_number_lower`` so a SQL oracle
    can recompute identical boundaries (md5 runs per UNIQUE word —
    oracle-parity mode, same trade as ``dedup._tokenize_hashes_md5``).
    Output schema matches ``chunk_batch_fn``: (id, chunk_idx, n_words,
    chunk_text); null text emits nothing; pure per-batch flat-map, no
    shuffle, no state."""
    if avg_size <= 0:
        raise ValueError("avg_size must be positive")
    if token_hash not in ("polars", "md5"):
        raise ValueError(f"unknown token_hash {token_hash!r}")

    def explode(batch: pa.Table) -> pa.Table:
        from ..functions.hashing import stable_hash64

        df = pl.from_arrow(batch.select([id_field, text_field]))
        df = df.with_columns(pl.col(text_field).cast(pl.Utf8))
        df = df.filter(pl.col(text_field).is_not_null())
        if len(df) == 0:
            return _out_schema(batch, id_field).empty_table()
        tok = (df.with_row_index("_r")
               .select(["_r", id_field,
                        pl.col(text_field).str.split(" ").alias("_w")])
               .explode("_w", empty_as_null=False))
        if token_hash == "polars":
            h = stable_hash64(tok["_w"])
        else:
            from ..functions.hashing import md5_number_lower

            h = md5_number_lower(tok["_w"].to_numpy())
        anchor = ((h % np.uint64(avg_size)) == 0).astype(np.int64)
        # a word belongs to chunk = #anchors strictly BEFORE it in the
        # doc (the anchor word ends its own chunk): cum_sum minus self
        tok = tok.with_columns(pl.Series("_a", anchor)) \
            .with_columns((pl.col("_a").cum_sum().over("_r")
                           - pl.col("_a")).cast(pl.Int64)
                          .alias("chunk_idx"))
        seg = (tok.group_by(["_r", "chunk_idx"], maintain_order=True)
               .agg(pl.col(id_field).first(),
                    pl.len().cast(pl.Int64).alias("n_words"),
                    pl.col("_w").str.join(" ").alias("chunk_text")))
        return seg.select([id_field, "chunk_idx", "n_words",
                           "chunk_text"]).to_arrow() \
            .cast(_out_schema(batch, id_field))

    return explode


def chunk_documents(ds: Dataset, *, size: int = CHUNK_SIZE,
                    stride: int = CHUNK_STRIDE, text_field: str = "text",
                    id_field: str = "doc_id") -> Dataset:
    """Explode docs into word windows: chunk k covers words
    [k*stride, k*stride + size) (0-based), for k while k*stride <
    n_words.  Every non-null document emits at least one chunk; with
    stride < size the trailing chunks overlap and the last may be
    short; null text emits nothing."""
    fn = chunk_batch_fn(size=size, stride=stride, text_field=text_field,
                        id_field=id_field)
    return ds.map_batches(fn, batch_format="pyarrow")
