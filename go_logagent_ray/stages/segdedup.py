"""Segment-level exact dedup: drop REPEATED fixed-size word windows
corpus-wide, keeping each distinct segment's first occurrence and
rebuilding every document from its surviving segments.

The aligned-window analog of exact substring deduplication (Lee et al.,
"Deduplicating Training Data Makes Language Models Better" — public
method; our granularity is non-overlapping k-word windows instead of
suffix-array substrings, which keeps the operator a pure two-pass
streaming shape). Not in the reference (tuhuayuan/go-logagent has no
corpus-level text ops); first-class per the training-data mandate.

ALIGNMENT BLINDSPOT of ``mode="aligned"`` (the fixed grid): a shifted
duplicate escapes detection entirely — insert ONE word at the front of
a copied document and every k-word window of the copy starts one word
later, so no window text repeats and nothing dedups. That is
out-of-contract for the aligned mode by definition (it dedups repeated
ALIGNED windows, exactly what its SQL oracle states), and
``tests/test_segdedup.py`` pins the blindspot with a planted
one-word-prefix duplicate. ``mode="cdc"`` closes it: chunk boundaries
are CONTENT-DEFINED (a chunk ends after any word whose hash ≡ 0 mod
avg_size — ``stages/chunk.py::cdc_chunk_fn``), so boundaries
re-synchronize one anchor after any insertion/deletion and all later
chunks of a shifted duplicate dedup again. Same two-pass shape, same
keeper/broadcast/scrub machinery, same oracle checkability (md5 anchor
mode). Remaining gap vs suffix arrays in BOTH modes: sub-chunk repeats
(shorter than one window/chunk) are not deduplicated.

Scale shape (mirrors ``dedup.exact_dedup_broadcast``):

- pass 1: explode each batch into segments IN PLACE, reduce to
  (segment-hash, min packed (doc_id, seg_idx)) partials inside
  ``map_batches`` (Arrow hash-agg) → one small ``groupby`` over
  partials. Only (hash, packed-position) pairs ever shuffle; full text
  never moves.
- broadcast: the keeper table is collected as two int64 numpy arrays
  (16 bytes per distinct segment — never Python row-dicts) and
  ``ray.put`` once. Regime: fits to ~500 M distinct segments (~8 GB);
  past that, partition segments by hash and keep per-partition keeper
  maps instead of one broadcast.
- pass 2: re-explode each batch, vectorized sorted-membership test
  against the broadcast keepers, rebuild each doc's text from kept
  segments WITHIN the batch (polars group_by) — documents never
  shuffle at all.

Identity is EXACT segment-text equality via a 64-bit polars hash
(collision odds ~n²/2⁶⁵ — negligible below ~10⁹ distinct segments and
the SQL oracle would catch one at test scale). Positions pack as
``doc_id * MAX_SEGS + seg_idx`` so "first occurrence" is the
lexicographic (doc_id, seg_idx) minimum in one int64 Min aggregate;
docs with ≥ MAX_SEGS segments, negative ids, or ids ≥ 2^63/MAX_SEGS
(which would wrap the packing) fail loudly.

PRECONDITION: ``id_field`` is unique corpus-wide (it names a segment's
position, so a repeated id makes two distinct occurrences
indistinguishable and the output emits one row per (id, batch)).
Same-batch violations fail loudly; CROSS-batch duplicates are
undetectable without a global pass — run an id distinct-count (or
``exact_dedup_broadcast``) first if ids are untrusted.
"""

from __future__ import annotations

import numpy as np
import polars as pl
import pyarrow as pa
from ray.data import Dataset
from ray.data.aggregate import Min

from .chunk import chunk_batch_fn

SEG_SIZE = 20
MAX_SEGS = 1 << 20


def _packed_segments(batch: pa.Table, explode, id_field: str):
    """Explode one batch into segments; return (segs, fp, pk) where fp
    is the segment-text hash and pk the packed (doc_id, seg_idx)."""
    from ..functions.hashing import stable_hash64_i64

    if batch.num_rows:
        bids = batch[id_field].to_numpy(zero_copy_only=False)
        if bids.size != np.unique(bids).size:
            raise ValueError(
                "segment_dedup requires unique ids (they define segment "
                "positions); duplicate id in batch — dedup rows first "
                "(e.g. exact_dedup_broadcast)")
    segs = explode(batch)
    if segs.num_rows == 0:
        e = np.zeros(0, np.int64)
        return segs, e, e
    ids = segs[id_field].to_numpy()
    idx = segs["chunk_idx"].to_numpy()
    if ids.size and int(ids.min()) < 0:
        raise ValueError("segment_dedup requires non-negative ids "
                         "(positions pack as id * MAX_SEGS + seg_idx)")
    if ids.size and int(ids.max()) >= (1 << 63) // MAX_SEGS:
        raise ValueError(
            f"id {int(ids.max())} ≥ 2^63/MAX_SEGS: the packed position "
            "would silently wrap int64 and corrupt first-occurrence "
            "ordering; renumber ids below 2^43 or shrink MAX_SEGS")
    if idx.size and int(idx.max()) >= MAX_SEGS:
        raise ValueError(
            f"document has ≥ {MAX_SEGS} segments; raise MAX_SEGS "
            "(and re-check the int64 packing headroom) for such inputs")
    pk = ids.astype(np.int64) * MAX_SEGS + idx.astype(np.int64)
    return segs, stable_hash64_i64(segs["chunk_text"]), pk


def _make_explode(mode: str, size: int, text_field: str, id_field: str,
                  token_hash: str):
    if mode == "aligned":
        return chunk_batch_fn(size=size, stride=size,
                              text_field=text_field, id_field=id_field)
    if mode == "cdc":
        from .chunk import cdc_chunk_fn

        return cdc_chunk_fn(avg_size=size, text_field=text_field,
                            id_field=id_field, token_hash=token_hash)
    raise ValueError(f"unknown segment_dedup mode {mode!r}")


def segment_keepers(ds: Dataset, *, size: int = SEG_SIZE,
                    text_field: str = "text",
                    id_field: str = "doc_id",
                    mode: str = "aligned",
                    token_hash: str = "polars") -> Dataset:
    """(_fp, _pk): per distinct segment text, the packed position of its
    first occurrence. Only these 16-byte pairs shuffle."""
    explode = _make_explode(mode, size, text_field, id_field, token_hash)

    def partial(batch: pa.Table) -> pa.Table:
        segs, fp, pk = _packed_segments(batch, explode, id_field)
        t = pa.table({"_fp": pa.array(fp, pa.int64()),
                      "_pk": pa.array(pk, pa.int64())})
        p = t.group_by(["_fp"]).aggregate([("_pk", "min")])
        # select by name — pyarrow aggregate column order is not stable
        # across releases
        return p.select(["_fp", "_pk_min"]).rename_columns(["_fp", "_pk"])

    parts = ds.map_batches(partial, batch_format="pyarrow")
    return parts.groupby("_fp").aggregate(Min("_pk", alias_name="_pk"))


def segment_dedup(ds: Dataset, *, size: int = SEG_SIZE,
                  text_field: str = "text",
                  id_field: str = "doc_id",
                  mode: str = "aligned",
                  token_hash: str = "polars") -> Dataset:
    """One row per non-null-text document: (id, text rebuilt from
    surviving segments joined by ' ', n_segs, n_kept). A segment
    occurrence survives iff it IS the corpus-wide first occurrence of
    its exact text (so every distinct segment text appears exactly once
    across the whole output corpus).

    ``mode="aligned"`` segments on the fixed k-word grid (alignment
    blindspot — see module docstring); ``mode="cdc"`` uses
    content-defined boundaries (shift-robust; ``size`` becomes the
    EXPECTED chunk length). ``token_hash`` selects the CDC anchor hash
    ("polars" production / "md5" oracle-parity)."""
    import ray

    fp_parts: list[np.ndarray] = []
    pk_parts: list[np.ndarray] = []
    for b in segment_keepers(ds, size=size, text_field=text_field,
                             id_field=id_field, mode=mode,
                             token_hash=token_hash) \
            .iter_batches(batch_format="pyarrow"):
        fp_parts.append(b.column("_fp").to_numpy(zero_copy_only=False))
        pk_parts.append(b.column("_pk").to_numpy(zero_copy_only=False))
    fp_all = np.concatenate(fp_parts) if fp_parts else np.zeros(0, np.int64)
    pk_all = np.concatenate(pk_parts) if pk_parts else np.zeros(0, np.int64)
    order = np.argsort(fp_all, kind="stable")
    ref = ray.put((fp_all[order], pk_all[order]))

    explode = _make_explode(mode, size, text_field, id_field, token_hash)

    def scrub(batch: pa.Table) -> pa.Table:
        fp_sorted, pk_sorted = ray.get(ref)
        segs, fp, pk = _packed_segments(batch, explode, id_field)
        if segs.num_rows == 0:
            return pa.table({id_field: pa.array([], pa.int64()),
                             text_field: pa.array([], pa.string()),
                             "n_segs": pa.array([], pa.int64()),
                             "n_kept": pa.array([], pa.int64())})
        pos = np.searchsorted(fp_sorted, fp).clip(max=max(len(fp_sorted) - 1, 0))
        keep = (fp_sorted[pos] == fp) & (pk_sorted[pos] == pk) \
            if len(fp_sorted) else np.zeros(len(fp), dtype=bool)
        df = pl.DataFrame({
            id_field: segs[id_field].to_numpy(),
            "_si": segs["chunk_idx"].to_numpy(),
            "_st": pl.from_arrow(segs["chunk_text"]),
            "_keep": keep,
        })
        tot = df.group_by(id_field).agg(pl.len().alias("n_segs"))
        agg = (df.filter(pl.col("_keep"))
               .group_by(id_field)
               .agg(pl.col("_st").sort_by("_si").alias("_l"),
                    pl.len().alias("n_kept"))
               .with_columns(pl.col("_l").list.join(" ").alias(text_field))
               .select([id_field, text_field, "n_kept"]))
        out = (tot.join(agg, on=id_field, how="left")
               .with_columns(pl.col(text_field).fill_null(""),
                             pl.col("n_kept").fill_null(0))
               .select([id_field, text_field, "n_segs", "n_kept"])
               .with_columns(pl.col("n_segs").cast(pl.Int64),
                             pl.col("n_kept").cast(pl.Int64)))
        return out.to_arrow()

    return ds.map_batches(scrub, batch_format="pyarrow")
