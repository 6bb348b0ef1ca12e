"""Benchmark decontamination for training corpora.

Removes (or flags) documents that contain any n-gram from a benchmark
blocklist — the standard guard against test-set leakage when assembling
LLM training data.  Not in the reference (a log agent has no notion of
eval contamination); first-class here per the training-data mandate.

Scale shape:
- The blocklist is benchmark-sized (10^3–10^5 grams), NOT corpus-sized:
  it is collected once on the driver, deduplicated, and broadcast with
  ``ray.put`` — every map task reads the same object-store copy, nothing
  is re-shipped per batch.
- Matching is a per-batch vectorized pass: one
  ``pyarrow.compute.match_substring`` sweep per gram over the whole text
  column (K vectorized kernels, no Python row loop).  For K beyond a
  few thousand, swap the loop for an Aho-Corasick automaton built once
  per actor in ``__init__`` — the plumbing (broadcast ref + actor-pool
  stage) stays identical.
- Output is one compact (doc_id, n_hits) row per document; the corpus
  text never shuffles.

The synthetic "benchmark" used by the query is derived deterministically
from the corpus itself (first 8-word gram of every doc_id % 97 == 0
document), so the SQL oracle can rebuild the identical blocklist.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data import Dataset

BENCH_MOD = 97
BENCH_NGRAM = 8


def build_benchmark_grams(ds: Dataset, *, text_field: str = "text",
                          id_field: str = "doc_id",
                          mod: int = BENCH_MOD,
                          n: int = BENCH_NGRAM) -> list[str]:
    """Deterministic stand-in benchmark: the first ``n``-word gram of
    every document whose id is divisible by ``mod`` (docs with fewer
    than ``n`` words contribute nothing).  Returns sorted unique grams.

    The filter runs distributed; only the tiny selected gram set reaches
    the driver.
    """

    def first_gram(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_field).to_numpy(zero_copy_only=False)
        keep = ids % mod == 0
        if not keep.any():
            return pa.table({"gram": pa.array([], pa.string())})
        texts = batch.column(text_field).take(
            pa.array(np.nonzero(keep)[0])).to_pylist()
        grams = []
        for t in texts:
            words = (t or "").split(" ")
            if len(words) >= n:
                grams.append(" ".join(words[:n]))
        return pa.table({"gram": pa.array(grams, pa.string())})

    rows = ds.map_batches(first_gram, batch_format="pyarrow").take_all()
    return sorted({r["gram"] for r in rows})


class DecontaminateStage:
    """Actor-pool stage: count blocklist grams contained in each doc.

    ``grams_ref`` is a ``ray.put`` handle to the gram list — resolved
    once per actor in ``__init__``, never per batch.
    """

    def __init__(self, grams_ref, *, text_field: str = "text",
                 id_field: str = "doc_id"):
        self.grams = ray.get(grams_ref) if isinstance(
            grams_ref, ray.ObjectRef) else list(grams_ref)
        self.text_field = text_field
        self.id_field = id_field

    def __call__(self, batch: pa.Table) -> pa.Table:
        # cast guards all-null blocks (null TYPE lacks string kernels);
        # null text counts as 0 hits on both sides
        texts = pc.cast(batch.column(self.text_field), pa.string())
        hits = np.zeros(len(batch), dtype=np.int64)
        for g in self.grams:
            m = pc.fill_null(pc.match_substring(texts, g), False)
            hits += m.to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            self.id_field: batch.column(self.id_field),
            "n_hits": pa.array(hits, pa.int64()),
        })


def decontaminate(ds: Dataset, *, text_field: str = "text",
                  id_field: str = "doc_id", mod: int = BENCH_MOD,
                  n: int = BENCH_NGRAM, concurrency: int = 2) -> Dataset:
    """(doc_id, n_hits) for every doc; n_hits = number of distinct
    benchmark grams the doc contains (0 = clean)."""
    grams = build_benchmark_grams(ds, text_field=text_field,
                                  id_field=id_field, mod=mod, n=n)
    grams_ref = ray.put(grams)
    return ds.map_batches(
        DecontaminateStage,
        fn_constructor_kwargs=dict(grams_ref=grams_ref,
                                   text_field=text_field,
                                   id_field=id_field),
        batch_format="pyarrow", batch_size=1024, concurrency=concurrency)


class ContaminationOverlapStage:
    """Actor-pool stage: per-document n-gram OVERLAP against the
    benchmark set — the GPT-3-appendix-C contamination measure
    (fraction of a doc's n-grams that appear in any eval set), as
    opposed to ``DecontaminateStage``'s binary substring-hit count.

    Per batch, fully vectorized and shuffle-free: tokenize → explode →
    rolling n-grams via n shifted columns ``over`` the doc id (one
    polars kernel each, never a per-row loop) → distinct-gram counts
    per doc, membership decided by a left join against the broadcast
    bench-gram frame (exact string equality — no hash, so no collision
    caveat vs the SQL oracle). A document is one row, so the whole
    measure needs no shuffle; the bench set is benchmark-sized and
    rides ``ray.put`` once.
    """

    def __init__(self, grams_ref, *, n: int = BENCH_NGRAM,
                 text_field: str = "text", id_field: str = "doc_id"):
        import polars as pl

        grams = ray.get(grams_ref) if isinstance(
            grams_ref, ray.ObjectRef) else list(grams_ref)
        self.bench = pl.DataFrame({
            "_gram": pl.Series(grams, dtype=pl.Utf8),
        }).unique().with_columns(pl.lit(True).alias("_hit"))
        self.n = int(n)
        self.text_field = text_field
        self.id_field = id_field

    def __call__(self, batch: pa.Table) -> pa.Table:
        import polars as pl

        df = (pl.from_arrow(batch.select([self.id_field, self.text_field]))
              .with_columns(pl.col(self.text_field).cast(pl.Utf8))
              .filter(pl.col(self.text_field).is_not_null()))
        ids = df.select(self.id_field)
        e = (df.with_columns(
                 pl.col(self.text_field).str.split(" ").alias("_toks"))
             .select([self.id_field, "_toks"]).explode("_toks"))
        e = e.with_columns(pl.concat_str(
            [pl.col("_toks").shift(-i).over(self.id_field)
             for i in range(self.n)],
            separator=" ").alias("_gram")).drop_nulls("_gram")
        e = e.join(self.bench, on="_gram", how="left")
        cnt = e.group_by(self.id_field).agg(
            pl.col("_gram").n_unique().cast(pl.Int64).alias("n_grams"),
            pl.col("_gram").filter(pl.col("_hit"))
            .n_unique().cast(pl.Int64).alias("n_matched"))
        out = ids.join(cnt, on=self.id_field, how="left").with_columns(
            pl.col("n_grams").fill_null(0),
            pl.col("n_matched").fill_null(0))
        return out.select([self.id_field, "n_grams",
                           "n_matched"]).to_arrow()


def contamination_overlap(ds: Dataset, *, text_field: str = "text",
                          id_field: str = "doc_id", mod: int = BENCH_MOD,
                          n: int = BENCH_NGRAM,
                          concurrency: int = 2) -> Dataset:
    """(doc_id, n_grams, n_matched) per non-null-text doc: distinct
    word n-grams in the doc, and how many of those appear in the
    benchmark set. Docs shorter than ``n`` words report (0, 0)."""
    grams = build_benchmark_grams(ds, text_field=text_field,
                                  id_field=id_field, mod=mod, n=n)
    grams_ref = ray.put(grams)
    return ds.map_batches(
        ContaminationOverlapStage,
        fn_constructor_kwargs=dict(grams_ref=grams_ref, n=n,
                                   text_field=text_field,
                                   id_field=id_field),
        batch_format="pyarrow", batch_size=1024, concurrency=concurrency)
