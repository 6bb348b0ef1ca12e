"""DSIR-style data selection via importance resampling (Xie et al.
2023, "Data Selection for Language Models via Importance Resampling").

The public method: featurize every document into a bag of hashed
n-grams, fit two unigram feature distributions — one over a TARGET
corpus (the domain you want more of) and one over the RAW pool — and
score each raw document by its importance log-ratio
``Σ_f c_f(doc) · (log p_target(f) − log p_raw(f))``; the top-weighted
(or Gumbel-resampled) docs are selected. Method deltas from the paper,
both in the direction this repo's oracles demand: (1) features are
hashed unigrams (the paper defaults to hashed bigrams — same machinery,
one fewer shifted column); (2) the log-probabilities are
integer-quantized to ``floor(log2(count + 1))`` so the weight is an
exact int64 — the `unigram_lm` integer-components discipline — and
selection is deterministic top-k with (weight DESC, id ASC) tie-break
rather than Gumbel sampling (the sampled variant is one noise column
away and not SQL-oracle-able).

Scale shape: the corpus is read twice (fit, then score — the BPE
convention for two-pass fits). Pass 1 reduces each batch to
(side, bucket) count partials — at most 2·n_buckets rows per batch —
and a tiny grouped sum finishes them; the ratio table is a FIXED
n_buckets-long int64 array (16 KB at the 4096 default, fine to build
on the driver at ANY corpus size) broadcast once with ``ray.put``.
Pass 2 is shuffle-free: per-doc weights are one polars explode +
gather + group_by per batch, and the global top-k moves only each
batch's k best rows (the `grouped_topk` combiner discipline).

Hashing: ``hash_mode="md5"`` uses the shared `md5_number_lower`
convention so the SQL oracle reproduces bucket ids bit-for-bit
(oracle-parity mode, per-unique-token Python md5 — vocabulary-bounded);
production runs keep the vectorized ``stable_hash64`` default
(``hash_mode="fast"``), which changes bucket assignment but not the
method.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data import Dataset

TARGET_MOD_DEFAULT = 13


def _bucket_tokens(flat, n_buckets: int, hash_mode: str) -> "object":
    """polars int64 Series of feature buckets for a FLAT token series
    (already exploded — tokenization happens once, in `_tok_frame`)."""
    import polars as pl

    if hash_mode == "md5":
        from ..functions.hashing import md5_number_lower

        buckets = (md5_number_lower(flat.to_numpy())
                   % np.uint64(n_buckets)).astype(np.int64)
        return pl.Series(buckets)
    if hash_mode == "fast":
        from ..functions.hashing import stable_hash64

        return pl.Series(
            (stable_hash64(flat, seed=0) % np.uint64(n_buckets))
            .astype(np.int64))
    raise ValueError(f"unknown hash_mode {hash_mode!r}")


def dsir_kernels(*, id_field: str = "doc_id", text_field: str = "text",
                 n_buckets: int = 4096, target_mod: int = TARGET_MOD_DEFAULT,
                 hash_mode: str = "md5"):
    """(fit_partial, score_fn_factory) — module-level so the fit/score
    composition is property-testable without a Ray session.

    ``fit_partial`` reduces a batch to (side, bucket, n) token counts
    (side 1 = target ``id % target_mod == 0``, side 0 = raw pool).
    ``score_fn_factory(ratio)`` closes over the int64 ratio array and
    maps a batch to its raw docs' (id, weight) rows."""
    import polars as pl

    def _tok_frame(batch: pa.Table) -> "pl.DataFrame":
        # null ids are excluded like null texts: the oracle's
        # ``id % mod = 0`` / ``<> 0`` predicates are both NULL-false, so
        # a null-id doc belongs to NEITHER distribution — and a null in
        # the id column would also coerce to_numpy to float64 and break
        # the int64 output schema
        df = (pl.from_arrow(batch.select([id_field, text_field]))
              .drop_nulls([id_field, text_field]))
        if not df.height:
            return pl.DataFrame({id_field: pl.Series([], dtype=pl.Int64),
                                 "_b": pl.Series([], dtype=pl.Int64)})
        ids = df[id_field].to_numpy()
        toks = df[text_field].str.split(" ")
        lens = toks.list.len().to_numpy().astype(np.int64)
        buckets = _bucket_tokens(toks.explode(), n_buckets, hash_mode)
        return pl.DataFrame({id_field: pl.Series(np.repeat(ids, lens)),
                             "_b": buckets})

    def fit_partial(batch: pa.Table) -> pa.Table:
        tf = _tok_frame(batch)
        out = (tf.with_columns(
                   ((pl.col(id_field) % target_mod) == 0)
                   .cast(pl.Int64).alias("side"))
               .group_by(["side", "_b"])
               .agg(pl.len().cast(pl.Int64).alias("n")))
        return out.select(["side", "_b", "n"]).to_arrow()

    def score_fn_factory(ratio: np.ndarray):
        def score(batch: pa.Table) -> pa.Table:
            tf = _tok_frame(batch)
            tf = tf.filter((pl.col(id_field) % target_mod) != 0)
            if not tf.height:
                return pa.table({id_field: pa.array([], pa.int64()),
                                 "weight": pa.array([], pa.int64())})
            r = pl.Series("_r", ratio[tf["_b"].to_numpy()])
            out = (tf.with_columns(r)
                   .group_by(id_field)
                   .agg(pl.col("_r").sum().cast(pl.Int64).alias("weight")))
            return out.select([id_field, "weight"]).to_arrow()

        return score

    return fit_partial, score_fn_factory


def ratio_from_counts(nt: np.ndarray, nr: np.ndarray) -> np.ndarray:
    """int64 quantized log-ratio per bucket:
    ``floor(log2(n_target+1)) − floor(log2(n_raw+1))``. Computed with
    exact integer bit_length (== the oracle's floor(log2(n+1)), which
    is float-safe for integers because log2 is exact at powers of two).
    """
    def ilog(a: np.ndarray) -> np.ndarray:
        return np.array([int(x + 1).bit_length() - 1 for x in a],
                        dtype=np.int64)

    return ilog(nt) - ilog(nr)


def dsir_select(ds: Dataset, *, id_field: str = "doc_id",
                text_field: str = "text", k: int = 25,
                n_buckets: int = 4096,
                target_mod: int = TARGET_MOD_DEFAULT,
                hash_mode: str = "md5") -> Dataset:
    """Top-``k`` raw-pool docs by DSIR importance weight:
    (id, weight), weight DESC then id ASC. Docs with a null text (no
    features) or a null id (in neither distribution — the oracle's
    mod predicates are NULL-false) are excluded."""
    import ray

    from .aggregate import grouped_sum

    fit_partial, score_fn_factory = dsir_kernels(
        id_field=id_field, text_field=text_field, n_buckets=n_buckets,
        target_mod=target_mod, hash_mode=hash_mode)

    parts = ds.map_batches(fit_partial, batch_format="pyarrow")
    counts = grouped_sum(parts, ["side", "_b"], "n", alias="n")
    # ≤ 2·n_buckets rows at ANY corpus size — bounded driver merge
    nt = np.zeros(n_buckets, np.int64)
    nr = np.zeros(n_buckets, np.int64)
    for b in counts.iter_batches(batch_format="pyarrow"):
        side = b.column("side").to_numpy(zero_copy_only=False)
        buck = b.column("_b").to_numpy(zero_copy_only=False)
        n = b.column("n").to_numpy(zero_copy_only=False)
        np.add.at(nt, buck[side == 1], n[side == 1])
        np.add.at(nr, buck[side == 0], n[side == 0])
    ratio_ref = ray.put(ratio_from_counts(nt, nr))

    def score(batch: pa.Table) -> pa.Table:
        import ray as _ray

        fn = score_fn_factory(_ray.get(ratio_ref))
        t = fn(batch)
        # local top-k combiner: only each batch's k best rows move
        if t.num_rows > k:
            import polars as pl

            t = (pl.from_arrow(t)
                 .sort(["weight", id_field], descending=[True, False])
                 .head(k).to_arrow())
        return t

    scored = ds.map_batches(score, batch_format="pyarrow")
    return scored.sort(["weight", id_field], descending=[True, False]) \
        .limit(k)
