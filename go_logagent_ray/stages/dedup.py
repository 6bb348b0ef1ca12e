"""Deduplication operators for training-data pipelines.

Not in the reference (a log agent never dedups); first-class here because
a 100 TB corpus pipeline lives or dies on dedup. All variants follow the
same scale shape: compute a compact key/signature per row inside
``map_batches`` (vectorized where possible), shuffle ONLY the compact
representation with ``groupby``, and never materialize the corpus.

- exact_dedup / exact_keepers: content-hash partition + per-group min
- minhash_lsh_pairs: shingle → minhash → banded LSH buckets → candidate
  pairs verified on signature similarity
- simhash_pairs: 64-bit simhash, banded buckets, Hamming-distance verify
- charset_jaccard_pairs: exact character-set Jaccard within small groups
  (mirrors DuckDB's ``jaccard()`` so it is SQL-checkable)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset
from ray.data.aggregate import Count, Min

from ..functions.arrow_utils import as_combined, set_column
from ..functions.textstats import fingerprint

# ---------------------------------------------------------------- exact


def exact_keepers(ds: Dataset, text_field: str = "text",
                  id_field: str = "doc_id") -> Dataset:
    """One keeper id per distinct text: min(id) per content hash.

    Scale shape: per-batch partial min per hash (Arrow hash-agg) → tiny
    groupby over partials. Only (hash, id) pairs ever shuffle.
    """
    def partial(batch: pa.Table) -> pa.Table:
        b = fingerprint(batch, field=text_field, out="_fp")
        part = (
            b.select(["_fp", id_field])
            .group_by(["_fp"])
            .aggregate([(id_field, "min")])
        )
        return part.rename_columns(["_fp", id_field])

    partials = ds.map_batches(partial, batch_format="pyarrow")
    out = partials.groupby("_fp").aggregate(Min(id_field, alias_name=id_field))
    return out.select_columns([id_field])


def exact_dedup(ds: Dataset, text_field: str = "text",
                id_field: str = "doc_id") -> Dataset:
    """Keep exactly one full row (min id) per distinct text."""
    def add_fp(batch: pa.Table) -> pa.Table:
        return fingerprint(batch, field=text_field, out="_fp")

    def take_min(group: pd.DataFrame) -> pd.DataFrame:
        return group.nsmallest(1, id_field)

    return (
        ds.map_batches(add_fp, batch_format="pyarrow")
        .groupby("_fp")
        .map_groups(take_min, batch_format="pandas")
        .drop_columns(["_fp"])
    )


def distinct_count(ds: Dataset, text_field: str = "text") -> int:
    """COUNT(DISTINCT text) via hash partials — no full-text shuffle."""
    def partial(batch: pa.Table) -> pa.Table:
        b = fingerprint(batch, field=text_field, out="_fp")
        return b.select(["_fp"]).group_by(["_fp"]).aggregate([])

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return partials.groupby("_fp").aggregate(Count(alias_name="n")).count()


# ---------------------------------------------------------------- minhash

_MERSENNE = (1 << 61) - 1


def _ngram_strings(text: str, n: int) -> list[str]:
    toks = text.lower().split()
    if not toks:
        return []
    if len(toks) < n:
        return [" ".join(toks)]
    return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]


class MinHasher:
    """Per-batch minhash signatures (actor-pool friendly: the random
    permutation parameters are generated once in __init__ from a fixed
    seed, identical on every actor)."""

    def __init__(self, num_perm: int = 64, ngram: int = 3, seed: int = 7,
                 text_field: str = "text", id_field: str = "doc_id"):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.ngram = ngram
        self.text_field = text_field
        self.id_field = id_field

    def signature(self, h: np.ndarray) -> np.ndarray:
        """Signature from a uint64 shingle-hash array (empty → sentinel)."""
        if h.size == 0:
            return np.full(self.num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        # (a*h + b) mod p for all perms at once: (num_perm, n_shingles)
        vals = (self.a[:, None] * h[None, :] + self.b[:, None]) % _MERSENNE
        return vals.min(axis=1).astype(np.uint64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.hashing import stable_hash64

        texts = as_combined(batch[self.text_field]).to_pylist()
        # hash every shingle in the batch in ONE vectorized pass
        # (builtin hash() is process-salted — never use it across workers)
        per_doc = [_ngram_strings(t or "", self.ngram) for t in texts]
        offsets = np.zeros(len(per_doc) + 1, dtype=np.int64)
        np.cumsum([len(p) for p in per_doc], out=offsets[1:])
        flat = [s for p in per_doc for s in p]
        all_h = stable_hash64(flat) if flat else np.array([], dtype=np.uint64)
        sigs = np.stack([
            self.signature(np.unique(all_h[offsets[i]:offsets[i + 1]]))
            for i in range(len(per_doc))
        ])
        sig_col = pa.FixedSizeListArray.from_arrays(
            pa.array(sigs.reshape(-1), type=pa.uint64()), self.num_perm
        )
        return pa.table({
            self.id_field: as_combined(batch[self.id_field]),
            "sig": sig_col,
        })


def minhash_lsh_pairs(
    ds: Dataset,
    *,
    num_perm: int = 64,
    bands: int = 16,
    ngram: int = 3,
    threshold: float = 0.7,
    text_field: str = "text",
    id_field: str = "doc_id",
) -> Dataset:
    """Near-duplicate pairs via MinHash + banded LSH.

    Pipeline: signatures (map_batches, carries only (id, sig)) → explode
    to (band, band_hash, id, sig) rows → groupby buckets → pairwise verify
    on signature agreement ≥ threshold inside each bucket → global dedup
    of pairs. Only signatures shuffle — never text. Returns
    (doc_a, doc_b, sim_est) with doc_a < doc_b.
    """
    rows_per_band = num_perm // bands
    assert bands * rows_per_band == num_perm

    sigs = ds.map_batches(
        MinHasher, fn_constructor_kwargs=dict(
            num_perm=num_perm, ngram=ngram, text_field=text_field,
            id_field=id_field),
        batch_format="pyarrow", concurrency=2,
    )

    def explode(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        sig = np.asarray(batch["sig"].combine_chunks().flatten()).reshape(n, num_perm)
        ids = as_combined(batch[id_field]).to_numpy(zero_copy_only=False)
        band_ids = np.tile(np.arange(bands, dtype=np.int32), n)
        # hash each band slice to one uint64 bucket key
        view = sig.reshape(n, bands, rows_per_band)
        bh = view.astype(np.uint64)
        key = np.zeros((n, bands), dtype=np.uint64)
        for r in range(rows_per_band):
            key = key * np.uint64(1099511628211) + bh[:, :, r]
        return pa.table({
            "band": pa.array(band_ids),
            "bkey": pa.array(key.reshape(-1), type=pa.uint64()),
            id_field: pa.array(np.repeat(ids, bands)),
            "sig": pa.FixedSizeListArray.from_arrays(
                pa.array(np.repeat(sig, bands, axis=0).reshape(-1),
                         type=pa.uint64()), num_perm),
        })

    exploded = sigs.map_batches(explode, batch_format="pyarrow")

    def band_pairs(group: pd.DataFrame) -> pd.DataFrame:
        """One group per BAND (few, large groups — per-bucket map_groups
        would spin up tens of thousands of tiny pandas frames); buckets
        are processed with a C-speed pandas groupby inside."""
        out_a, out_b, out_s = [], [], []
        for _, bucket in group.groupby("bkey", sort=False):
            if len(bucket) < 2:
                continue
            g = bucket.sort_values(id_field)
            ids = g[id_field].to_numpy()
            sig = np.stack(g["sig"].to_numpy())
            for i in range(len(ids)):
                eq = (sig[i + 1 :] == sig[i]).mean(axis=1)
                for j in np.nonzero(eq >= threshold)[0]:
                    out_a.append(ids[i])
                    out_b.append(ids[i + 1 + j])
                    out_s.append(float(eq[j]))
        return pd.DataFrame({"doc_a": out_a, "doc_b": out_b, "sim_est": out_s})

    pairs = exploded.groupby("band").map_groups(band_pairs, batch_format="pandas")

    # same pair can surface from multiple bands — keep one (pair set is
    # small relative to the corpus; dedup on the compact pair keys only)
    def dedup_pairs(group: pd.DataFrame) -> pd.DataFrame:
        return group.drop_duplicates(["doc_a", "doc_b"])

    return pairs.groupby("doc_a").map_groups(dedup_pairs, batch_format="pandas")


# ---------------------------------------------------------------- simhash


class SimHasher:
    """64-bit simhash over word tokens (vectorized bit-vote accumulation)."""

    def __init__(self, text_field: str = "text", id_field: str = "doc_id"):
        self.text_field = text_field
        self.id_field = id_field

    @staticmethod
    def simhash64(hs: np.ndarray) -> int:
        """Simhash from a uint64 token-hash array (bit-vote accumulation)."""
        if hs.size == 0:
            return 0
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1)
        # votes MUST be signed: uint64 arithmetic wraps minority-bit votes
        # (sum*2 - n) to huge positives, setting nearly every bit for docs
        # with odd token counts and collapsing unrelated simhashes
        votes = bits.sum(axis=0).astype(np.int64) * 2 - np.int64(len(hs))
        return int((votes > 0).astype(np.uint64) @ (np.uint64(1) << np.arange(64, dtype=np.uint64)))

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.hashing import stable_hash64

        texts = as_combined(batch[self.text_field]).to_pylist()
        per_doc = [(t or "").lower().split() for t in texts]
        offsets = np.zeros(len(per_doc) + 1, dtype=np.int64)
        np.cumsum([len(p) for p in per_doc], out=offsets[1:])
        flat = [s for p in per_doc for s in p]
        all_h = stable_hash64(flat) if flat else np.array([], dtype=np.uint64)
        sh = np.array([
            self.simhash64(all_h[offsets[i]:offsets[i + 1]])
            for i in range(len(per_doc))
        ], dtype=np.uint64)
        return pa.table({
            self.id_field: as_combined(batch[self.id_field]),
            "simhash": pa.array(sh, type=pa.uint64()),
        })


def simhash_pairs(ds: Dataset, *, max_hamming: int = 3,
                  text_field: str = "text", id_field: str = "doc_id") -> Dataset:
    """Near-dup pairs with simhash: 4×16-bit bands (any exact band match →
    candidate; Hamming ≤ max_hamming verifies). Returns (doc_a, doc_b,
    hamming)."""
    hashed = ds.map_batches(
        SimHasher, fn_constructor_kwargs=dict(text_field=text_field,
                                              id_field=id_field),
        batch_format="pyarrow", concurrency=2,
    )

    def explode(batch: pa.Table) -> pa.Table:
        sh = as_combined(batch["simhash"]).to_numpy(zero_copy_only=False)
        ids = as_combined(batch[id_field]).to_numpy(zero_copy_only=False)
        n = len(sh)
        bands = np.arange(4, dtype=np.int32)
        keys = np.stack([(sh >> (16 * b)) & 0xFFFF for b in range(4)], axis=1)
        return pa.table({
            "band": pa.array(np.tile(bands, n)),
            "bkey": pa.array(keys.reshape(-1).astype(np.uint64)),
            id_field: pa.array(np.repeat(ids, 4)),
            "simhash": pa.array(np.repeat(sh, 4), type=pa.uint64()),
        })

    def band_pairs(group: pd.DataFrame) -> pd.DataFrame:
        a, b, hd = [], [], []
        for _, bucket in group.groupby("bkey", sort=False):
            if len(bucket) < 2:
                continue
            g = bucket.sort_values(id_field)
            ids = g[id_field].to_numpy()
            sh = g["simhash"].to_numpy().astype(np.uint64)
            for i in range(len(ids)):
                x = sh[i + 1 :] ^ sh[i]
                ham = np.array([bin(int(v)).count("1") for v in x])
                for j in np.nonzero(ham <= max_hamming)[0]:
                    a.append(ids[i]); b.append(ids[i + 1 + j]); hd.append(int(ham[j]))
        return pd.DataFrame({"doc_a": a, "doc_b": b, "hamming": hd})

    pairs = hashed.map_batches(explode, batch_format="pyarrow") \
        .groupby("band").map_groups(band_pairs, batch_format="pandas")

    def dedup_pairs(group: pd.DataFrame) -> pd.DataFrame:
        return group.drop_duplicates(["doc_a", "doc_b"])

    return pairs.groupby("doc_a").map_groups(dedup_pairs, batch_format="pandas")


# ------------------------------------------------- embedding cosine near-dup


def embedding_neardup_pairs(
    ds: Dataset,
    threshold: float = 0.95,
    *,
    id_field: str = "vec_id",
    vec_field: str = "embedding",
    corpus_path: str | None = None,
) -> Dataset:
    """Near-duplicate pairs by embedding cosine similarity ≥ threshold.

    Exact: the corpus matrix is broadcast ONCE via ``ray.put`` and every
    batch does one matmul against it — O(corpus·batch) work per batch, no
    shuffle; emits (doc_a, doc_b, cos_sim) with doc_a < doc_b so each
    pair appears exactly once. This is the broadcastable-corpus regime
    (≤ ~1M vectors); beyond that, bucket with the random-hyperplane LSH
    in ``stages/ann.py`` and score within buckets (approximate).
    ``corpus_path`` loads the broadcast side from parquet instead of
    collecting ``ds`` itself.
    """
    import ray

    from .ann import _fixed_matrix, _normalize

    if corpus_path is not None:
        import pyarrow.parquet as pq

        t = pq.read_table(corpus_path, columns=[id_field, vec_field])
    else:
        t = pa.concat_tables(
            [b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
             for b in ray.get(ds.to_arrow_refs())])
    ref = ray.put((t[id_field].to_numpy(), _normalize(_fixed_matrix(t[vec_field]))))

    def batch_pairs(batch: pa.Table) -> pa.Table:
        ids, mat = ray.get(ref)
        b_ids = as_combined(batch[id_field]).to_numpy(zero_copy_only=False)
        b_mat = _normalize(_fixed_matrix(batch[vec_field]))
        sims = b_mat @ mat.T
        hit = (sims >= threshold) & (ids[None, :] > b_ids[:, None])  # a < b
        bi, cj = np.nonzero(hit)
        return pa.table({"doc_a": pa.array(b_ids[bi].astype(np.int64)),
                         "doc_b": pa.array(ids[cj].astype(np.int64)),
                         "cos_sim": pa.array(sims[bi, cj].astype(np.float64))})

    return ds.map_batches(batch_pairs, batch_format="pyarrow")


# --------------------------------------------------- word n-gram jaccard


def ngram_jaccard_pairs(
    ds: Dataset,
    group_keys: list[str],
    threshold: float = 0.7,
    ngram: int = 3,
    text_field: str = "text",
    id_field: str = "doc_id",
) -> Dataset:
    """EXACT word-ngram Jaccard near-dup pairs within co-grouped rows.

    The exact counterpart of minhash_lsh_pairs' estimate: Jaccard over the
    sets of word n-grams. Pairwise work bounded by group size — same
    partitioning assumption as charset_jaccard_pairs (keep groups small
    or pre-filter with MinHash candidates at scale)."""

    def pairs_in_group(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(id_field)
        ids = g[id_field].to_numpy()
        sets = [frozenset(_ngram_strings(t or "", ngram)) for t in g[text_field]]
        cols: dict[str, list] = {k: [] for k in group_keys}
        a_out, b_out, j_out = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                union = len(sets[i] | sets[j])
                sim = (len(sets[i] & sets[j]) / union) if union else 0.0
                if sim >= threshold:
                    a_out.append(ids[i]); b_out.append(ids[j]); j_out.append(sim)
                    for k in group_keys:
                        cols[k].append(g[k].iloc[0])
        cols.update({"doc_a": a_out, "doc_b": b_out, "jaccard": j_out})
        return pd.DataFrame(cols, columns=group_keys + ["doc_a", "doc_b", "jaccard"])

    return ds.select_columns(group_keys + [id_field, text_field]) \
        .groupby(group_keys).map_groups(pairs_in_group, batch_format="pandas")


# ------------------------------------------------------- charset jaccard


def charset_jaccard_pairs(
    ds: Dataset,
    group_keys: list[str],
    threshold: float,
    text_field: str = "text",
    id_field: str = "doc_id",
) -> Dataset:
    """Exact character-set Jaccard pairs within co-grouped rows.

    Semantics mirror DuckDB's ``jaccard(s1, s2)`` (Jaccard over the SETS
    of characters) so results are SQL-verifiable. Pairwise work is bounded
    by the group size — choose ``group_keys`` that keep groups small
    (e.g. (lang, source)); this is the documented partitioning assumption.
    Returns group_keys + (doc_a, doc_b) with doc_a < doc_b.
    """

    def pairs_in_group(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(id_field)
        ids = g[id_field].to_numpy()
        sets = [frozenset(t) if t else frozenset() for t in g[text_field]]
        cols: dict[str, list] = {k: [] for k in group_keys}
        a_out, b_out = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                inter = len(sets[i] & sets[j])
                union = len(sets[i] | sets[j])
                sim = inter / union if union else 0.0
                if sim >= threshold:
                    a_out.append(ids[i])
                    b_out.append(ids[j])
                    for k in group_keys:
                        cols[k].append(g[k].iloc[0])
        cols["doc_a"] = a_out
        cols["doc_b"] = b_out
        return pd.DataFrame(cols, columns=group_keys + ["doc_a", "doc_b"])

    return ds.select_columns(group_keys + [id_field, text_field]) \
        .groupby(group_keys).map_groups(pairs_in_group, batch_format="pandas")
