"""Deterministic sampling / dataset splits for training-data pipelines.

Not in the reference (a log agent never samples); first-class for corpus
curation: train/val/test splits and downsampling must be DETERMINISTIC
(same row → same split on every run, every worker, any partitioning) and
streaming (a pure per-row predicate inside ``map_batches`` — no shuffle,
no materialization, no RNG state).

Two keying methods:

- ``method="modulo"``: bucket = key % 100 on an integer id column —
  trivially SQL-mirrorable (used by the oracle-checked query), but
  correlated with id assignment order.
- ``method="hash"``: bucket = stable_hash64(key) % 100 — decorrelated
  from id order and usable on string keys (conv_id); environment-stable
  (polars hash), pytest-verified for determinism across runs.

``split_assign`` adds a ``split`` column from named percentage buckets;
``sample_fraction`` keeps ~fraction of rows by the same bucketing, so a
sample is REPRODUCIBLE and a row's membership never depends on which
batch or worker saw it.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data import Dataset

from ..functions.arrow_utils import as_combined, set_column


def _buckets(keys: pa.Array, method: str, seed: int = 0) -> np.ndarray:
    """``seed`` decorrelates CHAINED bucketings on the same key: a
    stratified keep-filter followed by a split on one key would
    otherwise reuse the identical bucket per row (keep < 30 then
    split < 80 puts EVERY survivor in the first split). Only the hash
    method seeds; modulo is the SQL-oracle mode and stays seedless
    (a seeded modulo would silently diverge from ``key % 100``)."""
    _validate_method_seed(method, seed)
    if method == "modulo":
        k = keys.to_numpy(zero_copy_only=False).astype(np.int64)
        # C-style (sign-preserving) remainder, matching SQL's % — numpy's
        # Python-style % would send a negative id to a DIFFERENT bucket
        # than the DuckDB oracle (e.g. -1: 99 vs -1)
        return np.fmod(k, 100).astype(np.int64)
    if method == "hash":
        import polars as pl

        from ..functions.hashing import stable_hash64

        h = stable_hash64(pl.Series(pl.from_arrow(keys)).cast(pl.Utf8),
                          seed=int(seed))
        return (h % np.uint64(100)).astype(np.int64)
    raise ValueError(f"unknown sampling method {method!r}")


def _validate_method_seed(method: str, seed: int) -> None:
    """Driver-side (stage-construction-time) check so a bad combo
    fails as a plain ValueError, not a RayTaskError mid-pipeline."""
    if method not in ("modulo", "hash"):
        raise ValueError(f"unknown sampling method {method!r}")
    if method == "modulo" and seed:
        raise ValueError(
            "seed requires method='hash' (modulo is the oracle-"
            "mirrorable key % 100 and cannot be reseeded)")


def split_assign(ds: Dataset, key: str,
                 splits: dict[str, int] | None = None,
                 method: str = "hash", out: str = "split",
                 seed: int = 0) -> Dataset:
    """Adds ``split:string`` from percentage buckets, e.g.
    ``{"train": 80, "val": 10, "test": 10}`` (must sum to 100).
    Deterministic per key; no shuffle. Assignment is by cumulative-bound
    search (bucket < 80 → train, < 90 → val, …) so a NEGATIVE bucket
    (C-style remainder of a negative id) lands in the first split —
    exactly what the SQL CASE chain does."""
    _validate_method_seed(method, seed)
    splits = splits or {"train": 80, "val": 10, "test": 10}
    if sum(splits.values()) != 100:
        raise ValueError("split percentages must sum to 100")
    bounds = np.cumsum([pct for pct in splits.values()])
    names = np.array(list(splits), dtype=object)

    def assign(batch: pa.Table) -> pa.Table:
        b = _buckets(as_combined(batch[key]), method, seed)
        idx = np.searchsorted(bounds, b, side="right")
        return set_column(batch, out, pa.array(names[idx], type=pa.string()))

    return ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)


def sample_batch_fn(key: str, percent: int, method: str = "hash",
                    seed: int = 0):
    """The per-batch keep-filter as a standalone callable — used by
    ``sample_fraction`` and registrable in config filter chains."""
    _validate_method_seed(method, seed)
    if not 0 <= percent <= 100:
        raise ValueError("percent must be in [0, 100]")

    def keep(batch: pa.Table) -> pa.Table:
        b = _buckets(as_combined(batch[key]), method, seed)
        return batch.filter(pa.array(b < percent))

    return keep


def sample_fraction(ds: Dataset, key: str, percent: int,
                    method: str = "hash", seed: int = 0) -> Dataset:
    """Keep rows whose bucket < percent — a reproducible ~percent% sample
    (exact for modulo keying on dense ids)."""
    return ds.map_batches(sample_batch_fn(key, percent, method, seed),
                          batch_format="pyarrow", zero_copy_batch=True)


def stratified_sample(ds: Dataset, key: str, group: str,
                      rates: dict[str, int], default_percent: int = 0,
                      method: str = "hash", seed: int = 0) -> Dataset:
    """Per-group sampling rates (corpus rebalancing: e.g. keep 50% of
    'en', 10% of 'zh', 25% of everything else).  Same deterministic
    bucketing as ``sample_fraction`` but the keep-threshold varies per
    row by its ``group`` value — still a pure per-row predicate, no
    shuffle, reproducible under any partitioning."""
    _validate_method_seed(method, seed)
    for g, pct in rates.items():
        if not 0 <= pct <= 100:
            raise ValueError(f"rate for {g!r} must be in [0, 100]")
    if not 0 <= default_percent <= 100:
        raise ValueError("default_percent must be in [0, 100]")

    def keep(batch: pa.Table) -> pa.Table:
        b = _buckets(as_combined(batch[key]), method, seed)
        groups = as_combined(batch[group]).to_pylist()
        thresh = np.fromiter(
            (rates.get(g, default_percent) for g in groups),
            dtype=np.int64, count=len(groups))
        return batch.filter(pa.array(b < thresh))

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


def training_order(ds: Dataset, *, id_field: str = "doc_id",
                   shards: int = 64, seed: int = 0,
                   hash_mode: str = "polars") -> Dataset:
    """Deterministic corpus shuffle for training order — the
    hash-bucket TWO-LEVEL shape that replaces a global
    ``random_shuffle``/sort at scale: each row gets
    ``shard = h % shards`` and ``pos`` = its rank within the shard
    under (h, id), where h is a seeded 64-bit hash of the id. A reader
    streaming the shards in order (or interleaving them) sees a
    reproducible pseudo-random global order; re-running with the same
    seed reproduces it exactly on any partitioning.

    Scale shape: ONE bounded groupby shuffle (``shards`` groups, each
    ~corpus/shards rows — size ``shards`` so a group fits a task), an
    in-group argsort, zero driver state. A full-corpus ``sort`` or
    ``random_shuffle`` would be an all-to-all over total order instead.

    ``hash_mode="polars"`` is the production vectorized hash;
    ``"md5"`` hashes ``str(id) + ':' + str(seed)`` with DuckDB's
    ``md5_number_lower`` convention so a SQL oracle reproduces the
    exact order (per-row Python md5 — oracle-parity mode only, same
    trade as simhash's)."""
    import pyarrow.compute as pc

    from ..functions.hashing import stable_hash64

    if hash_mode not in ("polars", "md5"):
        raise ValueError(f"unknown hash_mode {hash_mode!r}")
    n_shards = np.uint64(max(1, int(shards)))

    def add_keys(batch: pa.Table) -> pa.Table:
        import polars as pl

        ids = as_combined(batch[id_field])
        if hash_mode == "polars":
            s = pl.from_arrow(pc.cast(ids, pa.string())) + f":{seed}"
            h = stable_hash64(s)
        else:
            from ..functions.hashing import md5_number_lower

            # ids are unique per batch by the operator's contract —
            # skip md5_number_lower's dedup sort
            h = md5_number_lower(
                [f"{v}:{seed}" for v in ids.to_pylist()],
                assume_unique=True)
        out = {id_field: ids,
               "_h": pa.array(h.astype(np.int64)),  # int64 for Ray keys
               "shard": pa.array((h % n_shards).astype(np.int64))}
        return pa.table(out)

    keyed = ds.select_columns([id_field]).map_batches(
        add_keys, batch_format="pyarrow", zero_copy_batch=True)

    def order_shard(g: pa.Table) -> pa.Table:
        h = as_combined(g["_h"]).to_numpy(zero_copy_only=False) \
            .astype(np.int64).astype(np.uint64)  # back to unsigned order
        ids = g[id_field]
        idx = np.lexsort((ids.to_numpy(zero_copy_only=False), h))
        return pa.table({
            id_field: as_combined(ids).take(pa.array(idx, pa.int64())),
            "shard": g["shard"].slice(0, 1).combine_chunks()
            .take(pa.array(np.zeros(len(idx), np.int64))),
            "pos": pa.array(np.arange(len(idx), dtype=np.int64)),
        })

    return keyed.groupby("shard").map_groups(order_shard,
                                             batch_format="pyarrow")
