"""Bloom-filter join pruning — cut shuffle volume of a large ⋈ large
hash join by prefiltering the probe side against a compact bloom filter
of the build side's keys.

At 100 TB the dominant cost of ``Dataset.join`` is moving both sides
through the exchange; when the join is selective (the probe side has
many rows whose key is absent from the build side), a bloom filter
built in one pass over the build side and broadcast via ``ray.put``
drops those rows BEFORE the shuffle.  False positives are harmless —
the join itself discards them — so the result is exactly the plain
join's.  The filter is mergeable: each batch emits a partial bit
array, OR-merged on the driver (fixed m bits regardless of input).

Sizing: false-positive rate ≈ (1 - e^(-k·n/m))^k; the default
m = 2^23 bits (1 MiB) with k = 4 holds ~1% FP at n ≈ 1M keys.  The
filter is per-job state, not per-batch: built once, shipped once.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
from ray.data import Dataset

from ..functions.arrow_utils import as_combined

_SEEDS = np.array([0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F,
                   0x165667B19E3779F9, 0x27D4EB2F165667C5],
                  dtype=np.uint64)


def _bit_positions(keys: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """(k, n) bit positions per key — vectorized multiply-shift mixes."""
    x = keys.astype(np.uint64)
    out = np.empty((k, len(x)), dtype=np.int64)
    for i in range(k):
        h = x * _SEEDS[i]
        h ^= h >> np.uint64(29)
        h *= np.uint64(0xBF58476D1CE4E5B9)
        h ^= h >> np.uint64(32)
        out[i] = (h % np.uint64(m_bits)).astype(np.int64)
    return out


def build_bloom(ds: Dataset, key: str, *, m_bits: int = 1 << 23,
                k: int = 4) -> bytes:
    """One pass over the build side: per-batch partial bit arrays,
    OR-merged driver-side (each partial is m_bits/8 bytes, fixed)."""

    def partial(batch: pa.Table) -> pa.Table:
        keys = as_combined(batch[key]).to_numpy(zero_copy_only=False)
        bits = np.zeros(m_bits // 8, dtype=np.uint8)
        pos = _bit_positions(keys, m_bits, k).ravel()
        np.bitwise_or.at(bits, pos >> 3,
                         np.left_shift(1, (pos & 7)).astype(np.uint8))
        return pa.table({"bloom": pa.array([bits.tobytes()], pa.binary())})

    # streamed OR-merge: iter_batches consumes one partial at a time —
    # take_all() would buffer blocks × m_bits/8 bytes on the driver at
    # once (tens of GB at 100 TB block counts) for rows used once
    merged = np.zeros(m_bits // 8, dtype=np.uint8)
    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=None)
    for batch in parts.iter_batches(batch_format="pyarrow"):
        for buf in batch.column("bloom").to_pylist():
            np.bitwise_or(merged, np.frombuffer(buf, dtype=np.uint8),
                          out=merged)
    return merged.tobytes()


def bloom_prefilter(ds: Dataset, key: str, bloom_ref, *,
                    m_bits: int = 1 << 23, k: int = 4) -> Dataset:
    """Drop rows whose key is definitely absent from the bloom filter
    (possible false positives pass through — the downstream join
    removes them)."""

    def keep(batch: pa.Table) -> pa.Table:
        bits = np.frombuffer(ray.get(bloom_ref), dtype=np.uint8)
        keys = as_combined(batch[key]).to_numpy(zero_copy_only=False)
        pos = _bit_positions(keys, m_bits, k)
        ok = np.ones(len(keys), dtype=bool)
        for i in range(k):
            ok &= (bits[pos[i] >> 3] & (1 << (pos[i] & 7))) != 0
        return batch.filter(pa.array(ok))

    return ds.map_batches(keep, batch_format="pyarrow",
                          zero_copy_batch=True)
