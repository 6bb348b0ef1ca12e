"""Bloom filter: no false negatives ever, FP rate sane, prefiltered
join equals plain join (query-level equivalence in
test_queries_vs_duckdb.py)."""

import numpy as np
import pyarrow as pa
import ray

from go_logagent_ray.stages.bloom import (bloom_prefilter, build_bloom,
                                          _bit_positions)


def test_no_false_negatives_and_low_fp():
    keys = np.arange(0, 50_000, dtype=np.int64)
    ds = ray.data.from_arrow(pa.table({"k": keys}))
    bloom = build_bloom(ds, "k", m_bits=1 << 20, k=4)
    ref = ray.put(bloom)
    probe_keys = np.arange(0, 100_000, dtype=np.int64)
    probe = ray.data.from_arrow(pa.table({"k": probe_keys}))
    kept = bloom_prefilter(probe, "k", ref,
                           m_bits=1 << 20, k=4).to_pandas()["k"].to_numpy()
    # every real key survives
    assert np.isin(keys, kept).all()
    # false positives bounded (theoretical ~2% at this load; allow 3x)
    fp = len(kept) - len(keys)
    assert fp / 50_000 < 0.06


def test_bit_positions_deterministic_and_spread():
    k = np.array([1, 2, 3, 10**12], dtype=np.int64)
    a = _bit_positions(k, 1 << 16, 4)
    b = _bit_positions(k, 1 << 16, 4)
    assert (a == b).all()
    assert len(np.unique(a)) > 12  # hashes actually spread
