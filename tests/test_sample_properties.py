"""Hypothesis properties for the pure sampling-bucket kernel
(`stages/sample.py::_buckets`) — no Ray in the loop; the Dataset-level
determinism/validation tests live in test_dedup_ann.py and the config
composition in test_textstats_multimodal_config.py."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from go_logagent_ray.stages.sample import _buckets

ids = st.lists(st.integers(min_value=-(2**62), max_value=2**62 - 1),
               min_size=1, max_size=200)


@settings(max_examples=200, deadline=None)
@given(ids)
def test_modulo_buckets_match_sql_remainder(keys):
    """modulo buckets are the C-style (sign-preserving) remainder —
    exactly SQL's %, including for negative ids."""
    b = _buckets(pa.array(keys, pa.int64()), "modulo")
    assert b.tolist() == [int(np.fmod(k, 100)) for k in keys]
    # SQL's % keeps the dividend's sign: -1 % 100 == -1, never 99
    assert all(-99 <= v <= 99 for v in b.tolist())


@settings(max_examples=100, deadline=None)
@given(ids, st.integers(min_value=0, max_value=2**31))
def test_hash_buckets_deterministic_and_in_range(keys, seed):
    a = _buckets(pa.array(keys, pa.int64()), "hash", seed)
    b = _buckets(pa.array(keys, pa.int64()), "hash", seed)
    assert a.tolist() == b.tolist()          # same seed → same buckets
    assert all(0 <= v < 100 for v in a.tolist())
    # equal keys agree within one call regardless of position
    lookup = {}
    for k, v in zip(keys, a.tolist()):
        assert lookup.setdefault(k, v) == v


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**62 - 1),
                min_size=50, max_size=200, unique=True))
def test_distinct_seeds_decorrelate(keys):
    """Different seeds must not reproduce the same bucket assignment
    (the chained sample→split correlation trap) — with ≥50 distinct
    keys the odds of two seeds agreeing everywhere are ~100^-50."""
    arr = pa.array(keys, pa.int64())
    a = _buckets(arr, "hash", 0)
    b = _buckets(arr, "hash", 7)
    assert a.tolist() != b.tolist()
