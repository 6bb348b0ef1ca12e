"""Tests for DSIR importance-resampling selection (`stages/dsir.py`).

The fit/score composition is property-tested WITHOUT a Ray session
(split → fit_partial per batch → summed counts → ratio → score per
batch) against a single-pass pure-Python reference; the quantized
log-ratio and the top-k tie-break get targeted cases; the full
operator runs on the shared Ray session and through the DuckDB gate
(test_queries_vs_duckdb.py::dsir_select_docs).
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from go_logagent_ray.stages.dsir import (dsir_kernels, dsir_select,
                                         ratio_from_counts)

B = 64  # small bucket count so collisions actually occur in tests


def _md5_bucket(tok: str) -> int:
    return int.from_bytes(
        hashlib.md5(tok.encode()).digest()[8:16], "little") % B


def _reference(ids, texts, target_mod=3):
    """Pure single-pass DSIR: (id -> weight) for raw docs with text."""
    nt = np.zeros(B, np.int64)
    nr = np.zeros(B, np.int64)
    for i, t in zip(ids, texts):
        if t is None:
            continue
        for tok in t.split(" "):
            b = _md5_bucket(tok)
            if i % target_mod == 0:
                nt[b] += 1
            else:
                nr[b] += 1
    ratio = np.array([math.floor(math.log2(n + 1)) for n in nt],
                     np.int64) - \
        np.array([math.floor(math.log2(n + 1)) for n in nr], np.int64)
    out = {}
    for i, t in zip(ids, texts):
        if t is None or i % target_mod == 0:
            continue
        out[i] = sum(int(ratio[_md5_bucket(tok)]) for tok in t.split(" "))
    return out


@st.composite
def doc_rows(draw, max_rows=30):
    n = draw(st.integers(min_value=0, max_value=max_rows))
    ids = draw(st.lists(st.integers(0, 1000), min_size=n, max_size=n,
                        unique=True))
    words = st.sampled_from(["a", "bb", "ccc", "Dd", "", "e e"])
    texts = [draw(st.one_of(st.none(),
                            st.lists(words, min_size=0, max_size=5)
                            .map(" ".join)))
             for _ in range(n)]
    return ids, texts


splits = st.lists(st.floats(min_value=0.0, max_value=1.0),
                  min_size=0, max_size=4)


@settings(max_examples=50, deadline=None)
@given(rows=doc_rows(), cuts=splits)
def test_dsir_composition_matches_reference(rows, cuts):
    ids, texts = rows
    t = pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "text": pa.array(texts, pa.string())})
    fit_partial, score_factory = dsir_kernels(
        n_buckets=B, target_mod=3, hash_mode="md5")

    bounds = sorted({int(f * t.num_rows) for f in cuts})
    bounds = [0] + [c for c in bounds if 0 < c < t.num_rows] + [t.num_rows]
    batches = [t.slice(a, b - a) for a, b in zip(bounds, bounds[1:])
               if b > a] or [t]

    nt = np.zeros(B, np.int64)
    nr = np.zeros(B, np.int64)
    for b in batches:
        p = fit_partial(b)
        side = p.column("side").to_numpy(zero_copy_only=False)
        buck = p.column("_b").to_numpy(zero_copy_only=False)
        n = p.column("n").to_numpy(zero_copy_only=False)
        np.add.at(nt, buck[side == 1], n[side == 1])
        np.add.at(nr, buck[side == 0], n[side == 0])
    score = score_factory(ratio_from_counts(nt, nr))
    got = {}
    for b in batches:
        s = score(b)
        for i, w in zip(s.column("doc_id").to_pylist(),
                        s.column("weight").to_pylist()):
            got[i] = w
    assert got == _reference(ids, texts, target_mod=3)


def test_ratio_quantization_exact_at_powers_of_two():
    nt = np.array([0, 1, 2, 3, 4, 7, 8, 1023, 1024], np.int64)
    nr = np.zeros_like(nt)
    r = ratio_from_counts(nt, nr)
    # floor(log2(n+1)): 0,1,1,2,2,3,3,10,10
    assert r.tolist() == [0, 1, 1, 2, 2, 3, 3, 10, 10]


def test_dsir_select_topk_tiebreak(ray_session):
    """Equal-weight docs break ties by ascending id; k truncates after
    the (weight DESC, id ASC) order."""
    import ray.data as rd

    # ids 0,3 are target (mod 3); 1,2,4,5 raw with identical text →
    # identical weights → id tie-break picks the two smallest
    t = pa.table({"doc_id": pa.array([0, 1, 2, 3, 4, 5], pa.int64()),
                  "text": pa.array(["x y", "x y", "x y",
                                    "x y", "x y", "x y"])})
    out = dsir_select(rd.from_arrow(t), k=2, n_buckets=B,
                      target_mod=3, hash_mode="md5").to_pandas()
    assert out["doc_id"].tolist() == [1, 2]
    assert out["weight"].nunique() == 1


def test_dsir_null_text_excluded(ray_session):
    import ray.data as rd

    t = pa.table({"doc_id": pa.array([0, 1, 2], pa.int64()),
                  "text": pa.array(["tgt tok", None, "tgt tok"])})
    out = dsir_select(rd.from_arrow(t), k=10, n_buckets=B,
                      target_mod=3, hash_mode="md5").to_pandas()
    # doc 1 has null text → excluded; only doc 2 scored
    assert out["doc_id"].tolist() == [2]


def test_dsir_null_id_excluded_and_schema_stays_int64(ray_session):
    """A null-id doc belongs to NEITHER distribution (the oracle's mod
    predicates are NULL-false) and must not flip the id column to
    float64 (review finding: polars to_numpy with nulls yields NaN)."""
    import ray.data as rd

    t = pa.table({"doc_id": pa.array([0, None, 2], pa.int64()),
                  "text": pa.array(["tgt tok", "tgt tok", "tgt tok"])})
    out = dsir_select(rd.from_arrow(t), k=10, n_buckets=B,
                      target_mod=3, hash_mode="md5").to_pandas()
    assert out["doc_id"].tolist() == [2]
    assert str(out["doc_id"].dtype) == "int64"
    assert str(out["weight"].dtype) == "int64"


def test_dsir_fast_mode_runs(ray_session):
    """Production hash mode: same shape/coverage, different buckets."""
    import ray.data as rd

    t = pa.table({"doc_id": pa.array(list(range(12)), pa.int64()),
                  "text": pa.array([f"w{i % 4} common" for i in range(12)])})
    out = dsir_select(rd.from_arrow(t), k=5, n_buckets=B,
                      target_mod=3, hash_mode="fast").to_pandas()
    assert len(out) == 5
    assert set(out.columns) == {"doc_id", "weight"}
    assert all(i % 3 != 0 for i in out["doc_id"])
