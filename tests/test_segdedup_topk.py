"""Unit tests for segment-level exact dedup (`stages/segdedup.py`),
per-group top-k (`stages/aggregate.py::grouped_topk`), and the
quantile_disc convention used by the corpus-relative quality gate."""

import duckdb
import numpy as np
import pyarrow as pa
import ray


def _docs(rows):
    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    })
    return ray.data.from_arrow(t)


def _run_segdedup(rows, size):
    from go_logagent_ray.stages.segdedup import segment_dedup

    out = segment_dedup(_docs(rows), size=size).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def test_segment_dedup_drops_cross_doc_duplicates(ray_session):
    out = _run_segdedup([
        (0, "a b c d e f g h"),          # segs: "a b c d", "e f g h"
        (1, "a b c d x y z w"),          # seg0 duplicates doc0 seg0
    ], size=4)
    assert out.text.tolist() == ["a b c d e f g h", "x y z w"]
    assert out.n_segs.tolist() == [2, 2]
    assert out.n_kept.tolist() == [2, 1]


def test_segment_dedup_within_doc_and_first_occurrence_order(ray_session):
    out = _run_segdedup([
        (0, "m m m p q r s"),            # segs: "m m m p", "q r s"
        (1, "q r s"),                    # dup of doc0 seg1 → dropped
        (2, "p q r s p q r s"),          # seg0 == seg1 within doc
    ], size=4)
    assert out.text.tolist() == ["m m m p q r s", "", "p q r s"]
    assert out.n_kept.tolist() == [2, 0, 1]


def test_segment_dedup_empty_and_null_text(ray_session):
    out = _run_segdedup([
        (0, ""),       # one '' segment — kept (first occurrence)
        (1, ""),       # its duplicate — dropped
        (2, None),     # null text: no output row (matches the oracle)
    ], size=4)
    assert out.doc_id.tolist() == [0, 1]
    assert out.text.tolist() == ["", ""]
    assert out.n_kept.tolist() == [1, 0]
    assert out.n_segs.tolist() == [1, 1]


def test_segment_dedup_every_distinct_segment_survives_once(ray_session):
    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(6)]
    rows = [(i, " ".join(rng.choice(vocab, size=rng.integers(1, 13))))
            for i in range(40)]
    out = _run_segdedup(rows, size=3)
    # every distinct segment text survives exactly once corpus-wide
    # (kept text can't be re-chunked for comparison — boundaries shift
    # when interior segments drop — so check the counts invariant)
    all_segs = []
    for _, t in rows:
        w = t.split(" ")
        all_segs.extend(" ".join(w[i:i + 3]) for i in range(0, len(w), 3))
    assert int(out.n_kept.sum()) == len(set(all_segs))
    assert int(out.n_segs.sum()) == len(all_segs)


def test_segment_dedup_sharded_fallback_matches_broadcast(ray_session):
    """Force the broadcast budget to 0 so the doc-sharded co-group
    fallback runs (the 100 TB regime where the keeper position table
    exceeds the broadcast budget) — must agree EXACTLY with the
    broadcast path in BOTH modes, including whole-doc duplicates, a
    shifted duplicate, empty and null text, and multi-block input
    (the same forced-budget shape as test_bpe's SIDE_COL fallback)."""
    from go_logagent_ray.stages.segdedup import segment_dedup

    rng = np.random.default_rng(17)
    vocab = [f"w{i}" for i in range(8)]
    rows = [(i, " ".join(rng.choice(vocab, size=rng.integers(1, 40))))
            for i in range(150)]
    rows[30] = (30, rows[3][1])              # whole-doc duplicate
    rows[31] = (31, "pfx " + rows[4][1])     # shifted dup (CDC catches)
    rows += [(900, ""), (901, ""), (902, None)]
    ds = _docs(rows).repartition(5)
    for mode in ("aligned", "cdc"):
        bcast = segment_dedup(ds, size=4, mode=mode).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        shard = segment_dedup(ds, size=4, mode=mode,
                              broadcast_limit_bytes=0,
                              keeper_shards=7).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        assert bcast.doc_id.tolist() == shard.doc_id.tolist(), mode
        assert bcast.text.tolist() == shard.text.tolist(), mode
        assert bcast.n_segs.tolist() == shard.n_segs.tolist(), mode
        assert bcast.n_kept.tolist() == shard.n_kept.tolist(), mode
        assert (bcast.n_kept < bcast.n_segs).any(), mode  # dups dropped


def test_chunk_explode_deep_batch_path_matches_loop_semantics():
    """chunk_batch_fn switches to a token-explode plan for deep
    non-overlapping batches (> 16 chunks/doc); it must be row-identical
    to the per-chunk-index loop semantics."""
    from go_logagent_ray.stages.chunk import chunk_batch_fn

    rng = np.random.default_rng(9)
    vocab = [f"w{i}" for i in range(10)]
    texts = [" ".join(rng.choice(vocab, size=n))
             for n in [1, 3, 7, 250, 300, 4]] + ["", None]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    got = chunk_batch_fn(size=3, stride=3)(t)  # max 100 chunks → explode
    exp = []
    for i, tx in enumerate(texts):
        if tx is None:
            continue
        w = tx.split(" ")
        for k in range(0, len(w), 3):
            c = w[k:k + 3]
            exp.append((i, k // 3, len(c), " ".join(c)))
    rows = list(zip(got["doc_id"].to_pylist(), got["chunk_idx"].to_pylist(),
                    got["n_words"].to_pylist(),
                    got["chunk_text"].to_pylist()))
    assert sorted(rows) == sorted(exp)


def test_grouped_topk_ties_and_small_groups(ray_session):
    from go_logagent_ray.stages.aggregate import grouped_topk

    t = pa.table({
        "g": pa.array(["a"] * 5 + ["b"] * 2, pa.string()),
        "score": pa.array([3, 3, 3, 1, 2, 9, 9], pa.int64()),
        "id": pa.array([10, 2, 5, 1, 7, 20, 4], pa.int64()),
    })
    out = grouped_topk(ray.data.from_arrow(t), "g", "score", "id", k=3) \
        .to_pandas().sort_values(["g", "rank"]).reset_index(drop=True)
    # group a: score-desc, id-asc → (3,2),(3,5),(3,10)
    a = out[out.g == "a"]
    assert a["id"].tolist() == [2, 5, 10]
    assert a["rank"].tolist() == [1, 2, 3]
    # group b has only 2 rows — both ranked
    b = out[out.g == "b"]
    assert b["id"].tolist() == [4, 20]
    assert b["rank"].tolist() == [1, 2]


def test_grouped_topk_combiner_matches_single_block(ray_session):
    """Partial top-k per block + merge == top-k computed globally."""
    from go_logagent_ray.stages.aggregate import grouped_topk

    rng = np.random.default_rng(3)
    n = 2000
    t = pa.table({
        "g": pa.array(rng.choice(["x", "y", "z"], n)),
        "score": pa.array(rng.integers(0, 50, n), pa.int64()),
        "id": pa.array(np.arange(n), pa.int64()),
    })
    many = grouped_topk(ray.data.from_arrow(t).repartition(13),
                        "g", "score", "id", k=4).to_pandas()
    one = grouped_topk(ray.data.from_arrow(t), "g", "score", "id",
                       k=4).to_pandas()
    key = ["g", "rank"]
    many = many.sort_values(key).reset_index(drop=True)
    one = one.sort_values(key).reset_index(drop=True)
    assert many.equals(one)


def test_quantile_disc_convention_matches_duckdb():
    """The integer idx math in q_quality_threshold_docs — element at
    ceil(n·q)−1 of the sorted multiset for q=0.25 — must equal DuckDB's
    quantile_disc for every small n (off-by-one conventions differ
    between engines; lock ours to the oracle's)."""
    con = duckdb.connect()
    rng = np.random.default_rng(11)
    for n in range(1, 41):
        vals = sorted(int(x) for x in rng.integers(0, 15, n))
        idx = (n + 3) // 4 - 1  # ceil(n * 0.25) - 1
        mine = vals[idx]
        lit = ", ".join(f"({v})" for v in vals)
        got = con.execute(
            f"SELECT quantile_disc(v, 0.25) FROM (VALUES {lit}) t(v)"
        ).fetchone()[0]
        assert mine == got, (n, vals, mine, got)


def test_segment_dedup_guards(ray_session):
    from go_logagent_ray.stages.segdedup import segment_dedup

    import pytest
    with pytest.raises(Exception, match="unique ids"):
        segment_dedup(_docs([(0, "a b"), (0, "c d")]), size=2).to_pandas()
    with pytest.raises(Exception, match="wrap"):
        segment_dedup(_docs([(1 << 44, "a b")]), size=2).to_pandas()


def _py_segment_dedup(rows, size):
    """Independent pure-Python reference of segment_dedup semantics."""
    segs = {}
    for doc_id, tx in rows:
        if tx is None:
            continue
        w = tx.split(" ")
        for k in range(0, len(w), size):
            segs[(doc_id, k // size)] = " ".join(w[k:k + size])
    first = {}
    for (doc_id, si), txt in sorted(segs.items()):
        first.setdefault(txt, (doc_id, si))
    out = {}
    for doc_id, tx in rows:
        if tx is None:
            continue
        kept, tot = [], 0
        w = tx.split(" ")
        for k in range(0, len(w), size):
            tot += 1
            txt = " ".join(w[k:k + size])
            if first[txt] == (doc_id, k // size):
                kept.append(txt)
        out[doc_id] = (" ".join(kept), tot, len(kept))
    return out


def test_segment_dedup_random_corpora_match_python_reference(ray_session):
    """Full-output compare vs an independent reference on random
    dup-heavy corpora across partition counts."""
    for seed in (21, 22, 23):
        rng = np.random.default_rng(seed)
        vocab = [f"w{i}" for i in range(4)]  # tiny vocab → many dups
        rows = [(i, " ".join(rng.choice(vocab, size=rng.integers(1, 11))))
                for i in range(60)]
        from go_logagent_ray.stages.segdedup import segment_dedup
        t = pa.table({
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
        })
        got = segment_dedup(ray.data.from_arrow(t).repartition(int(seed) % 7 + 2),
                            size=3).to_pandas().sort_values("doc_id")
        exp = _py_segment_dedup(rows, 3)
        for _, r in got.iterrows():
            e = exp[r.doc_id]
            assert (r.text, r.n_segs, r.n_kept) == e, (seed, r.doc_id)
        assert len(got) == len(exp), seed


def test_grouped_topk_matches_pandas_reference(ray_session):
    import pandas as pd

    from go_logagent_ray.stages.aggregate import grouped_topk

    rng = np.random.default_rng(31)
    n = 500
    df = pd.DataFrame({
        "g": rng.choice(["a", "b", "c", "d"], n),
        "score": rng.integers(0, 9, n).astype("int64"),  # heavy ties
        "id": np.arange(n, dtype="int64"),
    })
    t = pa.Table.from_pandas(df, preserve_index=False)
    got = grouped_topk(ray.data.from_arrow(t).repartition(9),
                       "g", "score", "id", k=6).to_pandas()
    exp = (df.sort_values(["score", "id"], ascending=[False, True])
           .groupby("g", sort=False).head(6))
    exp = exp.sort_values(["g", "score", "id"],
                          ascending=[True, False, True]).reset_index(drop=True)
    exp["rank"] = exp.groupby("g").cumcount() + 1
    got = got.sort_values(["g", "rank"]).reset_index(drop=True)[exp.columns]
    assert got.astype(str).equals(exp.astype(str))


def test_grouped_zscore_filter_planted_outliers(ray_session):
    from go_logagent_ray.stages.profile import grouped_zscore_filter

    # group a: tight cluster around 100 plus one far outlier
    vals_a = [100, 101, 99, 100, 102, 98, 100, 101, 99, 1000]
    # group b: all equal → σ=0 → only exact-mean rows survive
    vals_b = [50, 50, 50]
    t = pa.table({
        "g": pa.array(["a"] * len(vals_a) + ["b"] * len(vals_b)),
        "x": pa.array(vals_a + vals_b, pa.int64()),
        "i": pa.array(range(len(vals_a) + len(vals_b)), pa.int64()),
    })
    out = grouped_zscore_filter(ray.data.from_arrow(t).repartition(3),
                                "g", "x", z=2).to_pandas()
    kept_a = sorted(out[out.g == "a"].x)
    assert 1000 not in kept_a and len(kept_a) == len(vals_a) - 1
    assert sorted(out[out.g == "b"].x) == vals_b  # x == μ passes σ=0


def test_grouped_zscore_filter_matches_python_reference(ray_session):
    from go_logagent_ray.stages.profile import grouped_zscore_filter

    rng = np.random.default_rng(41)
    n = 400
    g = rng.choice(["p", "q", "r"], n)
    x = rng.integers(0, 1000, n).astype("int64")
    t = pa.table({"g": pa.array(g), "x": pa.array(x, pa.int64()),
                  "i": pa.array(np.arange(n), pa.int64())})
    out = grouped_zscore_filter(ray.data.from_arrow(t).repartition(5),
                                "g", "x", z=2).to_pandas()
    keep = set()
    for grp in ("p", "q", "r"):
        xs = x[g == grp]
        ids = np.arange(n)[g == grp]
        nn, s, s2 = len(xs), int(xs.sum()), int((xs.astype(object) ** 2).sum())
        rhs = 4 * (nn * s2 - s * s)
        for i, v in zip(ids, xs):
            d = int(v) * nn - s
            if d * d <= rhs:
                keep.add(int(i))
    assert set(out.i) == keep


def test_grouped_zscore_filter_per_group_fallback_and_wrap_guard(ray_session):
    import pytest

    from go_logagent_ray.stages.profile import grouped_zscore_filter

    # "big" group: s2 = 2·(2e9)² ≈ 8e18 fits int64, but the d-bound
    # proof fails → per-row Python-int fallback for THIS group only;
    # "small" stays on the vectorized path. Both 2-point groups keep
    # everything (each point is exactly 1σ from the mean).
    small = [10, 11, 12] * 3 + [500]  # 9 tight inliers + far outlier
    t = pa.table({
        "g": pa.array(["big", "big"] + ["small"] * len(small)),
        "x": pa.array([2_000_000_000, 2_000_000_001] + small, pa.int64()),
    })
    out = grouped_zscore_filter(ray.data.from_arrow(t).repartition(2),
                                "g", "x", z=2).to_pandas()
    assert sorted(out[out.g == "big"].x) == [2_000_000_000, 2_000_000_001]
    # 500 sits ~3σ out even with its own σ inflation → dropped
    assert sorted(out[out.g == "small"].x) == sorted(small[:-1])

    # Σx² wrapping int64 must fail LOUDLY, not mis-filter
    bad = pa.table({
        "g": pa.array(["w"] * 4),
        "x": pa.array([2_900_000_000] * 4, pa.int64()),
    })
    with pytest.raises(Exception, match="overflowed int64"):
        grouped_zscore_filter(ray.data.from_arrow(bad), "g", "x",
                              z=2).to_pandas()


# ------------------------------------------------- CDC mode (round 4)

def _cdc_ref(rows, avg, token_hash="polars"):
    """Pure-python reference for segment_dedup(mode='cdc'): anchors via
    the SAME hash the pipeline uses, keeper = min (doc_id, chunk_idx)."""
    import hashlib

    from go_logagent_ray.functions.hashing import stable_hash64

    def h(word):
        if token_hash == "polars":
            return int(stable_hash64([word])[0])
        return int.from_bytes(
            hashlib.md5(word.encode()).digest()[8:16], "little")

    chunks = {}  # doc_id -> [chunk_text]
    for did, text in rows:
        if text is None:
            continue
        out, cur = [], []
        for w in text.split(" "):
            cur.append(w)
            if h(w) % avg == 0:
                out.append(" ".join(cur))
                cur = []
        if cur:
            out.append(" ".join(cur))
        chunks[did] = out
    first = {}
    for did in sorted(chunks):
        for ci, ct in enumerate(chunks[did]):
            first.setdefault(ct, (did, ci))
    exp = {}
    for did, cl in chunks.items():
        kept = [ct for ci, ct in enumerate(cl)
                if first[ct] == (did, ci)]
        exp[did] = (" ".join(kept), len(cl), len(kept))
    return exp


def test_cdc_dedup_matches_python_reference(ray_session):
    from go_logagent_ray.stages.segdedup import segment_dedup

    rng = np.random.default_rng(17)
    vocab = [f"w{i}" for i in range(40)]
    rows = [(i, " ".join(rng.choice(vocab, size=rng.integers(1, 60))))
            for i in range(80)]
    rows += [(80, rows[3][1]), (81, None), (82, "")]
    out = segment_dedup(_docs(rows), size=5, mode="cdc").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    exp = _cdc_ref(rows, 5)
    got = {int(r.doc_id): (r.text, int(r.n_segs), int(r.n_kept))
           for r in out.itertuples()}
    assert got == exp


def test_aligned_blindspot_and_cdc_closes_it(ray_session):
    """THE alignment blindspot, pinned: a one-word-prefix duplicate is
    OUT OF CONTRACT for mode='aligned' (no aligned window repeats — the
    copy dedups nothing), and mode='cdc' catches it (boundaries resync
    at the first anchor, every later chunk dedups)."""
    from go_logagent_ray.stages.segdedup import segment_dedup

    rng = np.random.default_rng(23)
    vocab = [f"t{i}" for i in range(50)]
    base = " ".join(rng.choice(vocab, size=400))
    rows = [(0, base), (1, "INSERTED " + base)]

    aligned = segment_dedup(_docs(rows), size=20).to_pandas() \
        .sort_values("doc_id")
    # blindspot: every window of doc1 is shifted by one word, so doc1
    # keeps ALL its segments — explicitly asserted out-of-contract
    assert int(aligned.n_kept.iloc[1]) == int(aligned.n_segs.iloc[1])

    cdc = segment_dedup(_docs(rows), size=20, mode="cdc").to_pandas() \
        .sort_values("doc_id")
    exp = _cdc_ref(rows, 20)
    got = {int(r.doc_id): (r.text, int(r.n_segs), int(r.n_kept))
           for r in cdc.itertuples()}
    assert got == exp
    # boundaries resync after the first anchor: doc1 keeps ONLY its
    # first chunk (the one holding the inserted word) — every later
    # chunk realigns with a doc0 chunk and dedups. (doc0 may lose a
    # couple of chunks to WITHIN-doc repeats of the random text — the
    # reference comparison above already pins that exactly.)
    assert int(cdc.n_kept.iloc[1]) == 1
    assert int(cdc.n_segs.iloc[1]) > 5


def test_cdc_md5_mode_matches_duckdb_oracle(ray_session):
    from go_logagent_ray.pipelines.queries import SQL_CDC_DEDUP_DOCS
    from go_logagent_ray.stages.segdedup import segment_dedup

    rng = np.random.default_rng(29)
    vocab = [f"m{i}" for i in range(30)]
    rows = [(i, " ".join(rng.choice(vocab, size=rng.integers(1, 50))))
            for i in range(60)]
    rows += [(60, rows[5][1]), (61, "XX " + rows[5][1]), (62, None)]
    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    })
    got = segment_dedup(ray.data.from_arrow(t).repartition(3), size=20,
                        mode="cdc", token_hash="md5").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("documents", t)
    exp = con.sql(SQL_CDC_DEDUP_DOCS).df() \
        .sort_values("doc_id").reset_index(drop=True)
    assert got.doc_id.tolist() == exp.doc_id.tolist()
    assert got.text.tolist() == exp.text.tolist()
    assert got.n_segs.tolist() == exp.n_segs.tolist()
    assert got.n_kept.tolist() == exp.n_kept.tolist()
