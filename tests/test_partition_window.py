"""Salted partitioning + windowed-operator tests (SURVEY.md §4.2.1)."""

import numpy as np
import pyarrow as pa
import pytest


def test_salted_partitioner_spreads_hot_keys(ray_session, transcripts_small):
    import ray.data as rd

    from go_logagent_ray.stages.partition import add_salted_partition, hot_keys

    ds = rd.from_arrow(transcripts_small)
    hot = hot_keys(ds, "conv_id", threshold=100)
    assert hot  # fixture plants hot conversations (hot_frac)

    parted = add_salted_partition(ds, "conv_id", num_partitions=16,
                                  hot_threshold=100, salt_factor=4)
    rows = parted.take_all()
    by_conv: dict[str, set[int]] = {}
    for r in rows:
        by_conv.setdefault(r["conv_id"], set()).add(r["part"])
    # hot conversations spread over >1 partition; cold ones stay in one
    for conv in hot:
        assert len(by_conv[conv]) > 1, conv
    cold = [c for c in by_conv if c not in hot]
    assert all(len(by_conv[c]) == 1 for c in cold)
    # partition ids valid & total rows conserved
    assert all(0 <= p < 16 for ps in by_conv.values() for p in ps)
    assert len(rows) == transcripts_small.num_rows


def test_salting_is_deterministic(ray_session, transcripts_small):
    import ray.data as rd

    from go_logagent_ray.stages.partition import SaltedPartitioner

    stage = SaltedPartitioner("conv_id", 8, hot={"c00000041"}, salt_factor=4)
    a = stage(transcripts_small)["part"].to_pylist()
    b = stage(transcripts_small)["part"].to_pylist()
    assert a == b


def test_tumbling_window_counts(ray_session):
    import ray.data as rd

    from go_logagent_ray.stages.window import tumbling_window_counts

    ts = np.array(["2024-01-01T00:10:00", "2024-01-01T00:50:00",
                   "2024-01-01T01:10:00", "2024-01-01T02:05:00"],
                  dtype="datetime64[us]")
    t = pa.table({"k": ["a", "a", "a", "b"], "ts": pa.array(ts)})
    out = tumbling_window_counts(rd.from_arrow(t), "k", "ts", window="hour")
    got = {(r["k"], str(r["window_start"])): r["n"] for r in out.take_all()}
    assert got == {("a", "2024-01-01 00:00:00"): 2,
                   ("a", "2024-01-01 01:00:00"): 1,
                   ("b", "2024-01-01 02:00:00"): 1}


def test_session_windows_split_on_gap(ray_session):
    import ray.data as rd

    from go_logagent_ray.stages.window import session_windows

    ts = np.array(["2024-01-01T00:00:00", "2024-01-01T00:01:00",
                   "2024-01-01T05:00:00", "2024-01-01T05:00:30"],
                  dtype="datetime64[us]")
    t = pa.table({"conv_id": ["c"] * 4, "turn_idx": pa.array([0, 1, 2, 3],
                                                             type=pa.int32()),
                  "ts": pa.array(ts)})
    out = session_windows(rd.from_arrow(t), gap_us=3600 * 1_000_000).take_all()
    assert len(out) == 2
    assert [r["n_turns"] for r in sorted(out, key=lambda r: r["session_idx"])] == [2, 2]


def test_salted_gap_stats_match_unsalted(ray_session, transcripts_small):
    """The two-level (key, order//chunk) assoc merge must be exact: same
    (n_turns, max_gap_us) as the single-group path, including the planted
    hot conversations, with bounded sub-group sizes."""
    import ray.data as rd

    from go_logagent_ray.stages.partition import hot_keys
    from go_logagent_ray.stages.window import conv_gap_stats

    ds = rd.from_arrow(transcripts_small)

    def collect(out):
        return {r["conv_id"]: (r["n_turns"], r["max_gap_us"])
                for r in out.take_all()}

    base = collect(conv_gap_stats(ds))
    salted = collect(conv_gap_stats(ds, salt_chunk=16))
    assert salted == base
    # hot-restricted salting: only skewed keys split into chunks
    hot = hot_keys(ds, "conv_id", threshold=100)
    assert hot
    restricted = collect(conv_gap_stats(ds, salt_chunk=16, hot=hot))
    assert restricted == base


def test_salted_gap_stats_bounds_groups(ray_session):
    """A 1000-turn hot conversation with chunk=64 must never put more
    than 64 rows in one partial sub-group."""
    import pandas as pd
    import ray.data as rd

    n = 1000
    ts = pd.date_range("2024-01-01", periods=n, freq="7min").values
    t = pa.table({
        "conv_id": pa.array(["hot"] * n),
        "turn_idx": pa.array(np.arange(n, dtype=np.int32)),
        "ts": pa.array(ts.astype("datetime64[us]")),
    })
    ds = rd.from_arrow(t)
    out = {r["conv_id"]: (r["n_turns"], r["max_gap_us"])
           for r in conv_gap_stats_import(ds, salt_chunk=64).take_all()}
    assert out == {"hot": (n, 7 * 60 * 1_000_000)}
    # bound check: order // 64 puts at most 64 turns in one sub-group
    assert int(np.max(np.bincount(np.arange(n) // 64))) == 64


def conv_gap_stats_import(ds, **kw):
    from go_logagent_ray.stages.window import conv_gap_stats

    return conv_gap_stats(ds, **kw)


def test_salted_gap_stats_negative_gaps(ray_session):
    """Regression (r2 review): a singleton chunk must not contribute a
    phantom 0 gap — keys whose true max gap is NEGATIVE (out-of-order
    timestamps) must match the unsalted path exactly."""
    import pandas as pd
    import ray.data as rd

    from go_logagent_ray.stages.window import conv_gap_stats

    n = 65  # chunk=64 -> one 64-row chunk + one singleton chunk
    ts = pd.date_range("2024-01-01", periods=n, freq="1min").values[::-1]
    t = pa.table({
        "conv_id": pa.array(["rev"] * n),
        "turn_idx": pa.array(np.arange(n, dtype=np.int32)),
        "ts": pa.array(ts.astype("datetime64[us]")),
    })
    ds = rd.from_arrow(t)
    base = {r["conv_id"]: (r["n_turns"], r["max_gap_us"])
            for r in conv_gap_stats(ds).take_all()}
    salted = {r["conv_id"]: (r["n_turns"], r["max_gap_us"])
              for r in conv_gap_stats(ds, salt_chunk=64).take_all()}
    assert base["rev"][1] == -60_000_000
    assert salted == base


def test_sliding_window_counts(ray_session):
    """2h windows hopping hourly: each event lands in exactly 2 windows;
    length == hop degenerates to tumbling."""
    import ray.data as rd

    from go_logagent_ray.stages.window import (
        sliding_window_counts, tumbling_window_counts)

    ts = np.array(["2024-01-01T00:10:00", "2024-01-01T00:50:00",
                   "2024-01-01T01:10:00", "2024-01-01T03:05:00"],
                  dtype="datetime64[us]")
    t = pa.table({"k": pa.array(["a"] * 4), "ts": pa.array(ts)})
    ds = rd.from_arrow(t)
    H = 3600 * 1_000_000
    out = {(r["k"], str(r["window_start"])): r["n"]
           for r in sliding_window_counts(ds, "k", "ts", 2 * H, H).take_all()}
    # row@00:10 -> windows 00:00 and 23:00(prev day); etc.
    assert out[("a", "2024-01-01 00:00:00")] == 3   # 00:10, 00:50, 01:10
    assert out[("a", "2023-12-31 23:00:00")] == 2   # 00:10, 00:50
    assert out[("a", "2024-01-01 01:00:00")] == 1   # 01:10
    assert out[("a", "2024-01-01 03:00:00")] == 1
    assert out[("a", "2024-01-01 02:00:00")] == 1   # 03:05 covers 02:00 win
    assert sum(out.values()) == 8  # every event in exactly length/hop windows

    tumb = {str(r["window_start"]): r["n"]
            for r in sliding_window_counts(ds, "k", "ts", H, H).take_all()}
    base = {str(r["window_start"]): r["n"]
            for r in tumbling_window_counts(ds, "k", "ts").take_all()}
    assert tumb == base


def test_salted_session_windows_match_unsalted(ray_session, transcripts_small):
    """Two-level session stitching must be exact: same sessions as the
    single-group path, including planted hot conversations; boundary
    sessions spanning chunk borders merge correctly."""
    import ray.data as rd

    from go_logagent_ray.stages.window import session_windows

    ds = rd.from_arrow(transcripts_small)

    def collect(out):
        d = {}
        for r in out.take_all():
            d.setdefault(r["conv_id"], []).append(
                (r["session_idx"], r["n_turns"], r["start_us"], r["end_us"]))
        return {k: sorted(v) for k, v in d.items()}

    gap = 1_000_000  # 1 s — small enough that conversations actually split
    base = collect(session_windows(ds, gap_us=gap))
    salted = collect(session_windows(ds, gap_us=gap, salt_chunk=16))
    assert salted == base
    # some conversation must actually have >1 session for the test to bite
    assert any(len(v) > 1 for v in base.values())


def test_salted_sessions_reject_non_monotone_ts(ray_session):
    """The salted session path must fail loudly (not silently diverge)
    when ts is not monotone in order within a key."""
    import pandas as pd
    import ray.data as rd

    from go_logagent_ray.stages.window import session_windows

    ts = np.array(["2024-01-01T01:00:00", "2024-01-01T00:00:00",
                   "2024-01-01T02:00:00"], dtype="datetime64[us]")
    t = pa.table({"conv_id": pa.array(["k"] * 3),
                  "turn_idx": pa.array([0, 1, 2], type=pa.int32()),
                  "ts": pa.array(ts)})
    ds = rd.from_arrow(t)
    # unsalted path handles non-monotone data fine
    assert session_windows(ds, gap_us=1).count() >= 1
    with pytest.raises(Exception):
        session_windows(ds, gap_us=1, salt_chunk=2).materialize()


def test_salted_sessions_reject_cross_chunk_inversion(ray_session):
    """Regression (r2 advice): a ts inversion that straddles a chunk
    boundary — every chunk holding a single row, so the per-chunk check
    is vacuous — must still fail loudly in the stitch, not silently
    produce fewer sessions than the unsalted path."""
    import ray.data as rd

    from go_logagent_ray.stages.window import session_windows

    ts = np.array([1000, 0, 500], dtype="datetime64[us]")
    t = pa.table({"conv_id": pa.array(["k"] * 3),
                  "turn_idx": pa.array([0, 1, 2], type=pa.int32()),
                  "ts": pa.array(ts)})
    ds = rd.from_arrow(t)
    # unsalted: [1000, 0, 500] with gap 300 µs splits into 2 sessions
    assert session_windows(ds, gap_us=300).count() == 2
    with pytest.raises(Exception):
        # salt_chunk=1 → one row per chunk: the local monotonicity check
        # can never fire, only the per-key stitch check can
        session_windows(ds, gap_us=300, salt_chunk=1).materialize()


def test_hot_keys_max_hot_guard_trips_loudly(ray_session):
    """An absolute threshold that admits more than max_hot keys must
    raise (pointing at hot_topk), and the streaming limit means the
    driver never holds more than max_hot+1 rows first."""
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from go_logagent_ray.stages.partition import hot_keys

    t = pa.table({"k": pa.array([f"k{i}" for i in range(20)
                                 for _ in range(3)])})
    ds = rd.from_arrow(t)
    with pytest.raises(ValueError, match="hot_topk"):
        hot_keys(ds, "k", threshold=1, max_hot=5)
    assert len(hot_keys(ds, "k", threshold=1, max_hot=50)) == 20
