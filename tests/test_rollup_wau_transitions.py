"""Tests for the three round-5 analytics rollups: multi-level ROLLUP
counts (`stages/aggregate.py::rollup_counts`), rolling active users
(`stages/window.py::rolling_active_users`), and event-sequence
transition mining (`stages/transitions.py::transition_counts`).

The sharded kernels (wau_kernels, transition_kernels) are property-
tested WITHOUT a Ray session by simulating the distributed composition
locally (split → partial per batch → per-shard merge → cross-shard
reduce) against single-pass pure-pandas references — the
test_sharded_properties.py discipline. The ROLLUP operator's
level-cascade and empty/null edges run on the shared Ray session.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from go_logagent_ray.stages.transitions import transition_kernels
from go_logagent_ray.stages.window import wau_kernels

US_PER_DAY = 86_400_000_000


def _compose_sharded(t: pa.Table, cut_fracs: list[float], partial, merge):
    """Split → partial per batch → concat → per-shard merge → concat."""
    cuts = sorted({int(f * t.num_rows) for f in cut_fracs})
    bounds = [0] + [c for c in cuts if 0 < c < t.num_rows] + [t.num_rows]
    parts = [partial(t.slice(a, b - a))
             for a, b in zip(bounds, bounds[1:]) if b > a]
    parts = [p for p in parts if p.num_rows]
    if not parts:
        return None
    allp = pa.concat_tables(parts, promote_options="permissive")
    sh = allp.column("_shard").to_numpy(zero_copy_only=False)
    outs = [merge(allp.filter(pa.array(sh == s))) for s in np.unique(sh)]
    outs = [o for o in outs if o.num_rows]
    return pa.concat_tables(outs, promote_options="permissive") \
        if outs else None


# ------------------------------------------------------------------- wau

splits = st.lists(st.floats(min_value=0.0, max_value=1.0),
                  min_size=0, max_size=4)
shard_counts = st.sampled_from([1, 2, 7])


@st.composite
def user_day_rows(draw, max_rows=40):
    n = draw(st.integers(min_value=0, max_value=max_rows))
    users = [draw(st.one_of(st.none(), st.integers(0, 5)))
             for _ in range(n)]
    days = [draw(st.one_of(st.none(), st.integers(0, 15)))
            for _ in range(n)]
    return users, days


def _wau_table(users, days):
    ts = pa.array([None if d is None else d * US_PER_DAY + 123
                   for d in days], pa.timestamp("us"))
    return pa.table({"user_id": pa.array(users, pa.int64()), "ts": ts})


def _wau_reference(users, days, window):
    pairs = {(u, d) for u, d in zip(users, days)
             if u is not None and d is not None}
    present = sorted({d for _, d in pairs})
    return {d: len({u for u, pd_ in pairs if d - window + 1 <= pd_ <= d})
            for d in present}


@settings(max_examples=60, deadline=None)
@given(rows=user_day_rows(), cuts=splits, shards=shard_counts,
       window=st.sampled_from([1, 3, 7]))
def test_wau_composition_matches_reference(rows, cuts, shards, window):
    users, days = rows
    partial, final_shard = wau_kernels(window_days=window,
                                       merge_shards=shards)
    merged = _compose_sharded(_wau_table(users, days), cuts,
                              partial, final_shard)
    ref = _wau_reference(users, days, window)
    present = set(ref)
    if merged is None:
        assert ref == {}
        return
    df = (merged.to_pandas().groupby("day", as_index=False)["wau"].sum())
    got = {int(r.day): int(r.wau) for r in df.itertuples()
           if int(r.day) in present}
    assert got == ref


def test_wau_window_one_is_daily_distinct(ray_session):
    import ray.data as rd

    from go_logagent_ray.stages.window import rolling_active_users

    users = [1, 1, 2, 3, 3, 3, 2]
    days = [0, 0, 0, 1, 1, 5, 5]
    ds = rd.from_arrow(_wau_table(users, days))
    out = rolling_active_users(ds, window_days=1, merge_shards=3) \
        .to_pandas().set_index("day")["wau"].to_dict()
    assert out == {0: 2, 1: 1, 5: 2}


def test_wau_absent_days_not_reported(ray_session):
    """A day inside some user's trailing window but with no activity of
    its own must NOT appear (the result is calendar-bounded to present
    days) — and present days count carried-over users."""
    import ray.data as rd

    from go_logagent_ray.stages.window import rolling_active_users

    ds = rd.from_arrow(_wau_table([1, 2], [0, 4]))
    out = rolling_active_users(ds, window_days=7, merge_shards=2) \
        .to_pandas().set_index("day")["wau"].to_dict()
    assert out == {0: 1, 4: 2}


# ----------------------------------------------------------- transitions


@st.composite
def event_rows(draw, max_rows=40):
    n = draw(st.integers(min_value=0, max_value=max_rows))
    ents = [draw(st.one_of(st.none(), st.integers(0, 4)))
            for _ in range(n)]
    states = [draw(st.one_of(st.none(), st.sampled_from("abc")))
              for _ in range(n)]
    # ts intentionally has ties; event_id is the unique tiebreaker
    tss = [draw(st.one_of(st.none(), st.integers(0, 5)))
           for _ in range(n)]
    return ents, tss, states


def _trans_table(ents, tss, states):
    n = len(ents)
    return pa.table({
        "user_id": pa.array(ents, pa.int64()),
        "ts": pa.array([None if t is None else t * US_PER_DAY
                        for t in tss], pa.timestamp("us")),
        "event_id": pa.array(list(range(n)), pa.int64()),
        "event_type": pa.array(states, pa.string()),
    })


def _trans_reference(ents, tss, states):
    rows = [(e, t, i, s) for i, (e, t, s) in
            enumerate(zip(ents, tss, states))
            if e is not None and t is not None and s is not None]
    rows.sort(key=lambda r: (r[0], r[1], r[2]))
    ref: dict[tuple, int] = {}
    for prev, cur in zip(rows, rows[1:]):
        if prev[0] == cur[0]:
            k = (prev[3], cur[3])
            ref[k] = ref.get(k, 0) + 1
    return ref


@settings(max_examples=60, deadline=None)
@given(rows=event_rows(), cuts=splits, shards=shard_counts)
def test_transition_composition_matches_reference(rows, cuts, shards):
    ents, tss, states = rows
    partial, final_shard = transition_kernels(merge_shards=shards)
    merged = _compose_sharded(_trans_table(ents, tss, states), cuts,
                              partial, final_shard)
    ref = _trans_reference(ents, tss, states)
    if merged is None:
        assert ref == {}
        return
    df = (merged.to_pandas()
          .groupby(["from_type", "to_type"], as_index=False)["n"].sum())
    got = {(r.from_type, r.to_type): int(r.n) for r in df.itertuples()}
    assert got == ref


def test_transition_counts_ray(ray_session):
    import ray.data as rd

    from go_logagent_ray.stages.transitions import transition_counts

    ents = [1, 1, 1, 2, 2, 3]
    tss = [0, 1, 2, 0, 1, 0]
    states = ["a", "b", "a", "a", "a", "c"]
    ds = rd.from_arrow(_trans_table(ents, tss, states))
    out = transition_counts(ds, merge_shards=4).to_pandas()
    got = {(r.from_type, r.to_type): int(r.n) for r in out.itertuples()}
    assert got == {("a", "b"): 1, ("b", "a"): 1, ("a", "a"): 1}


# ----------------------------------------------------------------- rollup


def _rollup(ds, keys, sentinels):
    from go_logagent_ray.stages.aggregate import rollup_counts

    return rollup_counts(ds, keys, alias="n", sentinels=sentinels)


def test_rollup_matches_pandas_reference(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(7)
    langs = rng.choice(["en", "de", "fr"], 200).tolist()
    srcs = rng.choice(["web", "chat"], 200).tolist()
    t = pa.table({"lang": pa.array(langs), "source": pa.array(srcs)})
    out = _rollup(rd.from_arrow(t), ["lang", "source"],
                  {"lang": "ALL", "source": "ALL"}).to_pandas()
    df = pd.DataFrame({"lang": langs, "source": srcs})
    fine = df.groupby(["lang", "source"]).size()
    lvl1 = df.groupby("lang").size()
    exp = {(l, s): n for (l, s), n in fine.items()}
    exp |= {(l, "ALL"): n for l, n in lvl1.items()}
    exp[("ALL", "ALL")] = len(df)
    got = {(r.lang, r.source): int(r.n) for r in out.itertuples()}
    assert got == exp


def test_rollup_empty_input_emits_zero_grand_total(ray_session):
    import ray.data as rd

    t = pa.table({"lang": pa.array([], pa.string()),
                  "source": pa.array([], pa.string())})
    out = _rollup(rd.from_arrow(t), ["lang", "source"],
                  {"lang": "ALL", "source": "ALL"}).to_pandas()
    assert len(out) == 1
    assert out.iloc[0].tolist() == ["ALL", "ALL", 0]


def test_rollup_null_keys_dropped(ray_session):
    import ray.data as rd

    t = pa.table({"lang": pa.array(["en", None, "en"]),
                  "source": pa.array(["web", "web", None])})
    out = _rollup(rd.from_arrow(t), ["lang", "source"],
                  {"lang": "ALL", "source": "ALL"}).to_pandas()
    got = {(r.lang, r.source): int(r.n) for r in out.itertuples()}
    assert got == {("en", "web"): 1, ("en", "ALL"): 1, ("ALL", "ALL"): 1}


def test_rollup_narrow_and_large_key_types_upcast(ray_session):
    """Key columns whose Arrow type differs from the sentinel's
    inferred type (int32, large_string) are cast to the sentinel type
    instead of crashing the per-batch concat — the output key dtype is
    DEFINED by the sentinel (review finding: only string/int64 keys
    happened to work)."""
    import ray.data as rd

    t = pa.table({"k": pa.array([1, 1, 2], pa.int32()),
                  "s": pa.array(["a", "b", "b"], pa.large_string())})
    out = _rollup(rd.from_arrow(t), ["k", "s"],
                  {"k": -1, "s": "ALL"}).to_pandas()
    got = {(r.k, r.s): int(r.n) for r in out.itertuples()}
    assert got == {(1, "a"): 1, (1, "b"): 1, (2, "b"): 1,
                   (1, "ALL"): 2, (2, "ALL"): 1, (-1, "ALL"): 3}
    assert str(out["k"].dtype) == "int64"


def test_rollup_requires_matching_sentinels(ray_session):
    import ray.data as rd

    t = pa.table({"lang": pa.array(["en"])})
    with pytest.raises(ValueError):
        _rollup(rd.from_arrow(t), ["lang"], None)
    with pytest.raises(ValueError):
        _rollup(rd.from_arrow(t), [], {})


def test_cube_matches_pandas_reference(ray_session):
    import ray.data as rd

    from go_logagent_ray.stages.aggregate import cube_counts

    rng = np.random.default_rng(3)
    langs = rng.choice(["en", "de"], 100).tolist()
    srcs = rng.choice(["web", "chat", "mail"], 100).tolist()
    t = pa.table({"lang": pa.array(langs), "source": pa.array(srcs)})
    out = cube_counts(rd.from_arrow(t), ["lang", "source"],
                      sentinels={"lang": "ALL", "source": "ALL"}) \
        .to_pandas()
    df = pd.DataFrame({"lang": langs, "source": srcs})
    exp = {(l, s): n for (l, s), n
           in df.groupby(["lang", "source"]).size().items()}
    exp |= {(l, "ALL"): n for l, n in df.groupby("lang").size().items()}
    exp |= {("ALL", s): n for s, n in df.groupby("source").size().items()}
    exp[("ALL", "ALL")] = len(df)
    got = {(r.lang, r.source): int(r.n) for r in out.itertuples()}
    assert got == exp


def test_grouping_sets_validation(ray_session):
    import ray.data as rd

    from go_logagent_ray.stages.aggregate import grouping_sets_counts

    t = pa.table({"a": pa.array(["x"]), "b": pa.array(["y"])})
    ds = rd.from_arrow(t)
    sent = {"a": "ALL", "b": "ALL"}
    with pytest.raises(ValueError, match="not a subset"):
        grouping_sets_counts(ds, ["a", "b"], [["c"]], sentinels=sent)
    with pytest.raises(ValueError, match="duplicate"):
        grouping_sets_counts(ds, ["a", "b"], [["a"], ["a"]],
                             sentinels=sent)
    # without the empty set no grand-total row (and no seed) appears
    out = grouping_sets_counts(ds, ["a", "b"], [["a", "b"], ["a"]],
                               sentinels=sent).to_pandas()
    got = {(r.a, r.b): int(r.n) for r in out.itertuples()}
    assert got == {("x", "y"): 1, ("x", "ALL"): 1}


# ------------------------------------------------------- config registry


def test_config_transitions_stage(ray_session):
    """Transition mining composes through the config registry (X1
    parity with templates — a whole-Dataset terminal DatasetStage)."""
    from go_logagent_ray.config import Pipeline

    cfg = {
        "input": {"type": "items", "items": [
            {"u": 1, "t": 0, "i": 0, "s": "a"},
            {"u": 1, "t": 1, "i": 1, "s": "b"},
            {"u": 2, "t": 0, "i": 2, "s": "a"},
            {"u": 2, "t": 1, "i": 3, "s": "b"},
        ]},
        "filters": [{"type": "transitions", "entity": "u",
                     "order_cols": ["t", "i"], "state": "s",
                     "merge_shards": 2}],
        "outputs": [],
    }
    p = Pipeline.from_config(cfg)
    rows = {(r["from_type"], r["to_type"]): r["n"]
            for r in p.transform(p.read()).take_all()}
    assert rows == {("a", "b"): 2}


def test_config_wau_stage(ray_session):
    from go_logagent_ray.config import Pipeline

    from datetime import datetime

    cfg = {
        "input": {"type": "items", "items": [
            {"u": 1, "ts": datetime(2024, 1, 1, 5)},
            {"u": 2, "ts": datetime(2024, 1, 1, 9)},
            {"u": 1, "ts": datetime(2024, 1, 3)},
        ]},
        "filters": [{"type": "wau", "user": "u", "ts": "ts",
                     "window_days": 7, "merge_shards": 2}],
        "outputs": [],
    }
    p = Pipeline.from_config(cfg)
    rows = {r["day"]: r["wau"] for r in p.transform(p.read()).take_all()}
    d0 = 19723  # 2024-01-01 epoch day
    assert rows == {d0: 2, d0 + 2: 2}


def test_config_dsir_stage(ray_session):
    from go_logagent_ray.config import Pipeline

    cfg = {
        "input": {"type": "items", "items": [
            {"doc_id": i, "text": f"w{i % 3} common"} for i in range(9)
        ]},
        "filters": [{"type": "dsir", "k": 3, "n_buckets": 64,
                     "target_mod": 3, "hash_mode": "md5"}],
        "outputs": [],
    }
    p = Pipeline.from_config(cfg)
    rows = p.transform(p.read()).take_all()
    assert len(rows) == 3
    assert all(r["doc_id"] % 3 != 0 for r in rows)


def test_config_rollup_stage(ray_session):
    from go_logagent_ray.config import Pipeline

    cfg = {
        "input": {"type": "items", "items": [
            {"lang": "en", "source": "web"},
            {"lang": "en", "source": "chat"},
        ]},
        "filters": [{"type": "rollup", "keys": ["lang", "source"],
                     "sentinels": {"lang": "ALL", "source": "ALL"}}],
        "outputs": [],
    }
    p = Pipeline.from_config(cfg)
    rows = {(r["lang"], r["source"]): r["n"]
            for r in p.transform(p.read()).take_all()}
    assert rows == {("en", "web"): 1, ("en", "chat"): 1,
                    ("en", "ALL"): 2, ("ALL", "ALL"): 2}
