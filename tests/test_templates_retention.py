"""Tests for the round-5 log-analytics additions: template mining
(Drain-family), contamination n-gram overlap, and cohort retention.

Template mining gets the property treatment (pure-Python reference vs
the split→partial→shard-group→merge composition over adversarial
corpora — the sharded-merge lesson: the distributed composition, not
the happy path, is where bugs live). Contamination and retention get
planted-input Ray-level tests plus pure references.
"""

from __future__ import annotations

import datetime

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from go_logagent_ray.stages.templates import WILDCARD, template_kernels

# --------------------------------------------------------- template mining


def _templates_ref(texts: list[str | None]) -> dict[tuple[int, str], tuple[str, int]]:
    """Pure-Python reference: (n, tok0) → (template, n_docs)."""
    groups: dict[tuple[int, str], list[list[str]]] = {}
    for t in texts:
        if t is None:
            continue
        toks = t.split(" ")
        groups.setdefault((len(toks), toks[0]), []).append(toks)
    out = {}
    for (n, tok0), members in groups.items():
        pieces = []
        for p in range(n):
            vals = {m[p] for m in members}
            pieces.append(vals.pop() if len(vals) == 1 else WILDCARD)
        out[(n, tok0)] = (" ".join(pieces), len(members))
    return out


def _compose(t: pa.Table, cut_fracs: list[float], partial, merge):
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


def _run_templates(texts, cut_fracs=(0.5,), merge_shards=4):
    partial, merge = template_kernels(merge_shards=merge_shards)
    t = pa.table({"text": pa.array(texts, pa.string())})
    got = _compose(t, list(cut_fracs), partial, merge)
    if got is None:
        return {}
    return {
        (r["n_tokens"], r["template"].split(" ")[0]):
            (r["template"], r["n_docs"])
        for r in got.to_pylist()
    }


def test_templates_wildcard_positions():
    texts = [
        "error code 500 at node n1",
        "error code 404 at node n7",
        "error code 500 at node n1",
        "ok request served",
        None,
        "",
    ]
    got = _run_templates(texts)
    assert got[(6, "error")] == ("error code <*> at node <*>", 3)
    assert got[(3, "ok")] == ("ok request served", 1)
    assert got[(1, "")] == ("", 1)  # empty text = the 1-token "" group
    assert got == {
        (n, tok0): v for (n, tok0), v in _templates_ref(texts).items()
    }


def test_templates_groups_split_by_count_and_first_token():
    # same tokens, different count → different groups; same count,
    # different first token → different groups (never merged)
    texts = ["a b c", "a b", "z b c"]
    got = _run_templates(texts)
    assert got[(3, "a")] == ("a b c", 1)
    assert got[(2, "a")] == ("a b", 1)
    assert got[(3, "z")] == ("z b c", 1)


_corpus = st.lists(
    st.one_of(
        st.none(),
        st.lists(st.sampled_from(["GET", "POST", "500", "ok", "x", ""]),
                 min_size=1, max_size=5).map(" ".join)),
    min_size=0, max_size=30)


@settings(max_examples=60, deadline=None)
@given(texts=_corpus,
       cuts=st.lists(st.floats(0, 1), min_size=0, max_size=3),
       shards=st.integers(1, 5))
def test_templates_property_vs_reference(texts, cuts, shards):
    got = _run_templates(texts, cut_fracs=cuts, merge_shards=shards)
    ref = _templates_ref(texts)
    assert got == ref


def test_templates_shard_invariance():
    texts = [f"evt {i % 7} user u{i % 3}" for i in range(50)]
    a = _run_templates(texts, merge_shards=1)
    b = _run_templates(texts, merge_shards=8)
    assert a == b


def test_mine_templates_ray(ray_session):
    import ray.data as rd

    from go_logagent_ray.stages.templates import mine_templates

    texts = [f"job {i} finished in {i * 3} ms" for i in range(40)] + \
        ["job restarted", None]
    ds = rd.from_arrow(pa.table({"text": pa.array(texts, pa.string())}))
    rows = {(r["n_tokens"], r["template"]): r["n_docs"]
            for r in mine_templates(ds, merge_shards=3).take_all()}
    assert rows[(6, "job <*> finished in <*> ms")] == 40
    assert rows[(2, "job restarted")] == 1
    assert len(rows) == 2


def test_config_templates_stage(ray_session):
    """Template mining composes through the config registry (X1 parity
    with multiline/throttle — a whole-Dataset DatasetStage)."""
    from go_logagent_ray.config import Pipeline

    cfg = {
        "input": {"type": "items", "items": [
            {"text": "GET /a 200"},
            {"text": "GET /b 404"},
            {"text": "shutdown"},
        ]},
        "filters": [{"type": "templates", "merge_shards": 2}],
        "outputs": [],
    }
    p = Pipeline.from_config(cfg)
    rows = {r["template"]: r["n_docs"]
            for r in p.transform(p.read()).take_all()}
    assert rows == {"GET <*> <*>": 2, "shutdown": 1}


# -------------------------------------------------- contamination overlap


def test_contamination_overlap_planted(ray_session):
    import ray
    import ray.data as rd

    from go_logagent_ray.stages.decontaminate import (
        ContaminationOverlapStage)

    bench = ["b1 b2 b3"]
    texts = [
        "b1 b2 b3 tail",          # grams: "b1 b2 b3"(hit), "b2 b3 tail"
        "x b1 b2 b3",             # hit in the middle
        "b1 b2",                  # too short: 0 grams
        "a a a a",                # 2 distinct positions, 1 distinct gram
        None,                     # dropped (both sides filter null text)
    ]
    t = pa.table({"doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
                  "text": pa.array(texts, pa.string())})
    stage = ContaminationOverlapStage(ray.put(bench), n=3)
    got = {r["doc_id"]: (r["n_grams"], r["n_matched"])
           for r in stage(t).to_pylist()}
    assert got == {1: (2, 1), 2: (2, 1), 3: (0, 0), 4: (1, 0)}


def test_contamination_overlap_distinct_grams(ray_session):
    import ray

    from go_logagent_ray.stages.decontaminate import (
        ContaminationOverlapStage)

    # the same gram repeated counts ONCE (COUNT(DISTINCT) semantics)
    t = pa.table({"doc_id": pa.array([7], pa.int64()),
                  "text": pa.array(["p q p q p q"], pa.string())})
    stage = ContaminationOverlapStage(ray.put(["p q p"]), n=3)
    (row,) = stage(t).to_pylist()
    assert (row["n_grams"], row["n_matched"]) == (2, 1)  # "p q p", "q p q"


# -------------------------------------------------------------- retention


def test_retention_users_events(ray_session, tmp_path):
    import duckdb
    import pandas as pd

    from go_logagent_ray.pipelines.queries import (
        SQL_RETENTION_USERS_EVENTS, q_retention_users_events)

    rng = np.random.default_rng(11)
    n = 600
    base = datetime.datetime(2024, 3, 1)
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "ts": [base + datetime.timedelta(
            hours=int(h)) for h in rng.integers(0, 24 * 14, n)],
        "user_id": rng.integers(1, 40, n).astype(np.int64),
        "event_type": "e",
        "value": 0.0,
        "props": "{}",
    })
    # null edge rows must be dropped on both sides
    df.loc[0, "ts"] = None
    df.loc[1, "user_id"] = None
    df.to_parquet(tmp_path / "events.parquet", index=False)

    got = q_retention_users_events(str(tmp_path)).to_pandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM "
            f"'{tmp_path}/events.parquet'")
    ref = con.sql(SQL_RETENTION_USERS_EVENTS).df()

    key = ["cohort_day", "day_offset"]
    got = got.sort_values(key).reset_index(drop=True)
    ref = ref.sort_values(key).reset_index(drop=True)
    ref["n_users"] = ref["n_users"].astype("int64")
    assert got[key + ["n_users"]].equals(ref[key + ["n_users"]])
    # every user's first day is offset 0 exactly once per cohort census:
    # sum of offset-0 users == number of distinct users
    n_users_total = df.dropna(subset=["ts", "user_id"])["user_id"].nunique()
    assert got.loc[got.day_offset == 0, "n_users"].sum() == n_users_total
