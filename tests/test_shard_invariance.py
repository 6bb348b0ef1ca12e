"""Shard-count invariance for the hash-sharded per-key merges
(throttle, multiline_join, rebuild_conversations, pack_documents):
the ``merge_shards`` knob is a pure performance parameter, so results
must be identical at 1, 7 and 64 shards AND match a pure-Python
per-key reference. Inputs are seeded-random with the adversarial
features the oracles can't reach (null keys/orders/texts, a key whose
rows span every block, a continuation-first conversation), split into
5 blocks so the merge really merges across Ray blocks.

Order values are unique per key by construction: both the operators
and the references break order ties by arrival order, which is
nondeterministic after a Ray shuffle — tie semantics are documented
as unspecified, so the tests do not probe them."""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _split_ds(ray_session, t: pa.Table, n_blocks: int = 5):
    import ray.data as rd

    step = max(1, t.num_rows // n_blocks)
    parts = [t.slice(i, step) for i in range(0, t.num_rows, step)]
    return rd.from_arrow(parts)


def _sorted_df(out) -> pd.DataFrame:
    df = out if isinstance(out, pd.DataFrame) else out.to_pandas()
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), na_position="last") \
        .reset_index(drop=True)


def _assert_same(a: pd.DataFrame, b: pd.DataFrame):
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


# ---------------------------------------------------------------- throttle

def _throttle_input(rng) -> pa.Table:
    n = 400
    user = rng.integers(0, 12, n).astype("int64")
    hour = rng.integers(0, 4, n).astype("int64")
    order = rng.permutation(n).astype("int64")  # globally unique
    user_v = user.astype(object)
    order_v = order.astype(object)
    # null keys and null orders must be dropped identically everywhere
    for i in rng.choice(n, 20, replace=False):
        user_v[i] = None
    for i in rng.choice(n, 20, replace=False):
        order_v[i] = None
    return pa.table({
        "user": pa.array(list(user_v), pa.int64()),
        "hour": pa.array(hour, pa.int64()),
        "ord": pa.array(list(order_v), pa.int64()),
        "payload": pa.array([f"p{i}" for i in range(n)], pa.string()),
    })


def _throttle_ref(t: pa.Table, k: int) -> pd.DataFrame:
    df = t.to_pandas().dropna(subset=["user", "hour", "ord"])
    df = df.sort_values("ord", kind="stable")
    return df.groupby(["user", "hour"], sort=False).head(k)


def test_throttle_shard_invariant(ray_session):
    from go_logagent_ray.stages.filters import throttle

    t = _throttle_input(np.random.default_rng(7))
    want = _sorted_df(_throttle_ref(t, 5))
    outs = []
    for shards in (1, 7, 64):
        ds = _split_ds(ray_session, t)
        out = throttle(ds, key_cols=["user", "hour"], order="ord",
                       max_per_key=5, merge_shards=shards)
        outs.append(_sorted_df(out.to_pandas()))
    _assert_same(outs[0], want)
    _assert_same(outs[1], want)
    _assert_same(outs[2], want)


# ----------------------------------------------------------- multiline_join

def _multiline_input(rng) -> pa.Table:
    n = 300
    key = rng.integers(0, 15, n).astype("int64")
    order = rng.permutation(n).astype("int64")
    texts: list[str | None] = []
    for i in range(n):
        if rng.random() < 0.05:
            texts.append(None)  # null text = its own head, joins as ''
        elif rng.random() < 0.4:
            texts.append("  at frame %d" % i)  # continuation (^\s)
        else:
            texts.append("ERROR line %d" % i)
    order_v = order.astype(object)
    for i in rng.choice(n, 12, replace=False):
        order_v[i] = None  # dropped rows
    t = pa.table({
        "key": pa.array(key, pa.int64()),
        "ord": pa.array(list(order_v), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    # adversarial: a conversation whose FIRST line is a continuation
    head = pa.table({
        "key": pa.array([99, 99], pa.int64()),
        "ord": pa.array([1, 2], pa.int64()),
        "text": pa.array(["  orphan continuation", "real head"],
                         pa.string()),
    })
    return pa.concat_tables([head, t])


def _multiline_ref(t: pa.Table) -> pd.DataFrame:
    df = t.to_pandas().dropna(subset=["ord"]).sort_values(
        ["key", "ord"], kind="stable")
    pat = re.compile(r"^\s")
    rows = []
    for key, g in df.groupby("key", sort=False):
        grp = 0
        cur: list[dict] = []
        for r in g.itertuples():
            is_cont = (r.text is not None and not pd.isna(r.text)
                       and bool(pat.match(r.text)))
            if not is_cont:
                grp += 1
            cur.append({"key": key, "event_grp": grp,
                        "ord": r.ord, "text": r.text})
        out: dict[int, dict] = {}
        for r in cur:
            e = out.setdefault(r["event_grp"], {
                "key": key, "event_grp": r["event_grp"],
                "event_idx": r["ord"], "n_lines": 0, "texts": []})
            e["event_idx"] = min(e["event_idx"], r["ord"])
            e["n_lines"] += 1
            if r["text"] is not None and not pd.isna(r["text"]):
                e["texts"].append(r["text"])
        for e in out.values():
            rows.append({"key": e["key"], "event_grp": e["event_grp"],
                         "event_idx": int(e["event_idx"]),
                         "n_lines": e["n_lines"],
                         "text": "\n".join(e["texts"])})
    return pd.DataFrame(rows)


def test_multiline_shard_invariant(ray_session):
    from go_logagent_ray.stages.filters import multiline_join

    t = _multiline_input(np.random.default_rng(11))
    ref = _multiline_ref(t)
    outs = []
    for shards in (1, 7, 64):
        ds = _split_ds(ray_session, t)
        out = multiline_join(ds, key="key", order="ord",
                             text_field="text", merge_shards=shards)
        outs.append(_sorted_df(out.to_pandas()))
    # event_grp numbering is per-key cumulative on both sides but the
    # reference starts at 1 while cum_sum starts where the first head
    # lands; compare on the invariant columns.
    inv = ["event_idx", "key", "n_lines", "text"]
    want = ref[inv].sort_values(inv).reset_index(drop=True)
    for got in outs:
        g = got[inv].sort_values(inv).reset_index(drop=True)
        _assert_same(g, want)
    # and the three shard counts agree on EVERYTHING incl. event_grp
    _assert_same(outs[0], outs[1])
    _assert_same(outs[0], outs[2])


# ---------------------------------------------------- rebuild_conversations

def _rebuild_input(rng) -> pa.Table:
    rows = []
    for conv in range(30):
        n_turns = int(rng.integers(1, 10))
        orders = rng.permutation(1000)[:n_turns]
        for j, o in enumerate(orders):
            if conv == 3:
                txt = None  # all-null conversation -> NULL digest
            elif rng.random() < 0.1:
                txt = None
            else:
                txt = f"c{conv} turn body {int(o)}"
            rows.append({"conv_id": conv, "turn_idx": int(o),
                         "text": txt})
    # one conversation with a single null order key (sorted last)
    rows.append({"conv_id": 5, "turn_idx": None, "text": "tail turn"})
    rng.shuffle(rows)
    return pa.table({
        "conv_id": pa.array([r["conv_id"] for r in rows], pa.int64()),
        "turn_idx": pa.array([r["turn_idx"] for r in rows], pa.int64()),
        "text": pa.array([r["text"] for r in rows], pa.string()),
    })


def _rebuild_ref(t: pa.Table, sep: str = "\n") -> pd.DataFrame:
    df = t.to_pandas()
    rows = []
    for conv, g in df.groupby("conv_id", sort=False):
        g = g.sort_values("turn_idx", kind="stable", na_position="last")
        texts = [x for x in g["text"] if x is not None and not pd.isna(x)]
        if texts:
            joined = sep.join(texts)
            md5 = hashlib.md5(joined.encode("utf-8")).hexdigest()
            n_chars: int | None = len(joined)
        else:
            md5, n_chars = None, None
        rows.append({"conv_id": conv, "n_turns": len(g),
                     "n_chars": n_chars, "text_md5": md5})
    return pd.DataFrame(rows)


def test_rebuild_shard_invariant(ray_session):
    from go_logagent_ray.stages.rebuild import rebuild_conversations

    t = _rebuild_input(np.random.default_rng(13))
    want = _sorted_df(
        pa.Table.from_pandas(_rebuild_ref(t), preserve_index=False))
    for shards in (1, 7, 64):
        ds = _split_ds(ray_session, t)
        out = rebuild_conversations(ds, merge_shards=shards)
        _assert_same(_sorted_df(out.to_pandas()), want)


# --------------------------------------------------------- pack_documents

def _pack_input(rng) -> pa.Table:
    ids = rng.permutation(180).astype("int64")
    texts = [" ".join(["w"] * int(rng.integers(1, 40))) for _ in ids]
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
    })


def _pack_ref(t: pa.Table, budget: int, width: int) -> pd.DataFrame:
    df = t.to_pandas()
    df["tok"] = df["text"].str.split(" ").str.len()
    df["pack_group"] = df["doc_id"] // width
    df = df.sort_values(["pack_group", "doc_id"], kind="stable")
    bins = []
    cur_grp, cur_bin, cur_tok = None, 0, 0
    for r in df.itertuples():
        if r.pack_group != cur_grp:
            cur_grp, cur_bin, cur_tok = r.pack_group, 0, 0
        elif cur_tok + r.tok > budget:
            cur_bin += 1
            cur_tok = 0
        bins.append(cur_bin)
        cur_tok += r.tok
    df["bin_idx"] = bins
    return df[["doc_id", "pack_group", "bin_idx", "tok"]]


def test_pack_shard_invariant(ray_session):
    from go_logagent_ray.stages.pack import pack_documents

    t = _pack_input(np.random.default_rng(17))
    want = _sorted_df(
        pa.Table.from_pandas(_pack_ref(t, 50, 8), preserve_index=False))
    for shards in (1, 7, 64):
        ds = _split_ds(ray_session, t)
        out = pack_documents(ds, budget=50, group_width=8,
                             merge_shards=shards)
        _assert_same(_sorted_df(out.to_pandas()), want)


# ------------------------------------------------- reserved-column guards

def test_shard_column_reserved(ray_session):
    """throttle passes ALL input columns through, so an input `_shard`
    collides with its merge key and must fail loudly (per batch — not
    via ds.schema(), which is None on schema-less inputs and forces
    eager execution). The select-based operators (multiline, rebuild,
    pack) consume only their named columns: an input `_shard` is
    dropped, never clobbered, and the operator succeeds."""
    import ray.data as rd

    from go_logagent_ray.stages.filters import multiline_join, throttle
    from go_logagent_ray.stages.rebuild import rebuild_conversations

    t = pa.table({"key": pa.array([1], pa.int64()),
                  "ord": pa.array([1], pa.int64()),
                  "text": pa.array(["x"], pa.string()),
                  "_shard": pa.array([0], pa.int32())})
    ds = rd.from_arrow(t)
    # the guard now fires inside the batch fn, so Ray 2.49 delivers it
    # wrapped (RayTaskError(UserCodeException)) — match on the message
    with pytest.raises(Exception, match="_shard"):
        throttle(ds, key_cols=["key"], order="ord",
                 max_per_key=1).take_all()

    got = multiline_join(rd.from_arrow(t), key="key",
                         order="ord").take_all()
    assert [r["text"] for r in got] == ["x"]
    assert all("_shard" not in r for r in got)

    got = rebuild_conversations(rd.from_arrow(t), conv_col="key",
                                order_col="ord").take_all()
    assert len(got) == 1 and got[0]["n_turns"] == 1
    assert "_shard" not in got[0]


def test_schemaless_empty_input(ray_session):
    """A fully-filtered upstream yields a dataset whose .schema() is
    None; the sharded operators must build lazily and return zero rows
    instead of crashing at construction (and must not force eager
    execution of the upstream plan while being constructed)."""
    import ray.data as rd

    from go_logagent_ray.stages.filters import multiline_join, throttle
    from go_logagent_ray.stages.rebuild import rebuild_conversations

    t = pa.table({"key": pa.array([1, 2], pa.int64()),
                  "ord": pa.array([1, 2], pa.int64()),
                  "text": pa.array(["x", "y"], pa.string())})

    def empty_ds():
        return rd.from_arrow(t).filter(lambda r: False)

    assert throttle(empty_ds(), key_cols=["key"], order="ord",
                    max_per_key=1).count() == 0
    assert multiline_join(empty_ds(), key="key", order="ord").count() == 0
    assert rebuild_conversations(empty_ds(), conv_col="key",
                                 order_col="ord").count() == 0


def test_null_key_groups_pinned(ray_session):
    """Null KEY rows are kept as ONE group by multiline_join and
    rebuild_conversations (throttle alone documents drop-null-key
    semantics). polars hashes null to one defined value and group_by
    keeps a null group — pin that a null-key conversation neither
    splits nor disappears, at several shard counts, so an engine
    upgrade changing null-hash/sort placement fails here instead of
    silently."""
    from go_logagent_ray.stages.filters import multiline_join
    from go_logagent_ray.stages.rebuild import rebuild_conversations

    t = pa.table({
        "key": pa.array([None, None, None, 7, 7], pa.int64()),
        "ord": pa.array([10, 11, 12, 1, 2], pa.int64()),
        "text": pa.array(["head A", "  cont A", "head B",
                          "head C", "  cont C"], pa.string()),
    })
    for shards in (1, 5):
        out = _sorted_df(multiline_join(
            _split_ds(ray_session, t, 3), key="key", order="ord",
            merge_shards=shards).to_pandas())
        # null key: two events (head A+cont, head B); key 7: one event
        nul = out[out["key"].isna()]
        assert list(nul["text"]) == ["head A\n  cont A", "head B"]
        assert list(out[out["key"] == 7]["text"]) == ["head C\n  cont C"]

        got = rebuild_conversations(
            _split_ds(ray_session, t, 3), conv_col="key",
            order_col="ord", text_col="text",
            merge_shards=shards).to_pandas()
        nul = got[got["key"].isna()]
        assert len(nul) == 1 and int(nul["n_turns"].iloc[0]) == 3
        md5 = hashlib.md5(
            "head A\n  cont A\nhead B".encode()).hexdigest()
        assert nul["text_md5"].iloc[0] == md5
