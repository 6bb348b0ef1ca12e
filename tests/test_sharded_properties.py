"""Hypothesis property tests for the four hash-sharded merge operators
(throttle, multiline codec, conversation rebuild, sequence packing).

The distributed composition is simulated LOCALLY — split the input at
arbitrary points → run the partial kernel per batch → concatenate →
group by ``_shard`` → run the merge kernel per shard group — and the
result is compared against a single-pass pure-Python reference over
adversarial inputs (null keys / orders / texts, arbitrary split points,
shard counts 1..8). No Ray session: the kernels are the module-level
factories the stages themselves compose
(``stages.filters.multiline_kernels`` / ``throttle_kernels``,
``stages.rebuild.rebuild_kernels``, ``stages.pack.pack_kernels``), so
anything pinned here holds for the Ray pipeline by construction — the
repo's experience is that property tests against pure references find
the bugs oracle gates miss (testdata lacks the edge inputs).

Order values are generated UNIQUE per table: with duplicate (key,
order) pairs the surviving/join order is stable-sort arrival order,
which Ray's nondeterministic block arrival legitimately scrambles —
uniqueness is the documented determinism precondition. Text alphabets
stay ASCII(+tab): the operator contract is the Rust regex/polars ``\\s``
class, and exotic control chars (\\x1c-\\x1f) are whitespace to Python
``re`` but not to Rust's Unicode White_Space — an engine-definition
difference, not an operator property.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from go_logagent_ray.stages.filters import multiline_kernels, throttle_kernels
from go_logagent_ray.stages.pack import pack_kernels
from go_logagent_ray.stages.rebuild import rebuild_kernels


def _compose(t: pa.Table, cut_fracs: list[float], partial, merge):
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
    outs = []
    for s in np.unique(sh):
        g = merge(allp.filter(pa.array(sh == s)))
        if g.num_rows:
            outs.append(g)
    return pa.concat_tables(outs, promote_options="permissive") \
        if outs else None


def _sort_key(row):
    return tuple((v is None, v) for v in row)


# --------------------------------------------------------------- strategies

splits = st.lists(st.floats(min_value=0.0, max_value=1.0),
                  min_size=0, max_size=5)
shard_counts = st.sampled_from([1, 2, 3, 8])


@st.composite
def keyed_rows(draw, max_rows=40, key_pool=5, with_null_keys=True,
               text_alpha=" \tabEF"):
    """(keys, orders, texts): orders unique-or-None, keys int-or-None,
    texts str-or-None over an ASCII alphabet with whitespace heads."""
    n = draw(st.integers(min_value=0, max_value=max_rows))
    keys = [draw(st.one_of(st.none(), st.integers(0, key_pool - 1)))
            if with_null_keys else draw(st.integers(0, key_pool - 1))
            for _ in range(n)]
    order_vals = draw(st.permutations(list(range(n))))
    null_orders = draw(st.sets(st.integers(0, n - 1), max_size=3)) \
        if n else set()
    orders = [None if i in null_orders else int(order_vals[i])
              for i in range(n)]
    texts = [draw(st.one_of(st.none(),
                            st.text(alphabet=text_alpha, max_size=6)))
             for _ in range(n)]
    return keys, orders, texts


def _table(keys, orders, texts):
    return pa.table({"k": pa.array(keys, pa.int64()),
                     "o": pa.array(orders, pa.int64()),
                     "t": pa.array(texts, pa.string())})


# ----------------------------------------------------------------- throttle

def _throttle_ref(keys, orders, texts, k):
    rows = [(ky, o, tx) for ky, o, tx in zip(keys, orders, texts)
            if ky is not None and o is not None]
    rows.sort(key=lambda r: r[1])
    seen: dict[int, int] = {}
    out = []
    for ky, o, tx in rows:
        if seen.get(ky, 0) < k:
            seen[ky] = seen.get(ky, 0) + 1
            out.append((ky, o, tx))
    return sorted(out, key=_sort_key)


@settings(max_examples=60, deadline=None)
@given(rows=keyed_rows(), cuts=splits, shards=shard_counts,
       k=st.integers(1, 3))
def test_throttle_composition_matches_reference(rows, cuts, shards, k):
    keys, orders, texts = rows
    partial, merge = throttle_kernels(key_cols=["k"], order="o",
                                      max_per_key=k, merge_shards=shards)
    got = _compose(_table(keys, orders, texts), cuts, partial, merge)
    got_rows = sorted(
        [(r["k"], r["o"], r["t"]) for r in got.to_pylist()],
        key=_sort_key) if got is not None else []
    assert got_rows == _throttle_ref(keys, orders, texts, k)


# ----------------------------------------------------------- multiline_join

def _multiline_ref(keys, orders, texts, pattern=r"^\s"):
    """Single-pass reference: per key (None is a key), rows in order;
    a row whose text matches the pattern continues the current event;
    null text or a non-match starts a new event. Null-order rows drop.
    Returns {(key, event_idx, n_lines, joined_text)}."""
    pat = re.compile(pattern)
    per_key: dict = {}
    rows = [(ky, o, tx) for ky, o, tx in zip(keys, orders, texts)
            if o is not None]
    rows.sort(key=lambda r: ((r[0] is None, r[0]), r[1]))
    events = []
    for ky, o, tx in rows:
        is_cont = tx is not None and bool(pat.match(tx))
        cur = per_key.get(ky)
        if cur is None or not is_cont:
            cur = {"key": ky, "event_idx": o, "n_lines": 0, "texts": []}
            per_key[ky] = cur
            events.append(cur)
        cur["event_idx"] = min(cur["event_idx"], o)
        cur["n_lines"] += 1
        if tx is not None:
            cur["texts"].append(tx)
    return sorted(
        ((e["key"], e["event_idx"], e["n_lines"], "\n".join(e["texts"]))
         for e in events), key=_sort_key)


@settings(max_examples=60, deadline=None)
@given(rows=keyed_rows(), cuts=splits, shards=shard_counts)
def test_multiline_composition_matches_reference(rows, cuts, shards):
    keys, orders, texts = rows
    add_shard, per_shard = multiline_kernels(
        key="k", order="o", text_field="t", pattern=r"^\s",
        out_group="grp", merge_shards=shards)
    got = _compose(_table(keys, orders, texts), cuts, add_shard,
                   per_shard)
    got_rows = sorted(
        [(r["k"], r["event_idx"], r["n_lines"], r["t"])
         for r in got.to_pylist()], key=_sort_key) \
        if got is not None else []
    assert got_rows == _multiline_ref(keys, orders, texts)


# ---------------------------------------------------- rebuild_conversations

def _rebuild_ref(keys, orders, texts, sep="\n"):
    """Per conv (None is a conv): stable sort by order with nulls LAST,
    join non-null texts, md5; all-null text -> (None, None)."""
    convs: dict = {}
    order_all = []
    for i, (ky, o, tx) in enumerate(zip(keys, orders, texts)):
        order_all.append((ky, (o is None, o, i), tx))
    order_all.sort(key=lambda r: ((r[0] is None, r[0]), r[1]))
    for ky, _, tx in order_all:
        c = convs.setdefault(ky, {"n": 0, "texts": []})
        c["n"] += 1
        if tx is not None:
            c["texts"].append(tx)
    out = []
    for ky, c in convs.items():
        if c["texts"]:
            j = sep.join(c["texts"])
            out.append((ky, c["n"], len(j),
                        hashlib.md5(j.encode()).hexdigest()))
        else:
            out.append((ky, c["n"], None, None))
    return sorted(out, key=_sort_key)


@settings(max_examples=60, deadline=None)
@given(rows=keyed_rows(), cuts=splits, shards=shard_counts)
def test_rebuild_composition_matches_reference(rows, cuts, shards):
    keys, orders, texts = rows
    add_shard, per_shard = rebuild_kernels(
        conv_col="k", order_col="o", text_col="t", sep="\n",
        merge_shards=shards)
    got = _compose(_table(keys, orders, texts), cuts, add_shard,
                   per_shard)
    got_rows = sorted(
        [(r["k"], r["n_turns"], r["n_chars"], r["text_md5"])
         for r in got.to_pylist()], key=_sort_key) \
        if got is not None else []
    assert got_rows == _rebuild_ref(keys, orders, texts)


# --------------------------------------------------------- pack_documents

@st.composite
def pack_rows(draw, max_rows=40):
    n = draw(st.integers(min_value=0, max_value=max_rows))
    ids = draw(st.lists(st.integers(-50, 200), min_size=n, max_size=n,
                        unique=True))
    toks = [draw(st.integers(0, 30)) for _ in range(n)]
    texts = [" ".join(["w"] * c) for c in toks]  # "" -> 1 token
    return ids, texts


def _pack_ref(ids, texts, budget, width):
    rows = sorted(
        ((i // width, i, len(t.split(" "))) for i, t in zip(ids, texts)))
    out = []
    cur_grp, cur_bin, cur_tok = None, 0, 0
    for grp, i, tok in rows:
        if grp != cur_grp:
            cur_grp, cur_bin, cur_tok = grp, 0, 0
        elif cur_tok + tok > budget:
            cur_bin += 1
            cur_tok = 0
        out.append((i, grp, cur_bin, tok))
        cur_tok += tok
    return sorted(out)


@settings(max_examples=60, deadline=None)
@given(rows=pack_rows(), cuts=splits, shards=shard_counts,
       budget=st.integers(1, 60), width=st.integers(1, 16))
def test_pack_composition_matches_reference(rows, cuts, shards, budget,
                                            width):
    ids, texts = rows
    toks, pack = pack_kernels(budget=budget, group_width=width,
                              text_field="t", id_field="i",
                              merge_shards=shards)
    t = pa.table({"i": pa.array(ids, pa.int64()),
                  "t": pa.array(texts, pa.string())})
    got = _compose(t, cuts, toks, pack)
    got_rows = sorted(
        (r["i"], r["pack_group"], r["bin_idx"], r["tok"])
        for r in got.to_pylist()) if got is not None else []
    assert got_rows == _pack_ref(ids, texts, budget, width)
