"""Connected components (dedup clustering) vs a driver-side union-find
reference on seeded random graphs, chains (worst-case diameter), and a
hot-hub star."""

import numpy as np
import pyarrow as pa
import pytest
import ray

from go_logagent_ray.stages.cluster import connected_components


def _union_find(n_nodes, edges):
    parent = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    out = {}
    for a, b in edges:
        out[a] = find(a)
        out[b] = find(b)
    return out


def _run(edges, broadcast_limit=0):
    """broadcast_limit=0 forces the distributed star-round path (the
    default hybrid would finish these tiny graphs with the streamed
    union-find immediately)."""
    t = pa.table({"doc_a": pa.array([a for a, _ in edges], pa.int64()),
                  "doc_b": pa.array([b for _, b in edges], pa.int64())})
    ds = ray.data.from_arrow(t)
    res = connected_components(ds, num_partitions=4,
                               broadcast_limit=broadcast_limit).to_pandas()
    return dict(zip(res["node"].astype(int), res["rep"].astype(int)))


def test_random_graph_matches_union_find():
    rng = np.random.default_rng(7)
    edges = [(int(a), int(b)) for a, b in rng.integers(0, 200, (300, 2))
             if a != b]
    assert _run(edges) == _union_find(200, edges)


def test_hybrid_broadcast_path_matches_star_path():
    rng = np.random.default_rng(21)
    edges = [(int(a), int(b)) for a, b in rng.integers(0, 150, (200, 2))
             if a != b]
    want = _union_find(150, edges)
    assert _run(edges, broadcast_limit=2_000_000) == want


def test_hybrid_contracts_then_streams():
    # limit sized so the loop runs at least one star round before the
    # streamed finisher takes over (2 * edges > limit initially)
    edges = [(i, i + 1) for i in range(60)]
    got = _run(edges, broadcast_limit=40)
    assert set(got.values()) == {0} and len(got) == 61


def test_chain_worst_case_diameter():
    edges = [(i, i + 1) for i in range(40)]
    got = _run(edges)
    assert set(got.values()) == {0}
    assert len(got) == 41


def test_hot_hub_star_and_disjoint_pairs():
    edges = [(500, i) for i in range(100)] + [(1000, 1001), (2000, 2001)]
    got = _run(edges)
    assert got[500] == 0 and got[99] == 0
    assert got[1001] == 1000 and got[2001] == 2000


def test_self_loops_and_duplicates_tolerated():
    edges = [(3, 3), (1, 2), (2, 1), (1, 2)]
    got = _run(edges)
    assert got == {1: 1, 2: 1}


def test_empty_pairs():
    t = pa.table({"doc_a": pa.array([], pa.int64()),
                  "doc_b": pa.array([], pa.int64())})
    res = connected_components(ray.data.from_arrow(t), num_partitions=4).to_pandas()
    assert len(res) == 0
