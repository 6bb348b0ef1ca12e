"""Planted-cluster k-means recovery, stratified-sample rates, and PII
redaction semantics (query-level SQL equivalence lives in
test_queries_vs_duckdb.py)."""

import numpy as np
import pyarrow as pa
import ray

from go_logagent_ray.functions.pii import PII_LINES, redact_pii
from go_logagent_ray.stages.kmeans import kmeans_fit_predict
from go_logagent_ray.stages.sample import stratified_sample


def test_kmeans_recovers_planted_clusters():
    rng = np.random.default_rng(3)
    centers = np.array([[0.0] * 8, [10.0] * 8, [-10.0] * 8])
    vecs, labels = [], []
    for i in range(300):
        c = i % 3
        vecs.append(centers[c] + rng.normal(0, 0.1, 8))
        labels.append(c)
    t = pa.table({
        "vec_id": pa.array(range(300), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32())),
    })
    out = kmeans_fit_predict(ray.data.from_arrow(t), k=3,
                             iters=5).to_pandas()
    out = out.sort_values("vec_id").reset_index(drop=True)
    # clusters must be pure: every planted group maps to one cluster id
    for c in range(3):
        got = set(out.cluster[np.array(labels) == c])
        assert len(got) == 1
    assert set(out.cluster) == {0, 1, 2}


def test_kmeans_deterministic_across_runs():
    rng = np.random.default_rng(11)
    t = pa.table({
        "vec_id": pa.array(range(64), pa.int64()),
        "embedding": pa.array(
            [list(map(float, rng.normal(0, 1, 4))) for _ in range(64)],
            pa.list_(pa.float32())),
    })
    a = kmeans_fit_predict(ray.data.from_arrow(t), k=4, iters=3).to_pandas()
    b = kmeans_fit_predict(ray.data.from_arrow(t), k=4, iters=3).to_pandas()
    assert a.sort_values("vec_id").cluster.tolist() == \
        b.sort_values("vec_id").cluster.tolist()


def test_stratified_sample_rates_and_determinism():
    t = pa.table({
        "doc_id": pa.array(range(1000), pa.int64()),
        "lang": pa.array(["en" if i % 2 == 0 else "zh"
                          for i in range(1000)], pa.string()),
    })
    ds = ray.data.from_arrow(t)
    kept = stratified_sample(ds, "doc_id", "lang",
                             rates={"en": 50}, default_percent=10,
                             method="modulo").to_pandas()
    en = kept[kept.lang == "en"]
    zh = kept[kept.lang == "zh"]
    # modulo keying on dense ids: exact rates
    assert len(en) == 250 and len(zh) == 50
    assert all(i % 100 < 50 for i in en.doc_id)
    assert all(i % 100 < 10 for i in zh.doc_id)


def test_pii_redaction_counts_and_masks():
    t = pa.table({
        "row_id": pa.array(range(len(PII_LINES)), pa.int64()),
        "text": pa.array(PII_LINES, pa.string()),
    })
    out = redact_pii(ray.data.from_arrow(t)).to_pandas() \
        .sort_values("row_id").reset_index(drop=True)
    assert out.n_email[0] == 2 and "<EMAIL>" in out.redacted[0]
    assert out.n_phone[1] == 2
    assert out.n_ip[2] == 2 and "<IP>" in out.redacted[2]
    clean = out.iloc[4]
    assert clean.n_email == clean.n_phone == clean.n_ip == 0
    assert clean.redacted == PII_LINES[4]
    # dotted phone wins over its ipv4-shaped prefix (email->phone->ip order)
    dotted = out.iloc[6]
    assert dotted.n_phone == 1 and "<PHONE>" in dotted.redacted
    assert "<IP>" not in dotted.redacted


def test_semdedup_pairs_within_clusters(ray_session):
    """Planted clusters: near-identical vectors within a cluster pair
    up; cross-cluster pairs are never emitted (the SemDeDup recall
    contract); oversized clusters fail loudly."""
    import pytest

    from go_logagent_ray.stages.dedup import semdedup_pairs

    rng = np.random.default_rng(7)
    centers = np.array([[10.0] * 4, [-10.0] * 4])
    vecs = []
    for i in range(40):
        vecs.append(centers[i % 2] + rng.normal(0, 0.05, 4))
    t = pa.table({
        "vec_id": pa.array(range(40), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32())),
    })
    out = semdedup_pairs(ray.data.from_arrow(t), threshold=0.99, k=2,
                         iters=2).to_pandas()
    # every within-cluster pair is ~cosine 1 => 2 * C(20,2) pairs
    assert len(out) == 2 * (20 * 19 // 2)
    assert ((out.doc_a % 2) == (out.doc_b % 2)).all()  # no cross-cluster
    assert (out.doc_a < out.doc_b).all()
    with pytest.raises(ValueError, match="max_cluster_size"):
        semdedup_pairs(ray.data.from_arrow(t), threshold=0.99, k=2,
                       iters=1, max_cluster_size=5).to_pandas()


def test_semdedup_blocked_matmul_finds_cross_block_pairs(ray_session):
    """Regression for the row-blocked similarity pass: with n > ~2048
    the per-cluster matmul runs in multiple row blocks; planted
    duplicate pairs whose members land in DIFFERENT blocks must still
    be found, and nothing else at 64 dims (random cosines ≪ 0.95)."""
    from go_logagent_ray.stages.dedup import semdedup_pairs

    rng = np.random.default_rng(13)
    n, d = 3000, 64
    vecs = rng.normal(0, 1, (n, d))
    vecs[2900] = vecs[10]          # pair across matmul row blocks
    vecs[2999] = vecs[1500]
    t = pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32())),
    })
    out = semdedup_pairs(ray.data.from_arrow(t), threshold=0.95, k=1,
                         iters=1).to_pandas()
    got = sorted(zip(out.doc_a, out.doc_b))
    assert got == [(10, 2900), (1500, 2999)]


def test_training_order_deterministic_and_complete(ray_session):
    """Production (polars-hash) training order: every id appears exactly
    once, positions are 0..n-1 within each shard, and the order is
    identical across runs AND partitionings (the reproducibility
    contract)."""
    import pyarrow as pa
    import ray.data as rd

    from go_logagent_ray.stages.sample import training_order

    t = pa.table({"doc_id": pa.array(range(200), pa.int64())})

    def run(parts):
        out = training_order(rd.from_arrow(t).repartition(parts),
                             shards=8, seed=3).to_pandas()
        return out.sort_values(["shard", "pos"]).reset_index(drop=True)

    a, b = run(2), run(7)
    assert a.doc_id.tolist() == b.doc_id.tolist()
    assert sorted(a.doc_id) == list(range(200))
    for _, g in a.groupby("shard"):
        assert g.pos.tolist() == list(range(len(g)))
