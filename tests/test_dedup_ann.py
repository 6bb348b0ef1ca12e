"""Dedup family + ANN tests with planted duplicates / known neighbors."""

import numpy as np
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def docs_with_dups(ray_session):
    """60 base docs + exact dups + near dups (one word changed)."""
    import ray.data as rd

    rng = np.random.default_rng(3)
    vocab = np.array("alpha beta gamma delta epsilon zeta eta theta iota kappa".split())
    base = [" ".join(vocab[rng.integers(0, 10, size=30)]) for _ in range(60)]
    texts = list(base)
    texts.append(base[0])                    # exact dup of 0 -> id 60
    texts.append(base[1])                    # exact dup of 1 -> id 61
    near = base[2].split(); near[5] = "omega"
    texts.append(" ".join(near))             # near dup of 2 -> id 62
    t = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                  "text": pa.array(texts)})
    return rd.from_arrow(t), texts


def test_exact_keepers_and_distinct(docs_with_dups):
    from go_logagent_ray.stages.dedup import distinct_count, exact_keepers

    ds, texts = docs_with_dups
    keepers = sorted(r["doc_id"] for r in exact_keepers(ds).take_all())
    # 63 rows, 2 exact dups -> 61 keepers, none of which are 60/61
    assert len(keepers) == 61
    assert 60 not in keepers and 61 not in keepers
    assert distinct_count(ds) == 61


def test_exact_dedup_keeps_full_rows(docs_with_dups):
    from go_logagent_ray.stages.dedup import exact_dedup

    ds, texts = docs_with_dups
    rows = exact_dedup(ds).take_all()
    assert len(rows) == 61
    kept_texts = sorted(r["text"] for r in rows)
    assert kept_texts == sorted(set(texts))


def test_minhash_finds_planted_pairs(docs_with_dups):
    from go_logagent_ray.stages.dedup import minhash_lsh_pairs

    ds, _ = docs_with_dups
    pairs = {(r["doc_a"], r["doc_b"]) for r in
             minhash_lsh_pairs(ds, threshold=0.6).take_all()}
    assert (0, 60) in pairs
    assert (1, 61) in pairs
    assert (2, 62) in pairs  # near dup: ~27/28 shingles shared


def test_simhash_finds_exact_and_near(docs_with_dups):
    from go_logagent_ray.stages.dedup import simhash_pairs

    ds, _ = docs_with_dups
    pairs = {(r["doc_a"], r["doc_b"]) for r in
             simhash_pairs(ds, max_hamming=3).take_all()}
    assert (0, 60) in pairs and (1, 61) in pairs


def test_minhash_deterministic_across_runs(docs_with_dups):
    from go_logagent_ray.stages.dedup import minhash_lsh_pairs

    ds, _ = docs_with_dups
    a = sorted((r["doc_a"], r["doc_b"]) for r in
               minhash_lsh_pairs(ds, threshold=0.6).take_all())
    b = sorted((r["doc_a"], r["doc_b"]) for r in
               minhash_lsh_pairs(ds, threshold=0.6).take_all())
    assert a == b


@pytest.fixture(scope="module")
def embeddings_ds(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(5)
    n, d = 300, 16
    mat = rng.standard_normal((n, d)).astype(np.float32)
    emb = pa.FixedSizeListArray.from_arrays(
        pa.array(mat.reshape(-1), type=pa.float32()), d)
    t = pa.table({"vec_id": pa.array(range(n), type=pa.int64()),
                  "embedding": emb})
    return rd.from_arrow(t), mat


def _exact_topk(mat, q, k):
    nm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = nm @ nm[q]
    order = [(i, s) for i, s in enumerate(sims) if i != q]
    order.sort(key=lambda x: (-x[1], x[0]))
    return [i for i, _ in order[:k]]


def test_cosine_topk_exact(embeddings_ds):
    from go_logagent_ray.stages.ann import cosine_topk

    ds, mat = embeddings_ds
    out = cosine_topk(ds, np.array([0, 1, 2]), mat[:3], k=5).take_all()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["vec_id"]))
    for q in (0, 1, 2):
        got = [v for _, v in sorted(by_q[q])]
        assert got == _exact_topk(mat, q, 5), q


def test_lsh_topk_recall(embeddings_ds):
    from go_logagent_ray.stages.ann import lsh_topk

    ds, mat = embeddings_ds
    qids = np.arange(10)
    out = lsh_topk(ds, qids, mat[:10], k=10, dim=mat.shape[1],
                   n_planes=4, multiprobe=4).take_all()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], set()).add(r["vec_id"])
    recalls = []
    for q in range(10):
        exact = set(_exact_topk(mat, q, 10))
        got = by_q.get(q, set())
        recalls.append(len(exact & got) / 10)
    # approximate by design; with 4 planes + multiprobe 4 recall is decent
    assert np.mean(recalls) >= 0.5, recalls


def test_embedding_neardup_exact(embeddings_ds):
    from go_logagent_ray.stages.dedup import embedding_neardup_pairs

    ds, mat = embeddings_ds
    got = {(r["doc_a"], r["doc_b"]) for r in
           embedding_neardup_pairs(ds, threshold=0.5).take_all()}
    nm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = nm @ nm.T
    exp = {(i, j) for i in range(len(mat)) for j in range(i + 1, len(mat))
           if sims[i, j] >= 0.5}
    assert got == exp


def test_ngram_jaccard_exact_planted(docs_with_dups):
    import ray.data as rd
    import pyarrow as pa

    from go_logagent_ray.stages.dedup import ngram_jaccard_pairs

    ds, texts = docs_with_dups
    # add a constant group key (single co-group; 63 docs -> fine)
    with_g = ds.map_batches(
        lambda t: t.append_column("g", pa.array(["x"] * t.num_rows)),
        batch_format="pyarrow")
    pairs = {(r["doc_a"], r["doc_b"]) for r in
             ngram_jaccard_pairs(with_g, ["g"], threshold=0.8).take_all()}
    assert (0, 60) in pairs and (1, 61) in pairs  # exact dups: jaccard 1.0
    assert (2, 62) in pairs                        # near dup: ~0.86


def test_ivf_topk_recall(embeddings_ds):
    from go_logagent_ray.stages.ann import ivf_topk

    ds, mat = embeddings_ds
    qids = np.arange(10)
    out = ivf_topk(ds, qids, mat[:10], k=10, n_lists=8, nprobe=4,
                   train_sample=mat[::3]).take_all()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], set()).add(r["vec_id"])
    recalls = []
    for q in range(10):
        exact = set(_exact_topk(mat, q, 10))
        recalls.append(len(exact & by_q.get(q, set())) / 10)
    assert np.mean(recalls) >= 0.6, recalls


def test_ivf_full_probe_is_exact(embeddings_ds):
    """nprobe == n_lists scans everything -> must equal brute force."""
    from go_logagent_ray.stages.ann import ivf_topk

    ds, mat = embeddings_ds
    out = ivf_topk(ds, np.array([0, 1]), mat[:2], k=5, n_lists=4, nprobe=4,
                   train_sample=mat[::5]).take_all()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["vec_id"]))
    for q in (0, 1):
        got = [v for _, v in sorted(by_q[q])]
        assert got == _exact_topk(mat, q, 5), q


def test_simhash_odd_token_count_no_collapse():
    """Regression: uint64 vote underflow made every odd-token-count doc's
    simhash all-ones, collapsing unrelated docs to Hamming distance 0."""
    from go_logagent_ray.functions.hashing import stable_hash64
    from go_logagent_ray.stages.dedup import SimHasher

    a = SimHasher.simhash64(stable_hash64("the quick brown fox jumps over the lazy dog".split()))
    b = SimHasher.simhash64(stable_hash64("completely different words entirely unrelated to that text".split()))
    assert a != 0xFFFFFFFFFFFFFFFF and b != 0xFFFFFFFFFFFFFFFF
    assert bin(a ^ b).count("1") > 3  # unrelated docs stay far apart


def test_popcount64_matches_python():
    from go_logagent_ray.stages.dedup import _popcount64

    rng = np.random.default_rng(9)
    x = rng.integers(0, 2**63, size=257, dtype=np.uint64)
    x[0] = 0
    x[1] = np.iinfo(np.uint64).max
    got = _popcount64(x)
    exp = np.array([bin(int(v)).count("1") for v in x])
    assert (got == exp).all()


def test_minhash_pair_shards_invariant(docs_with_dups):
    """Sharded (band, bkey % K) grouping must return the identical pair
    set for any shard count (buckets never split)."""
    from go_logagent_ray.stages.dedup import minhash_lsh_pairs

    ds, _ = docs_with_dups
    one = sorted((r["doc_a"], r["doc_b"]) for r in
                 minhash_lsh_pairs(ds, threshold=0.6, pair_shards=1).take_all())
    many = sorted((r["doc_a"], r["doc_b"]) for r in
                  minhash_lsh_pairs(ds, threshold=0.6, pair_shards=16).take_all())
    assert one == many and one


def test_simhash_pair_shards_invariant(docs_with_dups):
    from go_logagent_ray.stages.dedup import simhash_pairs

    ds, _ = docs_with_dups
    one = sorted((r["doc_a"], r["doc_b"]) for r in
                 simhash_pairs(ds, pair_shards=1).take_all())
    many = sorted((r["doc_a"], r["doc_b"]) for r in
                  simhash_pairs(ds, pair_shards=16).take_all())
    assert one == many and one


def test_ngram_jaccard_lsh_verified(docs_with_dups, tmp_path):
    """Global LSH-prefiltered exact n-gram Jaccard: planted pairs found
    with exact (n_inter, n_union), background pairs rejected."""
    import pyarrow.parquet as pq

    from go_logagent_ray.stages.dedup import ngram_jaccard_pairs_lsh

    ds, texts = docs_with_dups
    path = str(tmp_path / "docs.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array(texts)}), path)
    out = {(r["doc_a"], r["doc_b"]): (r["n_inter"], r["n_union"])
           for r in ngram_jaccard_pairs_lsh(
               ds, threshold_permille=800).take_all()}
    # exact dups: identical 28-trigram sets
    assert out[(0, 60)] == (28, 28)
    assert out[(1, 61)] == (28, 28)
    # near dup of 2 (one word changed): 25 shared / 31 union = 0.806
    assert (2, 62) in out
    ni, nu = out[(2, 62)]
    assert ni * 1000 >= 800 * nu
    # broadcast_limit_bytes=0 forces the fully distributed two-pass
    # attach (the >budget regime); results must be identical
    dist = {(r["doc_a"], r["doc_b"]): (r["n_inter"], r["n_union"])
            for r in ngram_jaccard_pairs_lsh(
                ds, threshold_permille=800,
                broadcast_limit_bytes=0).take_all()}
    assert dist == out


def test_ivf_default_train_samples_corpus(embeddings_ds):
    """Regression: train_sample=None must train on a corpus prefix, not
    the (tiny) query matrix — recall at moderate nprobe stays healthy and
    full probe stays exact."""
    from go_logagent_ray.stages.ann import ivf_topk

    ds, mat = embeddings_ds
    qids = np.arange(10)
    out = ivf_topk(ds, qids, mat[:10], k=10, n_lists=8, nprobe=4).take_all()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], set()).add(r["vec_id"])
    recalls = [len(set(_exact_topk(mat, q, 10)) & by_q.get(q, set())) / 10
               for q in range(10)]
    assert np.mean(recalls) >= 0.6, recalls

    out = ivf_topk(ds, np.array([0, 1]), mat[:2], k=5, n_lists=4,
                   nprobe=4).take_all()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["vec_id"]))
    for q in (0, 1):
        assert [v for _, v in sorted(by_q[q])] == _exact_topk(mat, q, 5), q


def test_lsh_probe_all_is_exact(embeddings_ds):
    """probe_all scores every bucket exactly once -> equals brute force."""
    from go_logagent_ray.stages.ann import lsh_topk

    ds, mat = embeddings_ds
    out = lsh_topk(ds, np.array([0, 1, 2]), mat[:3], k=5, dim=mat.shape[1],
                   n_planes=4, probe_all=True).take_all()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["vec_id"]))
    for q in (0, 1, 2):
        assert [v for _, v in sorted(by_q[q])] == _exact_topk(mat, q, 5), q


def test_split_assign_deterministic_and_total(docs_with_dups):
    """Hash-keyed split: deterministic across runs, total cover, rows
    keep their split regardless of batch/partition layout."""
    from go_logagent_ray.stages.sample import sample_fraction, split_assign

    ds, texts = docs_with_dups
    a = {r["doc_id"]: r["split"]
         for r in split_assign(ds, "doc_id").take_all()}
    b = {r["doc_id"]: r["split"]
         for r in split_assign(ds.repartition(7), "doc_id").take_all()}
    assert a == b and len(a) == len(texts)
    assert set(a.values()) <= {"train", "val", "test"}

    s1 = sorted(r["doc_id"] for r in
                sample_fraction(ds, "doc_id", 30).take_all())
    s2 = sorted(r["doc_id"] for r in
                sample_fraction(ds.repartition(5), "doc_id", 30).take_all())
    assert s1 == s2
    # sampled set is a subset and roughly the right size
    assert 0 < len(s1) < len(texts)


def test_split_assign_validates():
    import pytest as _pytest

    from go_logagent_ray.stages.sample import sample_fraction, split_assign

    import ray.data as rd
    ds = rd.from_items([{"doc_id": 1}])
    with _pytest.raises(ValueError):
        split_assign(ds, "doc_id", {"train": 50, "val": 10})
    with _pytest.raises(ValueError):
        sample_fraction(ds, "doc_id", 101)


def test_ann_tie_break_with_duplicates(ray_session):
    """Regression (r2 review): equal-sim candidates at the k boundary
    must resolve by vec_id ASC, not unstable partition order — duplicated
    embeddings straddling rank k broke the exact-mode oracles."""
    import ray.data as rd

    from go_logagent_ray.stages.ann import cosine_topk, ivf_topk, lsh_topk

    rng = np.random.default_rng(11)
    base = rng.standard_normal(16).astype(np.float32)
    mat = np.vstack([np.tile(base, (30, 1)),            # ids 0..29 identical
                     rng.standard_normal((10, 16))]).astype(np.float32)
    emb = pa.FixedSizeListArray.from_arrays(
        pa.array(mat.reshape(-1), type=pa.float32()), 16)
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(range(40), type=pa.int64()), "embedding": emb}))
    q = np.array([0])

    def ranks(out):
        return [v for _, v in sorted((r["rank"], r["vec_id"]) for r in out)]

    exact = _exact_topk(mat, 0, 10)
    assert ranks(cosine_topk(ds, q, mat[:1], k=10).take_all()) == exact
    assert ranks(ivf_topk(ds, q, mat[:1], k=10, n_lists=4, nprobe=4,
                          train_sample=mat[::4]).take_all()) == exact
    assert ranks(lsh_topk(ds, q, mat[:1], k=10, dim=16, n_planes=4,
                          probe_all=True).take_all()) == exact


def test_tokenize_ascii_whitespace_parity():
    """Tokenization uses RE2's ASCII \\s set on every side: U+00A0 must
    NOT split tokens (the SQL oracle's \\s+ wouldn't either)."""
    from go_logagent_ray.stages.dedup import _ngram_strings, _tokenize_hashes
    import pyarrow as _pa

    assert _ngram_strings("a b c", 1) == ["a b", "c"]
    h, off = _tokenize_hashes(_pa.array(["a b c"]))
    assert list(np.diff(off)) == [2]


def test_sample_negative_ids_match_sql_semantics(ray_session):
    """Regression (r2 review): C-style remainder + cumulative-bound
    assignment — a negative id must land where the SQL CASE puts it
    (bucket -1 < 80 -> train, and INSIDE the <25 sample)."""
    import duckdb
    import ray.data as rd

    from go_logagent_ray.stages.sample import sample_fraction, split_assign

    ids = list(range(-5, 200))
    ds = rd.from_arrow(pa.table({"doc_id": pa.array(ids, type=pa.int64())}))
    got = {r["doc_id"]: r["split"]
           for r in split_assign(ds, "doc_id", method="modulo").take_all()}
    sampled = {r["doc_id"] for r in
               sample_fraction(ds, "doc_id", 25, method="modulo").take_all()}
    con = duckdb.connect()
    exp = dict(con.execute(
        "SELECT i, CASE WHEN i % 100 < 80 THEN 'train' "
        "WHEN i % 100 < 90 THEN 'val' ELSE 'test' END "
        "FROM (SELECT unnest(?) AS i)", [ids]).fetchall())
    exp_sample = {i for i in ids
                  if con.execute("SELECT ? % 100 < 25", [i]).fetchone()[0]}
    assert got == exp
    assert sampled == exp_sample


def test_empty_and_null_docs_never_pair(ray_session, tmp_path):
    """Regression: null/empty texts share the sentinel signature (and
    simhash 0) — they must NOT pair with each other (Jaccard over empty
    sets is undefined; the SQL oracles exclude them via nu > 0)."""
    import pyarrow.parquet as pq

    import ray.data as rd

    from go_logagent_ray.stages.dedup import (
        minhash_lsh_pairs, ngram_jaccard_pairs_lsh, simhash_pairs)

    t = pa.table({"doc_id": pa.array([1, 2, 3, 4, 5], type=pa.int64()),
                  "text": pa.array([None, "", "  ", "same doc text here",
                                    "same doc text here"])})
    ds = rd.from_arrow(t)
    mh = sorted((r["doc_a"], r["doc_b"]) for r in
                minhash_lsh_pairs(ds, threshold=0.5).take_all())
    sh = sorted((r["doc_a"], r["doc_b"]) for r in
                simhash_pairs(ds).take_all())
    assert mh == [(4, 5)]
    assert sh == [(4, 5)]

    # zero-candidate verify keeps a typed schema (Dataset API preserved)
    t2 = pa.table({"doc_id": pa.array([1, 2], type=pa.int64()),
                   "text": pa.array(["alpha beta gamma", "one two three"])})
    path = str(tmp_path / "d.parquet")
    pq.write_table(t2, path)
    out = ngram_jaccard_pairs_lsh(rd.from_arrow(t2))
    assert out.schema().names == ["doc_a", "doc_b", "n_inter", "n_union"]
    assert out.count() == 0


def test_exact_dedup_broadcast_matches_shuffle(docs_with_dups):
    from go_logagent_ray.stages.dedup import exact_dedup, exact_dedup_broadcast

    ds, texts = docs_with_dups
    a = sorted(r["doc_id"] for r in exact_dedup(ds).take_all())
    b = sorted(r["doc_id"] for r in exact_dedup_broadcast(ds).take_all())
    assert a == b and len(b) == 61


from hypothesis import given, settings
from hypothesis import strategies as st

_texts = st.lists(
    st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=1000),
            max_size=40),
    min_size=1, max_size=12)


@settings(max_examples=25, deadline=None)
@given(_texts)
def test_minhash_batch_equals_per_row(texts):
    """Property: the batched reduceat signature path equals computing
    each document's signature alone (guards the offset/segment
    indexing), including empty/whitespace-only/short docs."""
    from go_logagent_ray.stages.dedup import (
        MinHasher, _shingle_hashes, _tokenize_hashes)

    mh = MinHasher(num_perm=16)
    t = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                  "text": pa.array(texts)})
    batch_sigs = np.asarray(
        mh(t)["sig"].combine_chunks().flatten()).reshape(len(texts), 16)
    for i, txt in enumerate(texts):
        h, off = _tokenize_hashes(pa.array([txt]))
        grams, goff = _shingle_hashes(h, off, mh.ngram)
        ref = mh.signature(grams)
        assert (batch_sigs[i] == ref).all(), (i, txt)


@settings(max_examples=25, deadline=None)
@given(_texts)
def test_simhash_batch_equals_per_row(texts):
    from go_logagent_ray.stages.dedup import SimHasher, _tokenize_hashes

    sh = SimHasher()
    t = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                  "text": pa.array(texts)})
    batch = sh(t)["simhash"].to_pylist()
    for i, txt in enumerate(texts):
        h, off = _tokenize_hashes(pa.array([txt]))
        assert batch[i] == SimHasher.simhash64(h), (i, txt)


def test_charset_jaccard_distinct_path_matches_bruteforce(ray_session):
    """The distinct-charset rework must equal brute-force all-pairs
    char-set Jaccard, including same-charset cliques, cross-charset
    qualifying pairs, empty texts (never pair), and grouping keys."""
    import itertools

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from go_logagent_ray.stages.dedup import charset_jaccard_pairs

    rng = np.random.default_rng(11)
    alphabet = "abcdef"
    texts, langs = [], []
    for i in range(120):
        k = rng.integers(0, 5)
        # many repeated charsets → cliques; some empties
        texts.append("".join(rng.choice(list(alphabet), size=k)) if k else "")
        langs.append(str(rng.choice(["en", "fr"])))
    t = pa.table({"doc_id": pa.array(range(120), type=pa.int64()),
                  "lang": pa.array(langs), "text": pa.array(texts)})
    thr = 0.5
    got = sorted((r["doc_a"], r["doc_b"]) for r in charset_jaccard_pairs(
        rd.from_arrow(t), ["lang"], threshold=thr).take_all())
    exp = []
    for i, j in itertools.combinations(range(120), 2):
        if langs[i] != langs[j]:
            continue
        a, b = set(texts[i]), set(texts[j])
        u = len(a | b)
        sim = len(a & b) / u if u else 0.0
        if sim >= thr:
            exp.append((i, j))
    assert got == sorted(exp) and len(exp) > 10

    # the d² guard fails loudly instead of running quadratic work
    with pytest.raises(Exception):
        charset_jaccard_pairs(rd.from_arrow(t), ["lang"], threshold=thr,
                              max_distinct=2).materialize()


def test_triu_blocks_cover_exact_triangle():
    import numpy as np

    from go_logagent_ray.stages.dedup import _triu_blocks

    for n in (0, 1, 2, 3, 7, 50):
        for budget in (1, 5, 1000):
            ii = np.concatenate([b[0] for b in _triu_blocks(n, budget)] or
                                [np.array([], dtype=np.int64)])
            jj = np.concatenate([b[1] for b in _triu_blocks(n, budget)] or
                                [np.array([], dtype=np.int64)])
            ei, ej = np.triu_indices(n, 1)
            got = sorted(zip(ii.tolist(), jj.tolist()))
            want = sorted(zip(ei.tolist(), ej.tolist()))
            assert got == want, (n, budget)


def test_exact_dedup_is_raw_text_identity(ray_session):
    """Round-3 advice: exact dedup keys on RAW text (as its SQL oracles
    GROUP BY text) — docs differing only in case/punctuation stay
    distinct here but merge under the normalized `fingerprint` op."""
    import ray.data as rd

    from go_logagent_ray.functions.textstats import fingerprint
    from go_logagent_ray.stages.dedup import (distinct_count,
                                              exact_dedup_broadcast)

    t = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array(["Hello, world", "hello world",
                          "Hello, world", "other"]),
    })
    ds = rd.from_arrow(t)
    kept = sorted(r["doc_id"]
                  for r in exact_dedup_broadcast(ds).take_all())
    assert kept == [0, 1, 3]          # raw identity: case variant kept
    assert distinct_count(ds) == 3
    fp = fingerprint(t)["fp64"].to_pylist()
    assert fp[0] == fp[1] == fp[2]    # normalized op still merges them


def test_anti_join_ids_sharded_fallback_matches_broadcast(ray_session):
    """anti_join_ids: force the broadcast budget to 0 so the SIDE_COL
    co-group fallback runs — must agree exactly with the broadcast
    path (drop set applied, all columns preserved, duplicate drop-ids
    harmless, empty drop set is the identity)."""
    import ray.data as rd

    from go_logagent_ray.stages.dedup import anti_join_ids

    t = pa.table({
        "doc_id": pa.array(list(range(200)), pa.int64()),
        "text": pa.array([f"doc {i}" if i % 7 else None
                          for i in range(200)], pa.string()),
        "score": pa.array([i * 0.5 for i in range(200)], pa.float64()),
    })
    ds = rd.from_arrow(t).repartition(4)
    # duplicated + out-of-range drop ids exercise uniqueness + misses
    drop = rd.from_arrow(pa.table(
        {"doc_b": pa.array([3, 3, 17, 42, 42, 99, 170, 9999], pa.int64())}))

    def norm(out):
        df = out.to_pandas().sort_values("doc_id").reset_index(drop=True)
        return df

    bcast = norm(anti_join_ids(ds, drop, id_field="doc_id"))
    shard = norm(anti_join_ids(ds, drop, id_field="doc_id",
                               broadcast_limit_bytes=0, shards=5))
    assert bcast.doc_id.tolist() == shard.doc_id.tolist()
    assert bcast.text.tolist() == shard.text.tolist()
    assert bcast.score.tolist() == shard.score.tolist()
    assert len(bcast) == 200 - 5  # five real ids dropped, 9999 missed
    assert set(bcast.doc_id) & {3, 17, 42, 99, 170} == set()

    empty = rd.from_arrow(pa.table({"doc_b": pa.array([], pa.int64())}))
    assert len(norm(anti_join_ids(ds, empty))) == 200
    assert len(norm(anti_join_ids(ds, empty,
                                  broadcast_limit_bytes=0))) == 200


def test_in_sorted_i64_matches_python_set():
    """Property test for the ONE shared sorted-membership kernel every
    broadcast keeper/drop set rides on (negatives, duplicates, boundary
    values, empty sets)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from go_logagent_ray.functions.hashing import in_sorted_i64

    i64 = st.integers(min_value=-(2**62), max_value=2**62)

    @settings(max_examples=300, deadline=None)
    @given(members=st.lists(i64, max_size=50),
           probes=st.lists(i64, max_size=80))
    def check(members, probes):
        s = np.sort(np.unique(np.array(members, dtype=np.int64))) \
            if members else np.zeros(0, np.int64)
        vals = np.array(probes, dtype=np.int64)
        got = in_sorted_i64(s, vals)
        want = np.array([p in set(members) for p in probes], dtype=bool)
        assert got.tolist() == want.tolist()

    check()
