"""Distributed BPE training (`stages/bpe.py`) vs an independent
pure-Python reference: merge choices, tie-breaks, per-position pair
counts, and leftmost-non-overlapping application (run-parity kernel)."""

from collections import Counter

import numpy as np
import pyarrow as pa
import ray


def _ref_bpe(texts, rounds):
    wc = Counter()
    for t in texts:
        if t is None:
            continue
        for w in t.split(" "):
            if w:
                wc[w] += 1
    words = {w: list(w) for w in wc}
    out = []
    for r in range(1, rounds + 1):
        pc_ = Counter()
        for w, syms in words.items():
            for i in range(len(syms) - 1):
                pc_[(syms[i], syms[i + 1])] += wc[w]
        if not pc_:
            break
        (lhs, rhs), n = sorted(pc_.items(),
                               key=lambda kv: (-kv[1], kv[0]))[0]
        out.append((r, lhs, rhs, lhs + rhs, n))
        for w, syms in words.items():
            new, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == lhs \
                        and syms[i + 1] == rhs:
                    new.append(lhs + rhs)
                    i += 2
                else:
                    new.append(syms[i])
                    i += 1
            words[w] = new
    return out


def _train(texts, rounds, parts=5):
    from go_logagent_ray.stages.bpe import bpe_train

    t = pa.table({"text": pa.array(texts, pa.string())})
    got = bpe_train(ray.data.from_arrow(t).repartition(parts),
                    rounds=rounds).to_pandas()
    return [tuple(x) for x in zip(got["round"], got.lhs, got.rhs,
                                  got.merged, got.pair_n)]


def test_merge_apply_overlap_parity():
    """[a,a,a] merges to [aa,a]; [a,a,a,a] to [aa,aa]; x!=y merges all
    occurrences; other words untouched."""
    from go_logagent_ray.stages.bpe import merge_apply

    t = pa.table({
        "sym": pa.array([["x", "y", "x", "y"], ["a", "a", "a"], ["a"],
                         ["a", "a", "a", "a"]],
                        pa.list_(pa.large_string())),
        "cnt": pa.array([2, 3, 1, 1], pa.int64()),
    })
    assert merge_apply(t, "a", "a")["sym"].to_pylist() == \
        [["x", "y", "x", "y"], ["aa", "a"], ["a"], ["aa", "aa"]]
    assert merge_apply(t, "x", "y")["sym"].to_pylist() == \
        [["xy", "xy"], ["a", "a", "a"], ["a"], ["a", "a", "a", "a"]]


def test_bpe_overlap_stress_corpus(ray_session):
    rng = np.random.default_rng(2)
    vocab = ["aaaa", "aaab", "abab", "bbaa", "xy", "xyxy", "aaa", "a", ""]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(1, 9)))
             for _ in range(300)] + [None, ""]
    assert _train(texts, 5) == _ref_bpe(texts, 5)


def test_bpe_random_corpora_match_reference(ray_session):
    for seed in (3, 4, 5):
        rng = np.random.default_rng(seed)
        alphabet = list("abcde")
        words = ["".join(rng.choice(alphabet, size=rng.integers(1, 7)))
                 for _ in range(30)]
        texts = [" ".join(rng.choice(words, size=rng.integers(0, 12)))
                 for _ in range(200)]
        assert _train(texts, 4, parts=seed) == _ref_bpe(texts, 4), seed


def test_bpe_exhausts_when_no_pairs_remain(ray_session):
    # single-char words only: zero adjacent pairs → zero merge rows
    assert _train(["a b c", "a a"], 3) == []


def _ref_vocab(texts, rounds, top):
    wc = Counter()
    for t in texts:
        if t is None:
            continue
        for w in t.split(" "):
            if w:
                wc[w] += 1
    words = {w: list(w) for w in wc}
    merges = _ref_bpe(texts, rounds)
    for _, lhs, rhs, _, _ in merges:
        for w, syms in words.items():
            new, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == lhs \
                        and syms[i + 1] == rhs:
                    new.append(lhs + rhs)
                    i += 2
                else:
                    new.append(syms[i])
                    i += 1
            words[w] = new
    tc = Counter()
    for w, syms in words.items():
        for s in syms:
            tc[s] += wc[w]
    return sorted(tc.items(), key=lambda kv: (-kv[1], kv[0]))[:top]


def test_bpe_vocab_matches_reference(ray_session):
    from go_logagent_ray.stages.bpe import bpe_vocab

    rng = np.random.default_rng(6)
    vocab = ["aaaa", "abab", "xy", "xyxy", "aab", "ba"]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(1, 8)))
             for _ in range(200)] + [None, ""]
    t = pa.table({"text": pa.array(texts, pa.string())})
    got = bpe_vocab(ray.data.from_arrow(t).repartition(4),
                    rounds=3, top=10).to_pandas()
    assert list(zip(got.token, got.n)) == _ref_vocab(texts, 3, 10)


def test_bpe_token_counts_match_reference(ray_session):
    from go_logagent_ray.stages.bpe import bpe_token_counts

    rng = np.random.default_rng(8)
    vocab = ["aaaa", "abab", "xy", "xyxy", "aab", "ba", "q"]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(1, 8)))
             for _ in range(150)] + [None, ""]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    got = bpe_token_counts(ray.data.from_arrow(t).repartition(4),
                           rounds=3).to_pandas().sort_values("doc_id")

    # reference: replay merges on fresh words, then count per doc
    merges = _ref_bpe(texts, 3)
    def encode(word):
        syms = list(word)
        for _, lhs, rhs, _, _ in merges:
            new, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == lhs \
                        and syms[i + 1] == rhs:
                    new.append(lhs + rhs); i += 2
                else:
                    new.append(syms[i]); i += 1
            syms = new
        return len(syms)
    exp = {i: sum(encode(w) for w in tx.split(" ") if w)
           for i, tx in enumerate(texts) if tx is not None}
    assert dict(zip(got.doc_id, got.n_tokens)) == exp


def test_bpe_token_counts_distributed_fallback(ray_session):
    """Force the broadcast budget to 0 so the SIDE_COL co-group attach
    path runs (the 100 TB regime where the word map exceeds the object
    store broadcast budget) — must agree exactly with the broadcast
    path / pure-Python reference, including the n_tokens=0 rows for
    empty-text docs."""
    from go_logagent_ray.stages.bpe import bpe_token_counts

    rng = np.random.default_rng(11)
    vocab = ["aaaa", "abab", "xy", "xyxy", "aab", "ba", "q"]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(1, 8)))
             for _ in range(120)] + [None, "", "   "]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    ds = ray.data.from_arrow(t).repartition(4)
    bcast = bpe_token_counts(ds, rounds=3).to_pandas()
    dist = bpe_token_counts(ds, rounds=3, broadcast_limit_bytes=0,
                            word_shards=7).to_pandas()
    assert dict(zip(dist.doc_id, dist.n_tokens)) == \
        dict(zip(bcast.doc_id, bcast.n_tokens))
    assert len(dist) == len(bcast)
