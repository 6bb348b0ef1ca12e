"""Text-analysis kernels for training-data pipelines (all vectorized).

Beyond the reference's scope (a log agent has no corpus analytics); these
are the operations a 100 TB training-data pipeline needs, expressed as
Arrow-kernel batch functions usable inside ``map_batches``:

- token counting (regex word tokens, BPE-ish sub-token estimate)
- quality scoring (length / punctuation / stopword / word-length stats)
- language ID (vectorized stopword-hit + CJK-codepoint heuristic)
- document fingerprinting (normalized content hash, vectorized via polars)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .arrow_utils import as_combined, set_column

WORD_RE = r"[A-Za-z0-9]+"
PUNCT_RE = r"[.,;:!?]"
# BPE-ish: words are ~1 token per 4 chars, rounded up, min 1 per word
BPE_CHARS_PER_TOKEN = 4

STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that", "it", "for"],
    "de": ["der", "die", "und", "nicht", "das", "ist", "ein", "mit", "von", "zu"],
    "fr": ["le", "la", "et", "les", "des", "est", "une", "dans", "que", "pour"],
    "es": ["el", "la", "y", "de", "que", "en", "los", "una", "por", "con"],
}
_LANG_PATTERNS = {
    lang: r"(?i)\b(?:" + "|".join(words) + r")\b" for lang, words in STOPWORDS.items()
}
_CJK_RE = r"[\x{4e00}-\x{9fff}]"  # RE2 codepoint-class syntax


def token_stats(batch: pa.Table, field: str = "text") -> pa.Table:
    """Adds n_words:int64, n_chars_text:int64, est_tokens:int64."""
    col = as_combined(batch[field])
    n_words = pc.cast(pc.count_substring_regex(col, pattern=WORD_RE), pa.int64())
    n_chars = pc.cast(pc.utf8_length(col), pa.int64())
    est = pc.cast(
        pc.ceil(pc.divide(pc.cast(n_chars, pa.float64()), BPE_CHARS_PER_TOKEN)),
        pa.int64(),
    )
    batch = set_column(batch, "n_words", n_words)
    batch = set_column(batch, "n_chars_text", n_chars)
    batch = set_column(batch, "est_tokens", pc.max_element_wise(est, n_words))
    return batch


def quality_stats(batch: pa.Table, field: str = "text") -> pa.Table:
    """Adds n_punct, avg_word_len, stop_ratio_en, quality_score columns.

    quality_score is a simple bounded heuristic in [0,1]: longer docs with
    normal word lengths and some stopwords score higher — the standard
    cheap pre-filter shape for corpus curation.
    """
    col = as_combined(batch[field])
    n_words = pc.cast(pc.count_substring_regex(col, pattern=WORD_RE), pa.int64())
    n_punct = pc.cast(pc.count_substring_regex(col, pattern=PUNCT_RE), pa.int64())
    word_chars = pc.cast(
        pc.utf8_length(
            pc.replace_substring_regex(col, pattern=r"[^A-Za-z0-9]", replacement="")
        ),
        pa.int64(),
    )
    nw_f = pc.cast(pc.max_element_wise(n_words, 1), pa.float64())
    avg_wl = pc.divide(pc.cast(word_chars, pa.float64()), nw_f)
    stops = pc.cast(pc.count_substring_regex(col, pattern=_LANG_PATTERNS["en"]),
                    pa.float64())
    stop_ratio = pc.divide(stops, nw_f)

    nw = nw_f.to_numpy(zero_copy_only=False)
    awl = avg_wl.to_numpy(zero_copy_only=False)
    sr = stop_ratio.to_numpy(zero_copy_only=False)
    with np.errstate(invalid="ignore"):
        score = (
            np.clip(nw / 100.0, 0, 1) * 0.4
            + np.where((awl >= 3) & (awl <= 10), 0.3, 0.0)
            + np.clip(sr / 0.4, 0, 1) * 0.3
        )
    batch = set_column(batch, "n_punct", n_punct)
    batch = set_column(batch, "avg_word_len", avg_wl)
    batch = set_column(batch, "stop_ratio_en", stop_ratio)
    batch = set_column(batch, "quality_score", pa.array(score, type=pa.float64()))
    return batch


def repetition_stats(batch: pa.Table, field: str = "text") -> pa.Table:
    """Gopher-style repetition quality signals per document (the
    duplicate-n-gram family of filters from the Gopher/MassiveText
    curation recipe), INTEGER components only so the oracle hash is
    exact; consumers derive the fractions (dup_bigrams/n_bigrams,
    top_bigram_n/n_bigrams) themselves.

    Adds: n_toks (whitespace tokens), n_bigrams (bigram occurrences),
    dup_bigrams (occurrences belonging to a bigram seen >1 time in the
    doc), top_bigram_n (count of the doc's most frequent bigram),
    uniq_bigrams (distinct bigrams). All int64; 0 for docs with <2
    tokens. Tokenization is the shared ``_tokenize_flat`` (lowercase +
    ASCII-whitespace split) so the SQL oracle's string_split_regex
    matches bit-identically.

    Fully vectorized: one polars group_by over (row, bigram) per batch;
    per-doc work only, no shuffle — embarrassingly parallel at 100 TB.
    """
    import polars as pl

    from ..stages.dedup import _tokenize_flat

    n = batch.num_rows
    flat, offsets = _tokenize_flat(batch[field])
    lens = np.diff(offsets)
    n_toks = lens.astype(np.int64)
    n_big = np.zeros(n, dtype=np.int64)
    dup_big = np.zeros(n, dtype=np.int64)
    top_big = np.zeros(n, dtype=np.int64)
    uniq_big = np.zeros(n, dtype=np.int64)
    if len(flat) > 1:
        row_of = np.repeat(np.arange(n), lens)
        # position i starts a bigram iff i+1 is in the same row
        starts = np.nonzero(row_of[:-1] == row_of[1:])[0]
        if starts.size:
            bg = (flat.gather(starts) + " " + flat.gather(starts + 1))
            per = (
                pl.DataFrame({"row": row_of[starts], "bg": bg})
                .group_by(["row", "bg"]).len()
                .group_by("row")
                .agg(
                    n_big=pl.col("len").sum(),
                    dup_big=pl.col("len").filter(pl.col("len") > 1).sum(),
                    top_big=pl.col("len").max(),
                    uniq_big=pl.len(),
                )
            )
            rows = per["row"].to_numpy()
            n_big[rows] = per["n_big"].to_numpy()
            dup_big[rows] = per["dup_big"].fill_null(0).to_numpy()
            top_big[rows] = per["top_big"].to_numpy()
            uniq_big[rows] = per["uniq_big"].to_numpy()
    for name, arr in (("n_toks", n_toks), ("n_bigrams", n_big),
                      ("dup_bigrams", dup_big), ("top_bigram_n", top_big),
                      ("uniq_bigrams", uniq_big)):
        batch = set_column(batch, name, pa.array(arr, type=pa.int64()))
    return batch


def lang_id(batch: pa.Table, field: str = "text", out: str = "pred_lang") -> pa.Table:
    """Vectorized n-gram/stopword language ID over {en,de,fr,es,zh}.

    One count_substring_regex pass per language (alternation of its top
    stopwords), CJK codepoint presence for zh; argmax wins, "und"
    (undetermined) when nothing scores.
    """
    col = as_combined(batch[field])
    n = batch.num_rows
    langs = list(_LANG_PATTERNS)
    scores = np.zeros((len(langs), n), dtype=np.float64)
    for i, lang in enumerate(langs):
        c = pc.count_substring_regex(col, pattern=_LANG_PATTERNS[lang])
        scores[i] = pc.cast(c, pa.float64()).to_numpy(zero_copy_only=False)
    cjk = pc.cast(
        pc.count_substring_regex(col, pattern=_CJK_RE), pa.float64()
    ).to_numpy(zero_copy_only=False)

    # null text → NaN scores; NaN <= 0 is False, so without an explicit
    # mask argmax would confidently label null rows index 0 ("en")
    null_mask = pc.is_null(col).to_numpy(zero_copy_only=False).astype(bool, copy=False)
    scores = np.nan_to_num(scores, nan=0.0)
    cjk = np.nan_to_num(cjk, nan=0.0)

    best = np.argmax(scores, axis=0)
    best_score = scores[best, np.arange(n)]
    pred = np.array(langs, dtype=object)[best]
    pred[best_score <= 0] = "und"
    pred[cjk > 0] = "zh"  # CJK presence dominates stopword hits
    pred[null_mask] = "und"
    return set_column(batch, out, pa.array(pred, type=pa.string()))


def raw_fingerprint(batch: pa.Table, field: str = "text",
                    out: str = "fp64") -> pa.Table:
    """64-bit hash of the RAW (un-normalized) text — the identity the
    exact-dedup family keys on. Exact dedup means exact TEXT equality
    (its SQL oracles GROUP BY raw text, and segment dedup hashes raw
    chunk text); two docs differing only in case/punctuation are
    DISTINCT here but merge under ``fingerprint``'s normalized hash —
    the deliberate semantic split between the two operators (round-3
    advice: the dedup stages previously hashed normalized text while
    their oracles grouped raw, a latent mismatch the testdata never
    exposed)."""
    from .hashing import stable_hash64_i64

    return set_column(batch, out,
                      pa.array(stable_hash64_i64(as_combined(batch[field])),
                               pa.int64()))


def fingerprint(batch: pa.Table, field: str = "text", out: str = "fp64") -> pa.Table:
    """Deterministic 64-bit content fingerprint of normalized text.

    Normalization: lowercase, collapse non-alphanumerics to single spaces,
    trim. Hash: polars' vectorized 64-bit hash (stable within an
    environment; use for intra-run dedup/bucketing, not cross-version
    storage). Emitted as int64 (bit-reinterpreted): Ray's groupby
    materializes key values as Python ints when combining, and uint64
    values ≥ 2^63 overflow the int64 re-inference there, silently
    degrading aggregate output blocks to pickled-object columns.
    """
    col = as_combined(batch[field])
    norm = pc.utf8_trim_whitespace(
        pc.replace_substring_regex(pc.utf8_lower(col), pattern=r"[^a-z0-9]+",
                                   replacement=" ")
    )
    from .hashing import stable_hash64_i64

    return set_column(batch, out,
                      pa.array(stable_hash64_i64(norm), pa.int64()))
