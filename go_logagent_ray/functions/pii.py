"""PII redaction: mask emails / phone numbers / IPv4 addresses in a
text column and count occurrences — the scrubbing pass every
training-data pipeline runs before release.

Engine parity by construction: the Ray side uses pyarrow's RE2-backed
kernels (``count_substring_regex`` / ``replace_substring_regex``) and
the SQL oracle is GENERATED from the SAME pattern constants below, run
by DuckDB's RE2-backed ``regexp_*`` functions — both sides share one
regex dialect and one pattern source, so they cannot drift (same trick
as the langid oracle).

Semantics: all three counts are computed on the ORIGINAL text
(non-overlapping leftmost matches); redaction then applies email →
phone → ip in that fixed order, so overlapping shapes (a phone like
``555.123.4567`` also containing an IPv4-shaped prefix) resolve
identically on both sides.

Scale shape: stateless vectorized map_batches — regexes execute in
Arrow C++ over the whole column, no Python row loop, no shuffle.  The
synthetic PII corpus (``PII_LINES``) exists because the testdata
documents contain no PII; the operator unions it with the real corpus
so both the match path and the at-volume no-match path run.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\d{3}[-.]\d{3}[-.]\d{4}"
IPV4_RE = r"(?:\d{1,3}\.){3}\d{1,3}"

REDACTIONS = [(EMAIL_RE, "<EMAIL>", "n_email"),
              (PHONE_RE, "<PHONE>", "n_phone"),
              (IPV4_RE, "<IP>", "n_ip")]

# Deterministic PII-bearing lines (row_id = PII_BASE + index).  The SQL
# oracle re-emits these as VALUES from the same constant.
PII_BASE = 1_000_000
PII_LINES = [
    "contact alice@example.com or bob.smith+tag@mail.example.org now",
    "call 555-123-4567 or 555.987.6543 before 9pm",
    "server 10.0.0.1 talked to 192.168.254.3 on port 443",
    "mixed: carol@corp.example.net at 172.16.0.9 dial 800-555-0199",
    "no pii in this line at all",
    "almost an email: not@valid and half ip 10.0.0 stay",
    "dotted phone 555.123.4567 doubles as an ipv4-shaped prefix",
    "email@sub.domain.example.com sits next to 8.8.8.8",
]


def scrub_text(text) -> tuple:
    """The ONE definition of the scrub semantics, shared by
    ``redact_pii`` and the config-registry ``pii`` stage: counts on the
    ORIGINAL text, redaction applied in fixed email → phone → ip
    order.  The cast guards all-null blocks (null TYPE has no string
    kernels); null text yields null counts + null redacted, matching
    SQL regexp_* on NULL.  Returns (redacted, {count_name: array})."""
    text = pc.cast(text, pa.string())
    red = text
    counts = {}
    for pat, token, cnt_name in REDACTIONS:
        counts[cnt_name] = pc.cast(
            pc.count_substring_regex(text, pat), pa.int64())
        red = pc.replace_substring_regex(red, pat, token)
    return red, counts


def redact_pii(ds: Dataset, *, text_field: str = "text",
               id_field: str = "row_id") -> Dataset:
    """(row_id, redacted, n_email, n_phone, n_ip) per row."""

    def scrub(batch: pa.Table) -> pa.Table:
        red, counts = scrub_text(batch.column(text_field))
        cols = {id_field: batch.column(id_field)}
        cols.update(counts)
        cols["redacted"] = red
        return pa.table(cols)

    return ds.map_batches(scrub, batch_format="pyarrow")


def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def pii_oracle_sql() -> str:
    """DuckDB SQL equivalent over documents ∪ the inline PII corpus,
    generated from the same pattern and corpus constants."""
    values = ",\n    ".join(
        f"({PII_BASE + i}, {_sql_quote(line)})"
        for i, line in enumerate(PII_LINES))
    counts = ",\n       ".join(
        f"CAST(len(regexp_extract_all(text, {_sql_quote(pat)})) AS BIGINT)"
        f" AS {cnt}" for pat, _, cnt in REDACTIONS)
    red = "text"
    for pat, token, _ in REDACTIONS:
        red = (f"regexp_replace({red}, {_sql_quote(pat)}, "
               f"{_sql_quote(token)}, 'g')")
    return f"""
WITH corpus(row_id, text) AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  VALUES {values}
)
SELECT row_id,
       {counts},
       {red} AS redacted
FROM corpus
"""
