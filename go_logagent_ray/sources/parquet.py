"""Parquet source (S1) — the transcript-table analog of the reference's
file input (``ref: input/file/`` [U-recall], SURVEY.md §2.1).

The reference tails log files with per-file byte offsets; here the input
is a (directory of) parquet file(s) and resume granularity is the
per-partition checkpoint manifest (state/checkpoint.py). This module adds
the read-side scale hygiene:

- column pruning at the read (never load columns a 2-column transform
  doesn't need),
- expression pushdown to row groups via ``filter=``,
- a sharding note: Ray assigns ONE read task per parquet file — a single
  giant file serializes the read stage (measured); keep inputs sharded.
"""

from __future__ import annotations

from ray.data import Dataset


def read_transcripts(
    paths: str | list[str],
    columns: list[str] | None = None,
    filter_expr=None,
) -> Dataset:
    import ray.data as rd

    kwargs = {}
    if columns is not None:
        kwargs["columns"] = columns
    if filter_expr is not None:
        kwargs["filter"] = filter_expr
    return rd.read_parquet(paths, **kwargs)


def from_lines(lines: list[str]) -> Dataset:
    """Stdin-analog inline source for ad-hoc runs/tests (S2,
    ``ref: input/stdin/`` [U-recall]): one row per line, ``text`` column."""
    import pyarrow as pa
    import ray.data as rd

    return rd.from_arrow(pa.table({"text": pa.array(lines, type=pa.string())}))
