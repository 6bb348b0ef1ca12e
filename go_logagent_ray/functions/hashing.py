"""Deterministic vectorized string hashing shared by dedup/fingerprint.

Python's builtin ``hash()`` is salted per process (PYTHONHASHSEED) so it
must NEVER be used for keys that cross Ray task/actor boundaries. All
cross-process hashing goes through polars' vectorized 64-bit hash, which
is deterministic for a given seed within an environment (verified across
processes; do not persist hashes across polars upgrades).
"""

from __future__ import annotations

import numpy as np
import polars as pl


def stable_hash64(strings: list[str] | "pl.Series", seed: int = 0) -> np.ndarray:
    """uint64 hash per input string, vectorized and process-stable."""
    s = strings if isinstance(strings, pl.Series) else pl.Series(strings, dtype=pl.Utf8)
    return s.hash(seed=seed).to_numpy().astype(np.uint64, copy=False)
