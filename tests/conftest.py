"""Session-scoped Ray fixture — Ray is initialised ONCE per pytest session."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    import ray

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield ray
    ray.shutdown()


@pytest.fixture(scope="session")
def transcripts_small():
    """~400-row deterministic transcript table (FIXTURES.md smoke size)."""
    from go_logagent_ray.fixtures import gen_transcripts

    return gen_transcripts(50, 8, seed=42, hot_frac=0.02)


@pytest.fixture(scope="session")
def transcripts_parquet(tmp_path_factory, transcripts_small):
    import pyarrow.parquet as pq

    path = tmp_path_factory.mktemp("data") / "transcripts.parquet"
    pq.write_table(transcripts_small, str(path), row_group_size=64)
    return str(path)


@pytest.fixture(scope="session")
def oracle_result(transcripts_small):
    from go_logagent_ray.oracle import run_oracle

    return run_oracle(transcripts_small)
