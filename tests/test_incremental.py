"""Incremental micro-batch mode: chunked processing equals the batch run."""

import glob

import pyarrow.parquet as pq


def test_incremental_equals_batch(ray_session, transcripts_small, tmp_path,
                                  oracle_result):
    from go_logagent_ray.pipelines.incremental import IncrementalRunner

    out = str(tmp_path / "inc")
    runner = IncrementalRunner(out, num_buckets=4)
    n = transcripts_small.num_rows
    cut1, cut2 = n // 3, 2 * n // 3
    for chunk in (transcripts_small.slice(0, cut1),
                  transcripts_small.slice(cut1, cut2 - cut1),
                  transcripts_small.slice(cut2)):
        info = runner.process_chunk(chunk)
        assert info["rows"] == chunk.num_rows

    # running counts equal the oracle's full-batch counts
    got = runner.running_counts()
    assert got == dict(oracle_result["sink_counts"])

    # sinks conserve rows across chunk partitions
    total = sum(pq.ParquetFile(f).metadata.num_rows
                for f in glob.glob(out + "/chunk-*/route=*/*.parquet"))
    assert total == n
    runner.shutdown()


def test_incremental_counts_accumulate(ray_session, transcripts_small, tmp_path):
    from go_logagent_ray.pipelines.incremental import IncrementalRunner

    out = str(tmp_path / "inc2")
    runner = IncrementalRunner(out, num_buckets=2)
    half = transcripts_small.slice(0, transcripts_small.num_rows // 2)
    runner.process_chunk(half)
    first = sum(runner.running_counts().values())
    runner.process_chunk(half)  # same rows again — at-least-once feed
    second = sum(runner.running_counts().values())
    assert first == half.num_rows
    assert second == 2 * half.num_rows  # counts are additive per feed
    runner.shutdown()


def test_streaming_dedup_cross_chunk(ray_session):
    """A text seen in an earlier chunk is rejected in later chunks;
    within a chunk the min id holds the content; distinct count is
    exact across shards."""
    import ray.data as rd

    from go_logagent_ray.pipelines.incremental import StreamingDedup

    sd = StreamingDedup(num_buckets=4)
    try:
        c1 = rd.from_items([
            {"doc_id": 5, "text": "alpha beta"},
            {"doc_id": 3, "text": "alpha beta"},   # min id 3 keeps
            {"doc_id": 7, "text": "gamma delta"},
        ])
        c2 = rd.from_items([
            {"doc_id": 10, "text": "alpha beta"},   # dup of chunk 1
            {"doc_id": 11, "text": "epsilon zeta"},
        ])
        assert sd.process_chunk_dataset(c1) == [3, 7]
        assert sd.process_chunk_dataset(c2) == [11]
        assert sd.n_distinct() == 3
    finally:
        sd.shutdown()
