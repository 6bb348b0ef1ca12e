"""End-to-end flagship pipeline vs the pure-Python row oracle
(BASELINE.json:L6/L14/L15 invariants; SURVEY.md §5.2.1):

- per-sink routed-row SET equality,
- per-turn text BYTE equality under stable (conv_id, turn_idx) sort
  (null preserved distinctly from ""),
- aggregate count equality by (route, role, tool, ts_hour) and conv_id,
- conservation: ∑ per-sink rows == input rows.
"""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def to_table(ds) -> pa.Table:
    import ray

    return pa.concat_tables(
        [t if isinstance(t, pa.Table) else pa.Table.from_batches([t])
         for t in ray.get(ds.to_arrow_refs())],
        promote_options="permissive",
    )

from go_logagent_ray.oracle import SINKS


@pytest.fixture(scope="module")
def routed(ray_session, transcripts_parquet):
    from go_logagent_ray.pipelines.transcript import run_flagship

    res = run_flagship(transcripts_parquet, parse_concurrency=2, batch_size=64)
    return res


def _sorted_rows(table: pa.Table):
    import pyarrow.compute as pc

    idx = pc.sort_indices(
        table, sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending")]
    )
    return table.take(idx).to_pylist()


def test_sink_row_sets_and_text_equality(routed, oracle_result):
    got = to_table(routed["routed"])  # ~400 rows — fine to materialize in test
    assert got.num_rows == sum(len(v) for v in oracle_result["sinks"].values())

    for sink in SINKS:
        g = got.filter(pa.compute.equal(got["route"], sink))
        grows = _sorted_rows(g)
        erows = sorted(
            oracle_result["sinks"][sink], key=lambda r: (r["conv_id"], r["turn_idx"])
        )
        assert len(grows) == len(erows), sink
        for gr, er in zip(grows, erows):
            assert (gr["conv_id"], gr["turn_idx"]) == (er["conv_id"], er["turn_idx"])
            # byte equality, null vs "" preserved
            gt, et = gr["text"], er["text"]
            assert (gt is None) == (et is None)
            if gt is not None:
                assert gt.encode() == et.encode()
            for k in ("lvl", "component", "latency_ms", "status", "tool_name",
                      "args_bytes", "agent_kind", "ts_hour", "pipeline_id"):
                assert gr[k] == er[k], (sink, k, gr, er)
            assert sorted(gr["tags"]) == sorted(er["tags"])


def test_aggregate_counts_match_oracle(routed, oracle_result):
    got = {
        (r["route"], r["role"], r["tool"], r["ts_hour"]): r["n"]
        for r in to_table(routed["sink_counts"]).to_pylist()
    }
    assert got == dict(oracle_result["sink_counts"])


def test_conv_counts_match_oracle(routed, oracle_result):
    got = {r["conv_id"]: r["n"] for r in to_table(routed["conv_counts"]).to_pylist()}
    assert got == dict(oracle_result["conv_counts"])


def test_sinks_written_partitioned(ray_session, transcripts_parquet, tmp_path, oracle_result):
    from go_logagent_ray.pipelines.transcript import parse_enrich_route, write_sinks
    import ray.data as rd

    out = str(tmp_path / "sinks")
    ds = rd.read_parquet(transcripts_parquet)
    write_sinks(parse_enrich_route(ds, batch_size=64), out)
    total = 0
    for sink in SINKS:
        d = os.path.join(out, f"route={sink}")
        if not os.path.isdir(d):
            assert len(oracle_result["sinks"][sink]) == 0
            continue
        n = pq.read_table(d).num_rows
        assert n == len(oracle_result["sinks"][sink]), sink
        total += n
    assert total == sum(len(v) for v in oracle_result["sinks"].values())


def test_errors_json_sink(ray_session, transcripts_parquet, tmp_path, oracle_result):
    import glob
    import json as jsonlib

    import ray.data as rd

    from go_logagent_ray.pipelines.transcript import (
        parse_enrich_route,
        write_errors_json,
    )

    out = str(tmp_path / "errors_json")
    routed = parse_enrich_route(rd.read_parquet(transcripts_parquet), batch_size=64)
    write_errors_json(routed, out)
    rows = []
    for f in glob.glob(out + "/*.json"):
        with open(f) as fh:
            rows.extend(jsonlib.loads(line) for line in fh if line.strip())
    assert len(rows) == len(oracle_result["sinks"]["errors"])
    assert all(r["route"] == "errors" for r in rows)
    assert all(isinstance(r["tags"], list) for r in rows)
