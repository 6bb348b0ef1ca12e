"""CLI (EP1 analog) and source-module tests."""

import json

import pytest


def test_cli_gen_and_flagship(ray_session, tmp_path, capsys):
    from go_logagent_ray.cli import main

    src = str(tmp_path / "t.parquet")
    assert main(["gen", "--out", src, "--convs", "50"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["status"] == "ok"

    sink = str(tmp_path / "sinks")
    assert main(["flagship", "--input", src, "--out", sink]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["status"] == "ok"
    assert sum(out["counts"].values()) > 0


def test_cli_run_config(ray_session, tmp_path, capsys, transcripts_parquet):
    from go_logagent_ray.cli import main
    from go_logagent_ray.oracle import GROK_PATTERNS

    conf = {
        "input": {"type": "parquet", "paths": [transcripts_parquet]},
        "filters": [
            {"type": "grok", "patterns": GROK_PATTERNS},
            {"type": "route", "rules": [
                ["errors", [["in", "status", ["err", "timeout"]]]]]},
        ],
        "outputs": [{"type": "parquet", "path": str(tmp_path / "o"),
                     "partition_cols": ["route"]}],
    }
    cpath = tmp_path / "conf.json"
    cpath.write_text(json.dumps(conf))
    assert main(["run", "--config", str(cpath)]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["status"] == "ok" and out["rows"] > 0


def test_cli_checkpoint_mode(ray_session, tmp_path, capsys, transcripts_parquet):
    from go_logagent_ray.cli import main

    sink = str(tmp_path / "ck")
    assert main(["flagship", "--input", transcripts_parquet, "--out", sink,
                 "--checkpoint", "--rows-per-partition", "200"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["committed"] > 0
    # rerun resumes: nothing recomputed
    assert main(["flagship", "--input", transcripts_parquet, "--out", sink,
                 "--checkpoint", "--rows-per-partition", "200"]) == 0
    out2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out2["committed"] == 0 and out2["skipped"] == out["committed"]
    assert out2["counts"] == out["counts"]


def test_sources(ray_session, transcripts_parquet):
    from go_logagent_ray.sources.parquet import from_lines, read_transcripts

    ds = read_transcripts(transcripts_parquet, columns=["conv_id", "text"])
    assert set(ds.schema().names) == {"conv_id", "text"}
    ds2 = from_lines(["a", "b"])
    assert ds2.count() == 2
