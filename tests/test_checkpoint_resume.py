"""Checkpoint/resume tests (SURVEY.md §5.2.4): kill after K of P
partitions commit; rerun; committed partitions are NOT re-parsed
(manifest mtimes unchanged) and final sinks + counts equal a clean run."""

import glob
import os

import pyarrow.parquet as pq
import pytest

from go_logagent_ray.state.checkpoint import (
    Fragment,
    committed_partitions,
    config_hash,
    list_fragments,
    plan_partitions,
    run_checkpointed,
)


def _transform(ds):
    from go_logagent_ray.pipelines.transcript import parse_enrich_route

    return parse_enrich_route(ds, batch_size=128)


SPEC = {"pipeline": "flagship", "v": 1}


def test_fragment_planning_deterministic(transcripts_parquet):
    frags = list_fragments([transcripts_parquet], rgs_per_fragment=2)
    assert frags == list_fragments([transcripts_parquet], rgs_per_fragment=2)
    assert sum(f.rows for f in frags) == pq.ParquetFile(transcripts_parquet).metadata.num_rows
    parts = plan_partitions(frags, rows_per_partition=128)
    assert [f for p in parts for f in p] == frags  # order-preserving cover


def test_partial_run_then_resume(ray_session, transcripts_parquet, tmp_path, oracle_result):
    out = str(tmp_path / "ckpt")
    # phase 1: "killed" after 2 partitions
    r1 = run_checkpointed(
        [transcripts_parquet], out, _transform, SPEC,
        rows_per_partition=128, rgs_per_fragment=1, max_partitions=2,
    )
    assert r1["committed"] == 2 and r1["remaining"] > 0
    mtimes = {
        p: os.path.getmtime(p) for p in glob.glob(os.path.join(out, "_manifest", "*.json"))
    }
    assert len(mtimes) == 2

    # phase 2: resume to completion
    r2 = run_checkpointed(
        [transcripts_parquet], out, _transform, SPEC,
        rows_per_partition=128, rgs_per_fragment=1,
    )
    assert r2["skipped"] == 2 and r2["remaining"] == 0
    # committed partitions were not re-parsed: their manifests untouched
    for p, t in mtimes.items():
        assert os.path.getmtime(p) == t

    # final sinks equal the oracle exactly
    expected = {s: len(rows) for s, rows in oracle_result["sinks"].items() if rows}
    got: dict[str, int] = {}
    for sink_dir in glob.glob(os.path.join(out, "*")):
        sink = os.path.basename(sink_dir)
        if sink.startswith("_") or sink.startswith("."):
            continue
        n = sum(
            pq.ParquetFile(f).metadata.num_rows
            for f in glob.glob(os.path.join(sink_dir, "part-*", "*.parquet"))
        )
        got[sink] = n
    assert got == expected
    assert dict(r2["total_counts"]) == expected


def test_config_change_invalidates_commits(ray_session, transcripts_parquet, tmp_path):
    out = str(tmp_path / "ckpt2")
    run_checkpointed([transcripts_parquet], out, _transform, SPEC,
                     rows_per_partition=256, max_partitions=1)
    other = {"pipeline": "flagship", "v": 2}
    assert committed_partitions(out, config_hash(SPEC))
    assert not committed_partitions(out, config_hash(other))


def test_leftover_staging_is_cleaned(ray_session, transcripts_parquet, tmp_path):
    out = str(tmp_path / "ckpt3")
    os.makedirs(os.path.join(out, ".tmp-part-0", "route=chat"), exist_ok=True)
    r = run_checkpointed([transcripts_parquet], out, _transform, SPEC,
                         rows_per_partition=10_000)
    assert r["committed"] >= 1
    assert not glob.glob(os.path.join(out, ".tmp-*"))


def test_changed_input_set_invalidates_stale_partitions(
        ray_session, transcripts_parquet, tmp_path):
    """Regression: adding an input file reshuffles partition ids; a
    config-hash-only match would skip the WRONG data silently."""
    import shutil

    extra = str(tmp_path / "a_extra.parquet")  # sorts BEFORE the original
    shutil.copy(transcripts_parquet, extra)
    out = str(tmp_path / "ck_changed")

    r1 = run_checkpointed([transcripts_parquet], out, _transform, SPEC,
                          rows_per_partition=128, rgs_per_fragment=1)
    n1 = sum(r1["total_counts"].values())

    # resubmit with an additional file: previously committed pids now map
    # to different fragments and must be recomputed, not skipped
    r2 = run_checkpointed([extra, transcripts_parquet], out, _transform, SPEC,
                          rows_per_partition=128, rgs_per_fragment=1)
    assert sum(r2["total_counts"].values()) == 2 * n1
    assert r2["remaining"] == 0


def test_list_fragments_expands_directories(transcripts_parquet, tmp_path):
    """Regression (ADVICE r1): CLI --input DIR advertised but a directory
    crashed ParquetFile; directories now expand to contained parquet."""
    import shutil

    d = tmp_path / "indir" / "nested"
    d.mkdir(parents=True)
    shutil.copy(transcripts_parquet, d / "b.parquet")
    shutil.copy(transcripts_parquet, d / "a.parquet")
    frags = list_fragments([str(tmp_path / "indir")], rgs_per_fragment=2)
    files = sorted({f.file for f in frags})
    assert [os.path.basename(f) for f in files] == ["a.parquet", "b.parquet"]
    direct = list_fragments([str(d / "a.parquet"), str(d / "b.parquet")],
                            rgs_per_fragment=2)
    assert frags == direct


def test_curate_checkpoint_kill_resume_identical(ray_session, tmp_path):
    """The stage-2 (quality+dedup) boundary as a partitioned-parquet
    checkpoint: kill right after the commit, DELETE the raw input,
    resume — the final table must be identical to the single-shot
    in-memory run, proving stages 1-2 never re-execute."""
    import os
    import shutil

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from go_logagent_ray.pipelines.curation import curate_stats

    sf = tmp_path / "sf"
    sf.mkdir()
    rng = np.random.default_rng(31)
    vocab = [f"v{i}" for i in range(40)]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(5, 90)))
             for _ in range(120)]
    texts[7] = texts[3]          # exact dup for stage 2
    texts[11] = "tiny doc"       # fails the >= 20 token gate
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    pq.write_table(t, str(sf / "documents.parquet"))

    def as_sorted(ds):
        return ds.to_pandas().sort_values("doc_id").reset_index(drop=True)

    baseline = as_sorted(curate_stats(str(sf)))

    ckpt = str(tmp_path / "ckpt")
    with pytest.raises(RuntimeError, match="simulated kill"):
        curate_stats(str(sf), checkpoint_dir=ckpt, fail_after_stage2=True)
    assert os.path.isfile(os.path.join(ckpt, "_stage2_manifest.json"))

    # the kill left a committed checkpoint; the raw input disappears —
    # the resume may only touch the checkpoint
    shutil.rmtree(sf)
    resumed = as_sorted(curate_stats(str(sf), checkpoint_dir=ckpt))

    assert baseline.doc_id.tolist() == resumed.doc_id.tolist()
    assert baseline.n_chunks.tolist() == resumed.n_chunks.tolist()
    assert baseline.n_chunk_words.tolist() == resumed.n_chunk_words.tolist()


def test_curate_checkpoint_damaged_data_recomputes(ray_session, tmp_path):
    """A partially deleted stage2 directory under an INTACT manifest
    must fall through to recompute (row-count validation), never resume
    silently with fewer rows."""
    import json
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from go_logagent_ray.pipelines.curation import stage2_survivors

    sf = tmp_path / "sf"
    sf.mkdir()
    rng = np.random.default_rng(32)
    vocab = [f"w{i}" for i in range(30)]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(25, 60)))
             for _ in range(80)]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    pq.write_table(t, str(sf / "documents.parquet"))

    ckpt = str(tmp_path / "ckpt")
    full = stage2_survivors(str(sf), checkpoint_dir=ckpt).to_pandas()
    n = len(full)
    assert n > 0

    # simulate truncation: drop one NON-EMPTY committed data file,
    # keeping the manifest intact — the resume must detect the row
    # deficit and recompute
    stage2 = os.path.join(ckpt, "stage2")
    files = sorted(os.listdir(stage2))
    victim = next(f for f in files
                  if pq.read_metadata(os.path.join(stage2, f)).num_rows)
    os.remove(os.path.join(stage2, victim))
    with open(os.path.join(ckpt, "_stage2_manifest.json")) as f:
        assert json.load(f)["rows"] == n  # manifest still claims all rows

    again = stage2_survivors(str(sf), checkpoint_dir=ckpt).to_pandas()
    assert len(again) == n  # recomputed, not the truncated read-back
    assert sorted(again.doc_id) == sorted(full.doc_id)


def test_curate_checkpoint_zero_survivors(ray_session, tmp_path):
    """A corpus the quality gate empties entirely must still commit a
    readable checkpoint (explicit empty parquet file) and resume to the
    same zero-row survivor set with the raw input gone."""
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    from go_logagent_ray.pipelines.curation import stage2_survivors

    sf = tmp_path / "sf"
    sf.mkdir()
    t = pa.table({"doc_id": pa.array(range(6), pa.int64()),
                  "text": pa.array(["tiny doc"] * 6, pa.string())})
    pq.write_table(t, str(sf / "documents.parquet"))

    ckpt = str(tmp_path / "ckpt")
    out = stage2_survivors(str(sf), checkpoint_dir=ckpt)
    assert out.count() == 0
    assert set(out.schema().names) == {"doc_id", "text"}

    shutil.rmtree(sf)  # resume may only touch the checkpoint
    resumed = stage2_survivors(str(sf), checkpoint_dir=ckpt)
    assert resumed.count() == 0
    assert set(resumed.schema().names) == {"doc_id", "text"}


def test_lm_bucket_checkpoint_kill_resume_identical(ray_session, tmp_path):
    """The lm_bucket scored-table boundary as a committed checkpoint
    (VERDICT r4 #6): kill right after the score commit, DELETE the raw
    input, resume — the full head/middle/tail bucketing must be
    identical to the single-shot run, proving LM scoring never
    re-executes."""
    import shutil

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from go_logagent_ray.pipelines.queries import lm_bucket_docs

    sf = tmp_path / "sf"
    sf.mkdir()
    rng = np.random.default_rng(41)
    vocab = [f"t{i}" for i in range(25)]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(1, 30)))
             for _ in range(90)] + ["", None]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    pq.write_table(t, str(sf / "documents.parquet"))

    def as_sorted(ds):
        return ds.to_pandas().sort_values("doc_id").reset_index(drop=True)

    baseline = as_sorted(lm_bucket_docs(str(sf)))
    assert set(baseline.bucket) == {"head", "middle", "tail"}

    ckpt = str(tmp_path / "ckpt")
    with pytest.raises(RuntimeError, match="simulated kill"):
        lm_bucket_docs(str(sf), checkpoint_dir=ckpt,
                       fail_after_score=True)
    import os
    assert os.path.isfile(os.path.join(ckpt, "_lm_scored_manifest.json"))

    shutil.rmtree(sf)  # the resume may only touch the checkpoint
    resumed = as_sorted(lm_bucket_docs(str(sf), checkpoint_dir=ckpt))
    assert baseline.doc_id.tolist() == resumed.doc_id.tolist()
    assert baseline.score_q.tolist() == resumed.score_q.tolist()
    assert baseline.bucket.tolist() == resumed.bucket.tolist()


def test_curate_v2_checkpoint_resume_skips_all_dedup(ray_session, tmp_path):
    """curate_stats_v2's near-dup survivor boundary commits through the
    shared protocol: resume with the raw input DELETED reproduces the
    single-shot result, proving quality gate, exact dedup, pair mining
    and the anti-join all skip."""
    import shutil

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from go_logagent_ray.pipelines.curation import (curate_stats,
                                                    curate_stats_v2)

    sf = tmp_path / "sf"
    sf.mkdir()
    rng = np.random.default_rng(43)
    vocab = [f"u{i}" for i in range(60)]
    texts = [" ".join(rng.choice(vocab, size=40)) for _ in range(50)]
    # a NON-exact near-dup pair: one word edited → trigram j ≈ 0.9
    w = texts[5].split(" ")
    w[-1] = "edited"
    texts.append(" ".join(w))
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    pq.write_table(t, str(sf / "documents.parquet"))

    def as_sorted(ds):
        return ds.to_pandas().sort_values("doc_id").reset_index(drop=True)

    v1 = as_sorted(curate_stats(str(sf)))
    baseline = as_sorted(curate_stats_v2(str(sf)))
    assert len(baseline) == len(v1) - 1      # the near-dup stage bit
    assert 50 not in set(baseline.doc_id)    # larger-id member dropped

    ckpt = str(tmp_path / "ckpt")
    first = as_sorted(curate_stats_v2(str(sf), checkpoint_dir=ckpt))
    assert first.doc_id.tolist() == baseline.doc_id.tolist()

    shutil.rmtree(sf)  # resume may only touch the checkpoint
    resumed = as_sorted(curate_stats_v2(str(sf), checkpoint_dir=ckpt))
    assert baseline.doc_id.tolist() == resumed.doc_id.tolist()
    assert baseline.n_chunks.tolist() == resumed.n_chunks.tolist()
    assert baseline.n_chunk_words.tolist() == resumed.n_chunk_words.tolist()
