"""Text analysis, multimodal plumbing, and config/registry tests."""

import numpy as np
import pyarrow as pa
import pytest


# ---- textstats (pure batch functions, no Ray needed) ----

def _docs():
    return pa.table({
        "doc_id": pa.array([0, 1, 2, 3], type=pa.int64()),
        "text": [
            "the cat and the dog, of course!",
            "der hund und die katze ist nicht da",
            "le chat et la maison dans les arbres",
            "",
        ],
    })


def test_token_stats():
    from go_logagent_ray.functions.textstats import token_stats

    out = token_stats(_docs())
    assert out["n_words"].to_pylist() == [7, 8, 8, 0]
    assert out["n_chars_text"].to_pylist()[3] == 0
    # est_tokens >= n_words always
    assert all(a >= b for a, b in zip(out["est_tokens"].to_pylist(),
                                      out["n_words"].to_pylist()))


def test_quality_stats():
    from go_logagent_ray.functions.textstats import quality_stats

    out = quality_stats(_docs())
    assert out["n_punct"].to_pylist() == [2, 0, 0, 0]
    scores = out["quality_score"].to_pylist()
    assert all(0.0 <= s <= 1.0 for s in scores)
    assert scores[0] > scores[3]  # english prose beats empty string


def test_lang_id():
    from go_logagent_ray.functions.textstats import lang_id

    t = pa.table({"text": [
        "the cat and the dog is in the house",
        "der hund und die katze ist nicht hier",
        "le chat et la maison dans les arbres est",
        "el perro y la casa que en los arboles",
        "这是一个中文句子",
        "zzz qqq xxx",
    ]})
    out = lang_id(t)
    assert out["pred_lang"].to_pylist() == ["en", "de", "fr", "es", "zh", "und"]


def test_fingerprint_normalization():
    from go_logagent_ray.functions.textstats import fingerprint

    t = pa.table({"text": ["Hello,   World!", "hello world", "other text"]})
    out = fingerprint(t)["fp64"].to_pylist()
    assert out[0] == out[1]  # case/punct/whitespace-insensitive
    assert out[0] != out[2]


# ---- multimodal plumbing (stubbed decode) ----

def test_media_feature_stage_runs_as_actor_pool(ray_session):
    import ray.data as rd

    from go_logagent_ray.stages.multimodal import ImageFeatureStage, gen_media_table

    t = gen_media_table(32, payload_bytes=1024)
    ds = rd.from_arrow(t).map_batches(
        ImageFeatureStage, fn_constructor_kwargs={"decode": "fake"},
        batch_format="pyarrow", batch_size=8, concurrency=2)
    rows = ds.take_all()
    assert len(rows) == 32
    assert all(len(r["features"]) == 16 for r in rows)
    # deterministic fake: same payload -> same features across runs
    rows2 = rd.from_arrow(t).map_batches(
        ImageFeatureStage, fn_constructor_kwargs={"decode": "fake"},
        batch_format="pyarrow", batch_size=8, concurrency=2).take_all()
    f1 = {r["media_id"]: list(r["features"]) for r in rows}
    f2 = {r["media_id"]: list(r["features"]) for r in rows2}
    assert f1 == f2


def test_media_strict_decode_raises():
    from go_logagent_ray.stages.multimodal import ImageFeatureStage, gen_media_table

    stage = ImageFeatureStage(decode="strict")
    with pytest.raises(NotImplementedError):
        stage(gen_media_table(2))


def test_frame_sampling(ray_session):
    import ray.data as rd

    from go_logagent_ray.stages.multimodal import FrameSampleStage, gen_media_table

    ds = rd.from_arrow(gen_media_table(8)).map_batches(
        FrameSampleStage, fn_constructor_kwargs={"n_frames": 4},
        batch_format="pyarrow", batch_size=4, concurrency=2)
    rows = ds.take_all()
    assert len(rows) == 32  # 8 media x 4 frames
    assert {r["frame_idx"] for r in rows} == {0, 1, 2, 3}


# ---- config / registry (X1/X2) ----

def test_pipeline_from_config_end_to_end(ray_session, transcripts_parquet, tmp_path):
    from go_logagent_ray.config import Pipeline
    from go_logagent_ray.oracle import GROK_PATTERNS

    out = str(tmp_path / "cfg_out")
    pipe = Pipeline.from_config({
        "input": {"type": "parquet", "paths": [transcripts_parquet]},
        "filters": [
            {"type": "grok", "patterns": GROK_PATTERNS},
            {"type": "patch", "ops": [["add_field", "pipeline_id", "agentlog"],
                                      ["time_floor", "ts", "ts_hour", "hour"]]},
            {"type": "route", "rules": [
                ["errors", [["in", "status", ["err", "timeout"]]]],
                ["chat", [["in", "role", ["user", "assistant"]]]],
            ]},
        ],
        "outputs": [{"type": "parquet", "path": out, "partition_cols": ["route"]}],
    })
    res = pipe.run()
    import glob

    import pyarrow.parquet as pq

    total = sum(pq.read_table(d).num_rows for d in glob.glob(out + "/route=*"))
    assert total == pq.ParquetFile(transcripts_parquet).metadata.num_rows


def test_unknown_stage_type_fails_fast():
    from go_logagent_ray.config import Pipeline

    with pytest.raises(KeyError):
        Pipeline.from_config({"filters": [{"type": "nope"}]})


def test_custom_stage_registration(ray_session):
    import ray.data as rd

    from go_logagent_ray.config import Pipeline, register_stage

    @register_stage("upper_text")
    def _upper(conf):
        import pyarrow.compute as pc

        def fn(batch):
            return batch.set_column(
                batch.schema.get_field_index("text"), "text",
                pc.utf8_upper(batch["text"]))
        return fn, {}

    pipe = Pipeline.from_config({"filters": [{"type": "upper_text"}]})
    ds = rd.from_items([{"text": "abc"}])
    assert pipe.transform(ds).take_all()[0]["text"] == "ABC"


def test_lang_id_null_text_is_und():
    """Regression: NaN scores from null text made argmax pick 'en'."""
    from go_logagent_ray.functions.textstats import lang_id

    t = pa.table({"text": pa.array([None, "the cat and the dog", ""],
                                   type=pa.string())})
    assert lang_id(t)["pred_lang"].to_pylist() == ["und", "en", "und"]


def test_route_rules_support_full_predicate_language(ray_session):
    """Route rules now share the drop-filter evaluator (lt/gt/match)."""
    from go_logagent_ray.stages.route import RouteStage

    t = pa.table({"v": [5.0, 50.0], "s": ["xa", "yb"]})
    out = RouteStage([("big", [("gt", "v", 10.0)]),
                      ("xs", [("match", "s", "^x")])],
                     default_sink="rest")(t)
    assert out["route"].to_pylist() == ["xs", "big"]


def test_config_round3_stages_pii_chunk_sample_decontaminate():
    """The round-3 operators are pluggable through the config registry
    (X1): a pipeline spec using them compiles and runs end-to-end."""
    import ray

    from go_logagent_ray.config import Pipeline

    cfg = {
        "input": {"type": "items", "items": [
            {"doc_id": 1, "text": "mail me at a@b.co please do"},
            {"doc_id": 2, "text": "x y z " * 20},
            {"doc_id": 3, "text": "the bench gram here now ok fine yes"},
            {"doc_id": 4, "text": None},
        ]},
        "filters": [
            {"type": "pii", "field": "text"},
            {"type": "decontaminate", "field": "text", "id_field": "doc_id",
             "grams": ["bench gram here"]},
        ],
        "outputs": [],
    }
    p = Pipeline.from_config(cfg)
    out = p.transform(p.read()).to_pandas().set_index("doc_id")
    assert out.loc[3, "n_hits"] == 1 and out.loc[1, "n_hits"] == 0

    cfg2 = {
        "input": cfg["input"],
        "filters": [
            {"type": "sample", "key": "doc_id", "percent": 100,
             "method": "modulo"},
            {"type": "chunk", "field": "text", "id_field": "doc_id",
             "size": 8, "stride": 8},
        ],
        "outputs": [],
    }
    p2 = Pipeline.from_config(cfg2)
    chunks = p2.transform(p2.read()).to_pandas()
    assert (chunks[chunks.doc_id == 2].n_words.iloc[0] == 8)
    assert 4 not in set(chunks.doc_id)  # null text emits nothing


def test_config_split_and_stratified_stages(ray_session):
    """split_assign and stratified_sample compose through the config
    registry (X1 parity): a split column plus per-source keep rates,
    both on deterministic modulo buckets so the expectation is exact."""
    from go_logagent_ray.config import Pipeline

    cfg = {
        "input": {"type": "items", "items": [
            {"doc_id": i, "src": "web" if i % 2 else "chat"}
            for i in range(10)
        ]},
        "filters": [
            # modulo buckets on dense 0..9 ids: bucket == doc_id
            {"type": "stratified", "key": "doc_id", "group": "src",
             "rates": {"web": 100, "chat": 4}, "method": "modulo"},
            {"type": "split", "key": "doc_id", "method": "modulo",
             "splits": {"train": 5, "val": 95}},
        ],
        "outputs": [],
    }
    p = Pipeline.from_config(cfg)
    rows = {(r["doc_id"], r["split"])
            for r in p.transform(p.read()).take_all()}
    # chat (even ids) keeps buckets < 4 → {0, 2}; web (odd) keeps all;
    # split: bucket < 5 → train, else val
    assert rows == {(0, "train"), (2, "train"), (1, "train"), (3, "train"),
                    (5, "val"), (7, "val"), (9, "val")}


def test_chained_bucketing_decorrelates_with_seed(ray_session):
    """A keep-filter then a split on the SAME key reuse identical hash
    buckets (every survivor of keep<30 satisfies split<80 → all
    'train'); a distinct seed on the second stage decorrelates them.
    Also pins the loud modulo+seed rejection."""
    import pytest
    import ray.data as rd

    from go_logagent_ray.stages.sample import (sample_fraction,
                                               split_assign)

    ds = rd.range(2000).map_batches(
        lambda b: b.rename_columns(["doc_id"]), batch_format="pyarrow")
    kept = sample_fraction(ds, "doc_id", 30)
    same = split_assign(kept, "doc_id",
                        {"train": 80, "val": 20}).to_pandas()
    assert set(same["split"]) == {"train"}  # the correlation trap
    seeded = split_assign(kept, "doc_id", {"train": 80, "val": 20},
                          seed=7).to_pandas()
    counts = seeded["split"].value_counts().to_dict()
    assert counts.get("val", 0) > 0  # decorrelated: both splits hit
    with pytest.raises(ValueError, match="modulo"):
        split_assign(ds, "doc_id", {"train": 80, "val": 20},
                     method="modulo", seed=7).to_pandas()


def test_config_multiline_and_throttle_stages(ray_session):
    """The two §2 filters added in r4 compose through the config
    registry (X1 parity): a multiline codec chained into a throttle,
    both whole-Dataset stages dispatched via DatasetStage."""
    import pytest

    from go_logagent_ray.config import Pipeline

    cfg = {
        "input": {"type": "items", "items": [
            {"conv": "a", "line_no": 1, "text": "ERROR boom"},
            {"conv": "a", "line_no": 2, "text": "  at frame one"},
            {"conv": "a", "line_no": 3, "text": "  at frame two"},
            {"conv": "a", "line_no": 4, "text": "ERROR second"},
            {"conv": "a", "line_no": 5, "text": "ERROR third"},
            {"conv": "b", "line_no": 1, "text": "  orphan continuation"},
            {"conv": "b", "line_no": 2, "text": "ERROR other"},
        ]},
        "filters": [
            {"type": "multiline", "key": "conv", "order": "line_no"},
            # keep at most 2 joined events per conversation
            {"type": "throttle", "key_cols": ["conv"],
             "order": "event_idx", "max_per_key": 2},
        ],
        "outputs": [],
    }
    p = Pipeline.from_config(cfg)
    out = p.transform(p.read()).to_pandas() \
        .sort_values(["conv", "event_idx"]).reset_index(drop=True)
    a = out[out.conv == "a"]
    assert len(a) == 2  # third joined event throttled away
    assert a.text.tolist() == ["ERROR boom\n  at frame one\n  at frame two",
                               "ERROR second"]
    b = out[out.conv == "b"]
    assert b.event_grp.tolist() == [0, 1]  # leading orphan = group 0
    assert b.text.tolist() == ["  orphan continuation", "ERROR other"]

    # map_batches options don't apply to whole-Dataset stages — loudly
    with pytest.raises(ValueError, match="whole-Dataset"):
        Pipeline.from_config({"filters": [
            {"type": "throttle", "key_cols": ["conv"], "order": "line_no",
             "max_per_key": 1, "concurrency": 4}]})


def test_repetition_stats():
    from go_logagent_ray.functions.textstats import repetition_stats

    tbl = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], type=pa.int64()),
        "text": [
            "a b a b a b",          # bigrams: ab,ba,ab,ba,ab -> all dup
            "one two three four",   # 3 distinct bigrams, no dups
            "solo",                 # <2 tokens -> all zeros
            "",                     # empty -> all zeros
        ],
    })
    out = repetition_stats(tbl)
    assert out["n_toks"].to_pylist() == [6, 4, 1, 0]
    assert out["n_bigrams"].to_pylist() == [5, 3, 0, 0]
    # doc 0: "a b" x3 + "b a" x2, every occurrence belongs to a dup bigram
    assert out["dup_bigrams"].to_pylist() == [5, 0, 0, 0]
    assert out["top_bigram_n"].to_pylist() == [3, 1, 0, 0]
    assert out["uniq_bigrams"].to_pylist() == [2, 3, 0, 0]


def test_rebuild_conversations(ray_session):
    import hashlib

    import ray.data as rd
    from pandas import isna as pd_isna

    from go_logagent_ray.stages.rebuild import rebuild_conversations

    rows = [  # deliberately shuffled turn order within c1
        {"conv_id": "c1", "turn_idx": 2, "text": "third"},
        {"conv_id": "c1", "turn_idx": 0, "text": "first"},
        {"conv_id": "c2", "turn_idx": 0, "text": "only"},
        {"conv_id": "c1", "turn_idx": 1, "text": "second"},
    ]
    out = (rebuild_conversations(rd.from_items(rows))
           .to_pandas().set_index("conv_id"))
    joined = "first\nsecond\nthird"
    assert out.loc["c1", "n_turns"] == 3
    assert out.loc["c1", "n_chars"] == len(joined)
    assert out.loc["c1", "text_md5"] == hashlib.md5(
        joined.encode()).hexdigest()
    assert out.loc["c2", "text_md5"] == hashlib.md5(b"only").hexdigest()
    # digest is order-sensitive: a swapped turn changes it
    rows_swapped = [dict(r) for r in rows]
    rows_swapped[0]["turn_idx"], rows_swapped[1]["turn_idx"] = 0, 2
    out2 = (rebuild_conversations(rd.from_items(rows_swapped))
            .to_pandas().set_index("conv_id"))
    assert out2.loc["c1", "text_md5"] != out.loc["c1", "text_md5"]
    # null turns: skipped from the digest (SQL string_agg parity), still
    # counted in n_turns; all-null conv -> null digest
    rows_null = [
        {"conv_id": "n1", "turn_idx": 0, "text": "a"},
        {"conv_id": "n1", "turn_idx": 1, "text": None},
        {"conv_id": "n1", "turn_idx": 2, "text": "b"},
        {"conv_id": "n2", "turn_idx": 0, "text": None},
    ]
    out3 = (rebuild_conversations(rd.from_items(rows_null))
            .to_pandas().set_index("conv_id"))
    assert out3.loc["n1", "n_turns"] == 3
    assert out3.loc["n1", "text_md5"] == hashlib.md5(b"a\nb").hexdigest()
    assert pd_isna(out3.loc["n2", "text_md5"])
    # null ORDER key sorts LAST (numpy-argsort + DuckDB ORDER BY
    # convention; polars would default it FIRST — r5 review regression)
    rows_nullkey = [
        {"conv_id": "k1", "turn_idx": None, "text": "X"},
        {"conv_id": "k1", "turn_idx": 1, "text": "A"},
        {"conv_id": "k1", "turn_idx": 0, "text": "B"},
    ]
    out4 = (rebuild_conversations(rd.from_items(rows_nullkey))
            .to_pandas().set_index("conv_id"))
    assert out4.loc["k1", "text_md5"] == hashlib.md5(b"B\nA\nX").hexdigest()


def test_unigram_rank_score(ray_session):
    import ray.data as rd

    from go_logagent_ray.stages.lm import unigram_rank_score

    rows = [
        {"doc_id": 0, "text": "a a a b b c"},   # counts: a=5,b=3,c=1,d=1
        {"doc_id": 1, "text": "a a b D"},        # lowercased -> d
        {"doc_id": 2, "text": ""},
    ]
    # V=2 vocab: rank1=a(cnt5), rank2=b(cnt3); c and d are OOV
    out = (unigram_rank_score(rd.from_items(rows), vocab_size=2)
           .to_pandas().set_index("doc_id").sort_index())
    assert out.loc[0].tolist() == [6, 1, 1*3 + 2*2, 5*3 + 3*2]
    assert out.loc[1].tolist() == [4, 1, 1*2 + 2*1, 5*2 + 3*1]
    assert out.loc[2].tolist() == [0, 0, 0, 0]


def test_config_repetition_stage(ray_session):
    """X1: the repetition quality filter is config-pluggable and its
    threshold drops repetitive rows."""
    from go_logagent_ray.config import Pipeline

    cfg = {"input": {"type": "items", "items": [
               {"doc_id": 1, "text": "a b " * 15},
               {"doc_id": 2, "text": "one two three four five"},
           ]},
           "filters": [{"type": "repetition", "max_dup_permille": 300}],
           "outputs": []}
    out = Pipeline.from_config(cfg)
    df = out.transform(out.read()).to_pandas()
    assert df.doc_id.tolist() == [2]
    assert "dup_bigrams" in df.columns


def test_doc_freq_and_inverted_index_null_text_matches_oracle(ray_session):
    """Round-3 advice: a null-text document must emit ZERO term rows
    (the oracle's unnest(string_split(NULL,' ')) is zero rows), not a
    single null term that polars group_by would count."""
    import os
    import tempfile

    import duckdb
    import pyarrow.parquet as pq

    from go_logagent_ray.pipelines.queries import (SQL_DOC_FREQ_TERMS,
                                                   SQL_INVERTED_INDEX_DOCS,
                                                   q_doc_freq_terms,
                                                   q_inverted_index_docs)

    d = tempfile.mkdtemp(prefix="glr_nulldoc_")
    t = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array(["a b a", None, "b c", None]),
    })
    pq.write_table(t, os.path.join(d, "documents.parquet"))
    con = duckdb.connect()
    con.register("documents", t)

    got = q_doc_freq_terms(d).to_pandas().sort_values(
        ["df", "term"], ascending=[False, True]).reset_index(drop=True)
    exp = con.sql(SQL_DOC_FREQ_TERMS).df().sort_values(
        ["df", "term"], ascending=[False, True]).reset_index(drop=True)
    assert got.term.tolist() == exp.term.tolist()
    assert got.df.tolist() == exp.df.tolist()

    got = q_inverted_index_docs(d).to_pandas().sort_values(
        ["term", "shard"]).reset_index(drop=True)
    exp = con.sql(SQL_INVERTED_INDEX_DOCS).df().sort_values(
        ["term", "shard"]).reset_index(drop=True)
    assert got.term.tolist() == exp.term.tolist()
    assert got.postings.tolist() == exp.postings.tolist()


def test_config_pii_stage_idempotent_columns(ray_session):
    """Round-3 advice: running the pii stage twice in a chain must
    overwrite its count columns, not append duplicates that break
    by-name selects."""
    from go_logagent_ray.config import STAGE_REGISTRY

    fn, _ = STAGE_REGISTRY["pii"]({"field": "text"})
    t = pa.table({"text": pa.array(["mail me: bob@example.com", "none"])})
    once = fn(t)
    twice = fn(once)
    assert twice.column_names.count("n_email") == 1
    assert twice.column_names == once.column_names
    assert twice["n_email"].to_pylist() == [0, 0]  # already scrubbed


def test_lm_bucket_tercile_ties_match_duckdb(ray_session):
    """head/middle/tail bucketing with heavy ties at the tercile
    boundaries (all-identical docs collapse to one score value) must
    match quantile_disc semantics exactly."""
    import os
    import tempfile

    import duckdb
    import pyarrow.parquet as pq

    from go_logagent_ray.pipelines.queries import (SQL_LM_BUCKET_DOCS,
                                                   q_lm_bucket_docs)

    d = tempfile.mkdtemp(prefix="glr_lmb_")
    texts = (["a a a"] * 7            # one hot score value (ties)
             + ["a b c d"] * 5
             + ["zz yy xx ww vv uu"] * 4   # OOV-heavy
             + [None, "", "   "])
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    pq.write_table(t, os.path.join(d, "documents.parquet"))
    con = duckdb.connect()
    con.register("documents", t)
    got = q_lm_bucket_docs(d).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    exp = con.sql(SQL_LM_BUCKET_DOCS).df().sort_values("doc_id") \
        .reset_index(drop=True)
    assert got.doc_id.tolist() == exp.doc_id.tolist()
    assert got.score_q.tolist() == exp.score_q.tolist()
    assert got.bucket.tolist() == exp.bucket.tolist()
    assert set(got.bucket) == {"head", "middle", "tail"}
