"""Edge cases for the round-3 training-data operators: chunking,
sequence packing, decontamination (the query-level oracle equivalence
lives in test_queries_vs_duckdb.py)."""

import pyarrow as pa
import ray

from go_logagent_ray.stages.chunk import chunk_documents
from go_logagent_ray.stages.decontaminate import (build_benchmark_grams,
                                                  decontaminate)
from go_logagent_ray.stages.pack import pack_documents


def _docs(rows):
    t = pa.table({"doc_id": pa.array([r[0] for r in rows], pa.int64()),
                  "text": pa.array([r[1] for r in rows], pa.string())})
    return ray.data.from_arrow(t)


def test_chunk_short_and_exact_boundary():
    ds = _docs([(1, "a b c"), (2, " ".join(f"w{i}" for i in range(32))),
                (3, " ".join(f"w{i}" for i in range(33)))])
    out = chunk_documents(ds, size=32, stride=24).to_pandas()
    by = {(r.doc_id, r.chunk_idx): r for r in out.itertuples()}
    # short doc: one chunk, all words
    assert by[(1, 0)].n_words == 3 and by[(1, 0)].chunk_text == "a b c"
    # exactly 32 words: chunk 0 full; chunk 1 starts at word 24 (8 left)
    assert by[(2, 0)].n_words == 32 and by[(2, 1)].n_words == 8
    # 33 words: chunk 1 covers words 24..32 (9 words)
    assert by[(3, 1)].n_words == 9
    assert by[(3, 1)].chunk_text.split(" ")[0] == "w24"


def test_chunk_single_chunk_when_stride_ge_len():
    ds = _docs([(7, "x y")])
    out = chunk_documents(ds, size=4, stride=10).to_pandas()
    assert len(out) == 1 and out.iloc[0].chunk_text == "x y"


def test_pack_oversized_doc_gets_own_bin():
    big = " ".join(["t"] * 500)   # tok 500 > budget 256
    ds = _docs([(0, "a b"), (1, big), (2, "c d e")])
    out = pack_documents(ds, budget=256, group_width=64).to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    assert list(out.bin_idx) == [0, 1, 2]  # big doc forces bins around it


def test_pack_groups_are_independent():
    rows = [(i, "w " * 100) for i in range(3)] + \
           [(64 + i, "w " * 100) for i in range(3)]
    out = pack_documents(_docs(rows), budget=256,
                         group_width=64).to_pandas()
    # each group restarts bin numbering at 0
    g0 = out[out.pack_group == 0].sort_values("doc_id")
    g1 = out[out.pack_group == 1].sort_values("doc_id")
    assert list(g0.bin_idx) == list(g1.bin_idx)
    assert g0.bin_idx.iloc[0] == 0 and g1.bin_idx.iloc[0] == 0


def test_decontaminate_hits_and_short_benchmark_docs():
    bench_text = "q1 q2 q3 q4 q5 q6 q7 q8 tail tail"
    rows = [(0, bench_text),                       # benchmark source: hit
            (97, "too short"),                     # %97==0 but <8 words: no gram
            (5, "prefix q1 q2 q3 q4 q5 q6 q7 q8 suffix"),  # contains gram
            (6, "clean doc with no benchmark content")]
    ds = _docs(rows)
    grams = build_benchmark_grams(ds)
    assert grams == ["q1 q2 q3 q4 q5 q6 q7 q8"]
    out = decontaminate(ds).to_pandas().set_index("doc_id")["n_hits"]
    assert out[0] == 1 and out[5] == 1
    assert out[6] == 0 and out[97] == 0


def test_chunk_null_text_emits_no_chunks():
    t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "text": pa.array(["a b c", None], pa.string())})
    out = chunk_documents(ray.data.from_arrow(t)).to_pandas()
    assert list(out.doc_id) == [1]
