"""Per-partition checkpoints: lineage manifests + row-count metrics (M4).

Generalizes the reference's file-input offset registry (sincedb-style
per-file byte offsets, ``ref: input/file/`` [U-recall], SURVEY.md §2.1 S1)
to batch partitions, per BASELINE.json:L6/L14: "per-partition checkpoints
carrying lineage manifests + row-count metrics so a killed `ray job
submit` run resumes without re-parsing completed partitions."

Design (SURVEY.md §4.3):

- A **partition** is a deterministic group of parquet fragments
  ``(file, row-group range)`` — a pure function of the sorted input file
  list and ``rows_per_partition``, independent of Ray scheduling order.
- Each partition is processed as its own bounded Dataset wave:
  read fragments → filter chain → write sinks under
  ``out/<sink>/part-<pid>/`` — written to a ``.tmp-<pid>`` staging dir
  first, then atomically renamed, then the manifest
  ``out/_manifest/part-<pid>.json`` (lineage + per-sink row counts +
  config hash) is written via tmp+rename. A partition is committed iff
  its manifest exists and its config hash matches.
- Resume: list manifests, subtract committed partitions, run only the
  remainder; aggregate metrics merge committed manifest counts with the
  new waves. Idempotent: commits are atomic, partitions deterministic.

Scale note: on a multi-node cluster each wave should hold enough
fragments to saturate the cluster (``rows_per_partition`` ≈ cluster
throughput × minutes of work); waves bound both checkpoint granularity
and worst-case recomputation after a kill.
"""

from __future__ import annotations

import hashlib
import json
import os
from collections import Counter
from dataclasses import asdict, dataclass

import pyarrow as pa
import pyarrow.parquet as pq


@dataclass(frozen=True)
class Fragment:
    """Lineage unit: a contiguous row-group range of one parquet file."""

    file: str
    rg_start: int  # inclusive
    rg_end: int    # exclusive
    rows: int


def list_fragments(paths: list[str], rgs_per_fragment: int = 4) -> list[Fragment]:
    """Deterministic fragment list: sorted files, fixed row-group chunks.

    Directory entries expand to their sorted contained ``*.parquet``
    files (recursive), so CLI ``--input DIR`` works as advertised."""
    files: list[str] = []
    for path in paths:
        if os.path.isdir(path):
            for root, _dirs, names in os.walk(path):
                files.extend(os.path.join(root, n) for n in names
                             if n.endswith(".parquet"))
        else:
            files.append(path)
    frags: list[Fragment] = []
    for path in sorted(files):
        md = pq.ParquetFile(path).metadata
        n = md.num_row_groups
        for start in range(0, n, rgs_per_fragment):
            end = min(start + rgs_per_fragment, n)
            rows = sum(md.row_group(i).num_rows for i in range(start, end))
            frags.append(Fragment(path, start, end, rows))
    return frags


def plan_partitions(
    frags: list[Fragment], rows_per_partition: int
) -> list[list[Fragment]]:
    """Greedy deterministic bin-fill in fragment order."""
    parts: list[list[Fragment]] = []
    cur: list[Fragment] = []
    cur_rows = 0
    for f in frags:
        if cur and cur_rows + f.rows > rows_per_partition:
            parts.append(cur)
            cur, cur_rows = [], 0
        cur.append(f)
        cur_rows += f.rows
    if cur:
        parts.append(cur)
    return parts


def config_hash(spec) -> str:
    return hashlib.sha256(
        json.dumps(spec, sort_keys=True, default=str).encode()
    ).hexdigest()[:16]


def _manifest_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "_manifest")


def committed_partitions(out_dir: str, cfg_hash: str) -> dict[int, dict]:
    """pid -> manifest for partitions already committed under this config."""
    mdir = _manifest_dir(out_dir)
    out: dict[int, dict] = {}
    if not os.path.isdir(mdir):
        return out
    for name in os.listdir(mdir):
        if not (name.startswith("part-") and name.endswith(".json")):
            continue
        with open(os.path.join(mdir, name)) as f:
            m = json.load(f)
        if m.get("config_hash") == cfg_hash:
            out[int(m["part_id"])] = m
    return out


def _atomic_write_json(path: str, obj) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f, indent=1, default=str)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def _read_fragments_batch(batch: pa.Table):
    """Generator map_batches body: spec rows in → row-group tables out.

    Runs as parallel Ray tasks (one per spec block); each task streams its
    row groups so a fragment never needs to fit in memory twice.
    """
    for row in batch.to_pylist():
        pf = pq.ParquetFile(row["file"])
        for rg in range(row["rg_start"], row["rg_end"]):
            yield pf.read_row_group(rg)


def fragments_dataset(frags: list[Fragment], parallelism: int | None = None):
    """A Dataset of the fragments' rows, read in parallel by row group."""
    import ray.data as rd

    specs = [asdict(f) for f in frags]
    ds = rd.from_items(specs, override_num_blocks=max(1, min(len(specs), parallelism or len(specs))))
    return ds.map_batches(
        _read_fragments_batch, batch_format="pyarrow", batch_size=1
    )


def run_checkpointed(
    input_paths: list[str],
    out_dir: str,
    transform,  # Dataset -> Dataset (must add a `route` column)
    pipeline_spec,  # hashable config for the config_hash guard
    *,
    rows_per_partition: int = 2_000_000,
    rgs_per_fragment: int = 4,
    max_partitions: int | None = None,
) -> dict:
    """Run the pipeline wave-per-partition with atomic resume.

    Returns {"committed": int, "skipped": int, "total_counts":
    Counter[sink], "manifests": [dict]}. ``max_partitions`` bounds how many
    *new* partitions run this call (used by the kill/resume test).
    """
    cfg = config_hash(pipeline_spec)
    os.makedirs(_manifest_dir(out_dir), exist_ok=True)

    frags = list_fragments(input_paths, rgs_per_fragment)
    parts = plan_partitions(frags, rows_per_partition)
    done = committed_partitions(out_dir, cfg)

    total_counts: Counter = Counter()
    manifests: list[dict] = []

    ran = skipped = 0
    for pid, part in enumerate(parts):
        committed = done.get(pid)
        # A committed pid is only valid if its LINEAGE matches the freshly
        # planned fragments — if the input file set changed, partition ids
        # reshuffle and a config-hash-only match would silently skip the
        # wrong data. Mismatched manifests are recomputed (atomic replace).
        if committed is not None and committed["fragments"] == [asdict(f) for f in part]:
            total_counts.update(committed["counts"])
            manifests.append(committed)
            skipped += 1
            continue
        if max_partitions is not None and ran >= max_partitions:
            break
        counts, schema_hash = _run_partition(pid, part, out_dir, transform)
        manifest = {
            "part_id": pid,
            "fragments": [asdict(f) for f in part],
            "counts": counts,
            "rows_in": sum(f.rows for f in part),
            "config_hash": cfg,
            "schema_hash": schema_hash,
        }
        _atomic_write_json(
            os.path.join(_manifest_dir(out_dir), f"part-{pid}.json"), manifest
        )
        total_counts.update(counts)
        manifests.append(manifest)
        ran += 1

    return {
        "committed": ran,
        "skipped": skipped,
        "remaining": len(parts) - skipped - ran,
        "total_counts": total_counts,
        "manifests": manifests,
    }


def _run_partition(pid: int, part: list, out_dir: str, transform):
    """One wave: read fragments → transform → staged write → atomic rename.

    Returns (per-sink row counts, output schema hash)."""
    import shutil

    staging = os.path.join(out_dir, f".tmp-part-{pid}")
    if os.path.isdir(staging):
        shutil.rmtree(staging)  # leftover from a killed run — safe to redo
    ds = fragments_dataset(part)
    routed = transform(ds)
    routed.write_parquet(staging, partition_cols=["route"])

    schema_hash = ""
    counts: dict[str, int] = {}
    for name in sorted(os.listdir(staging)):
        if not name.startswith("route="):
            continue
        sink = name.split("=", 1)[1]
        src = os.path.join(staging, name)
        rows = 0
        for f in os.listdir(src):
            if not f.endswith(".parquet"):
                continue
            pf = pq.ParquetFile(os.path.join(src, f))
            rows += pf.metadata.num_rows
            if not schema_hash:
                schema_hash = hashlib.sha256(
                    pf.schema_arrow.to_string().encode()).hexdigest()[:16]
        dst = os.path.join(out_dir, sink, f"part-{pid}")
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        if os.path.isdir(dst):
            shutil.rmtree(dst)  # uncommitted partial from a killed run
        os.replace(src, dst)
        counts[sink] = rows
    shutil.rmtree(staging, ignore_errors=True)
    return counts, schema_hash
