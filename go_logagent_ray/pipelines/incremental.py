"""Incremental micro-batch mode — the tail-file streaming analog (EP2).

The reference is a STREAMING agent: it tails files and processes events as
they arrive (``ref: input/file/`` per-file offsets, SURVEY.md §3.1 EP2).
Ray Data is a batch engine; the Ray-native analog is micro-batching: each
arriving chunk of transcript rows runs through the SAME vectorized filter
chain (one small Dataset per chunk), sinks append per-chunk partitions,
and *running aggregates* are kept in per-bucket STATE ACTORS.

This is the one place raw ``@ray.remote`` actors are warranted (SURVEY.md
§2 custom-operator rule (c)): a running count is shared mutable state
across chunks, which the Dataset API cannot express. State is sharded by
``hash(key) % num_buckets`` so no actor is a hot spot; each update ships
only partial-count tables (bounded by key cardinality per chunk), never
rows. On a real cluster the actors spread across nodes and survive
between chunks; a killed driver can rebuild them by replaying committed
chunk manifests (same resume story as state/checkpoint.py).
"""

from __future__ import annotations

import os
from collections import Counter

import numpy as np
import pyarrow as pa
import ray


@ray.remote(num_cpus=0.1)
class CountState:
    """One shard of the running grouped counts (keys → count)."""

    def __init__(self):
        self.counts: Counter = Counter()

    def update(self, keys: list[tuple], values: list[int]) -> int:
        for k, v in zip(keys, values):
            self.counts[k] += v
        return len(self.counts)

    def totals(self) -> dict:
        return dict(self.counts)


class IncrementalRunner:
    """Feed transcript chunks; sinks append, running counts stay exact.

    NOT for the 100 TB backfill path (use the checkpointed batch runner);
    this is the low-latency tail-processing mode for new data arriving in
    chunks.
    """

    def __init__(self, out_dir: str, agg_keys: list[str] | None = None,
                 num_buckets: int = 8):
        from ..functions.hashing import stable_hash64

        self._hash = stable_hash64
        self.out_dir = out_dir
        self.agg_keys = agg_keys or ["route", "role", "tool", "ts_hour"]
        self.actors = [CountState.remote() for _ in range(num_buckets)]
        self.num_buckets = num_buckets
        self.chunk_idx = 0
        os.makedirs(out_dir, exist_ok=True)

    def process_chunk(self, table: pa.Table) -> dict:
        """Convenience wrapper: one in-memory Arrow chunk (e.g. from a
        socket source's poll loop).  Deliberately does NOT pass a row
        count: both call paths must share the post-filter-count
        semantics (a chunk whose rows are all dropped by the parse
        chain writes no chunk dir and reports rows=0 either way)."""
        import ray.data as rd

        if table.num_rows == 0:
            # nothing arrived this tick — no chunk dir, no state update
            return {"chunk": self.chunk_idx, "rows": 0, "groups_touched": 0}
        return self.process_chunk_dataset(rd.from_arrow(table))

    def process_chunk_dataset(self, ds, n_rows: int | None = None) -> dict:
        """Parse→enrich→route one chunk DATASET; append sinks; update
        state.  The chunk never lands on the driver as rows: sinks are
        written from the materialized blocks, and the state update reads
        per-block PARTIAL count tables (bounded by key cardinality per
        block), not the chunk's columns."""
        from .transcript import parse_enrich_route

        routed = parse_enrich_route(ds, batch_size=None).materialize()
        if n_rows is None:
            n_rows = routed.count()
        if n_rows == 0:
            return {"chunk": self.chunk_idx, "rows": 0, "groups_touched": 0}
        chunk_dir = os.path.join(self.out_dir, f"chunk-{self.chunk_idx:06d}")
        routed.write_parquet(chunk_dir, partition_cols=["route"])

        agg_keys = self.agg_keys

        def part_counts(batch: pa.Table) -> pa.Table:
            p = batch.group_by(agg_keys).aggregate([([], "count_all")])
            cols = {k: p[k] for k in agg_keys}   # by-name, never positional
            cols["_n"] = p["count_all"]
            return pa.table(cols)

        part_rows = routed.select_columns(agg_keys).map_batches(
            part_counts, batch_format="pyarrow", batch_size=None).take_all()
        merged: Counter = Counter()
        for r in part_rows:
            merged[tuple(r[k] for k in agg_keys)] += r["_n"]
        keys = list(merged)
        vals = [merged[k] for k in keys]

        # shard updates by key hash; one small RPC per bucket
        shard_of = self._hash([str(k) for k in keys]) % self.num_buckets \
            if keys else []
        futures = []
        for b in range(self.num_buckets):
            ks = [k for k, s in zip(keys, shard_of) if s == b]
            vs = [v for v, s in zip(vals, shard_of) if s == b]
            if ks:
                futures.append(self.actors[b].update.remote(ks, vs))
        ray.get(futures)
        self.chunk_idx += 1
        return {"chunk": self.chunk_idx - 1, "rows": n_rows,
                "groups_touched": len(keys)}

    def running_counts(self) -> dict:
        """Exact totals over everything processed so far."""
        out: Counter = Counter()
        for totals in ray.get([a.totals.remote() for a in self.actors]):
            out.update(totals)
        return dict(out)

    def shutdown(self) -> None:
        for a in self.actors:
            ray.kill(a)
        self.actors = []


@ray.remote(num_cpus=0.1)
class SeenState:
    """One shard of the global seen-content-hash set (streaming dedup).

    Memory regime: 8 bytes × distinct-content count ÷ num_buckets per
    actor (plus set overhead) — the same broadcast-keepers regime as
    ``exact_dedup_broadcast`` (~100M distinct across a few GB). This is
    the low-latency TAIL mode; the 100 TB backfill path is the batch
    ``exact_keepers`` shuffle, exactly as with CountState above.
    """

    def __init__(self):
        self.seen: set[int] = set()

    def filter_new(self, fps: list[int]) -> list[bool]:
        """For each fingerprint IN ORDER: True if first ever seen (and
        mark seen), else False. Called once per (chunk, shard) — chunk
        sequencing in the runner makes this deterministic."""
        out = []
        for h in fps:
            if h in self.seen:
                out.append(False)
            else:
                self.seen.add(h)
                out.append(True)
        return out

    def n_seen(self) -> int:
        return len(self.seen)


class StreamingDedup:
    """Streaming exact dedup over arriving chunks — the stateful
    cross-chunk analog of ``exact_keepers`` (a shared mutable seen-set
    is the other thing the Dataset API cannot express, custom-operator
    rule (c)).

    Per chunk: every block reduces to (fingerprint, min id) PARTIALS
    inside ``map_batches`` (rows never reach the driver; the driver
    merge is bounded by the chunk's distinct-content count, the same
    regime as IncrementalRunner's merged Counter), fingerprints are
    hash-sharded across ``SeenState`` actors, and each actor answers
    first-seen atomically for its shard. Keeper semantics: the min id
    within the FIRST chunk that contains the content; feed chunks in id
    order (id-range chunks) and this equals the global
    ``MIN(id) GROUP BY text`` — the batch-dedup oracle.
    """

    def __init__(self, num_buckets: int = 8, *, text_field: str = "text",
                 id_field: str = "doc_id"):
        self.actors = [SeenState.remote() for _ in range(num_buckets)]
        self.num_buckets = num_buckets
        self.text_field = text_field
        self.id_field = id_field

    def process_chunk_dataset(self, ds) -> list[int]:
        """Returns the doc ids ACCEPTED from this chunk (first holders
        of content never seen before), ascending."""
        from ..functions.textstats import raw_fingerprint

        text_field, id_field = self.text_field, self.id_field

        def partial(batch: pa.Table) -> pa.Table:
            b = raw_fingerprint(batch, field=text_field, out="_fp")
            p = (b.select(["_fp", id_field]).group_by(["_fp"])
                 .aggregate([(id_field, "min")]))
            return p.select(["_fp", id_field + "_min"]) \
                .rename_columns(["_fp", id_field])

        # Driver merge stays numpy end-to-end (16 bytes/row, one
        # lexsort) — never Python row-dicts, whose ~100 bytes/row plus
        # a per-row dict insert would make the driver the bottleneck
        # long before the arrays do (same rule as exact_dedup_broadcast).
        fp_parts: list[np.ndarray] = []
        id_parts: list[np.ndarray] = []
        for b in ds.map_batches(partial, batch_format="pyarrow") \
                .iter_batches(batch_format="pyarrow"):
            fp_parts.append(b.column("_fp").to_numpy(zero_copy_only=False))
            id_parts.append(b.column(id_field)
                            .to_numpy(zero_copy_only=False))
        fp_all = (np.concatenate(fp_parts) if fp_parts
                  else np.zeros(0, np.int64)).astype(np.int64, copy=False)
        id_all = (np.concatenate(id_parts) if id_parts
                  else np.zeros(0, np.int64)).astype(np.int64, copy=False)
        order = np.lexsort((id_all, fp_all))
        fp_s, id_s = fp_all[order], id_all[order]
        first = np.ones(fp_s.size, dtype=bool)
        first[1:] = fp_s[1:] != fp_s[:-1]
        # fps ascending (lexsort primary key) — deterministic payloads.
        fps_u, ids_u = fp_s[first], id_s[first]
        # numpy floor-mod keeps shards in [0, num_buckets) for
        # negative int64 fingerprints too.
        shard_of = fps_u % self.num_buckets
        futures, shard_ids = [], []
        for b in range(self.num_buckets):
            m = shard_of == b
            shard_ids.append(ids_u[m])
            futures.append(self.actors[b].filter_new.remote(
                fps_u[m].tolist()))
        kept: list[int] = []
        for ks, mask in zip(shard_ids, ray.get(futures)):
            kept.extend(int(i) for i, new in zip(ks, mask) if new)
        return sorted(kept)

    def n_distinct(self) -> int:
        return sum(ray.get([a.n_seen.remote() for a in self.actors]))

    def shutdown(self) -> None:
        for a in self.actors:
            ray.kill(a)
        self.actors = []
