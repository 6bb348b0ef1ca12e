"""Flagship pipeline: transcripts → grok parse → patch → enrich → route →
sinks + aggregates (SURVEY.md §3.2).

This is the Ray-Data re-expression of the reference's whole agent run
(``main.go`` wiring input→filter chain→output fan-out, SURVEY.md §3.1):

    read_parquet(transcripts)                       # S1
      └ map_batches(GrokParser actor pool)          # F1
      └ map_batches(PatchStage)                     # F2/F3
      └ map_batches(LookupEnrich broadcast dict)    # J1
      └ map_batches(RouteStage)                     # R1 route column
      ├ write_parquet(partition_cols=["route"])     # sinks, ONE pass
      └ counts_by(route, role, tool, ts_hour)       # A1 (pre-aggregated)

The stage specs here mirror go_logagent_ray.oracle exactly — the oracle is
the row-level reference the pipeline must equal.
"""

from __future__ import annotations

import pyarrow as pa
from ray.data import Dataset

from ..oracle import ENRICH_DEFAULT, ENRICH_LOOKUP, GROK_PATTERNS, SINKS
from ..stages.aggregate import counts_by
from ..stages.enrich import LookupEnrich
from ..stages.grok import GrokParser
from ..stages.patch import PatchStage
from ..stages.route import RouteStage

PATCH_OPS = [
    ("add_field", "pipeline_id", "agentlog"),
    ("time_floor", "ts", "ts_hour", "hour"),
]

ROUTE_RULES = [
    ("errors", [("in", "status", ["err", "timeout"])]),
    ("tool_events", [("eq", "role", "tool")]),
    ("tool_events", [("ne", "tool", "")]),
    ("chat", [("in", "role", ["user", "assistant"])]),
]

AGG_KEYS = ["route", "role", "tool", "ts_hour"]


def parse_enrich_route(
    ds: Dataset,
    *,
    parse_concurrency: int | tuple[int, int] | None = None,
    batch_size: int | None = 16 * 1024,
) -> Dataset:
    """The full filter chain; lazy — nothing executes until consumed.

    ``parse_concurrency`` sizes the grok actor pool (None → stateless
    tasks; fine for small runs, use a pool on real clusters so pattern
    compilation is amortized per actor, BASELINE.json:L6).
    """
    grok_kwargs = dict(patterns=GROK_PATTERNS)
    if parse_concurrency is not None:
        ds = ds.map_batches(
            GrokParser,
            fn_constructor_kwargs=grok_kwargs,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=batch_size,
            concurrency=parse_concurrency,
        )
    else:
        ds = ds.map_batches(
            GrokParser(**grok_kwargs),
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=batch_size,
        )
    ds = ds.map_batches(
        PatchStage(PATCH_OPS), batch_format="pyarrow", zero_copy_batch=True,
        batch_size=batch_size,
    )
    ds = ds.map_batches(
        LookupEnrich(
            ENRICH_LOOKUP,
            key_fields=("role", "tool"),
            value_names=("agent_kind", "enrich_tag"),
            tag_value_index=1,
            default=ENRICH_DEFAULT,
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
    )
    ds = ds.map_batches(
        RouteStage(ROUTE_RULES, default_sink="default"),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
    )
    return ds


def flagship_counts(written: Dataset) -> Dataset:
    """Both aggregate views (per-sink and per-conv) in ONE pass + ONE
    shuffle via fused partial counts; filter on ``_agg`` to split."""
    from ..stages.aggregate import fused_counts

    return fused_counts(
        written,
        {"sink": ["route", "role", "tool", "ts_hour"], "conv": ["conv_id"]},
        alias="n",
    )


def write_sinks(routed: Dataset, out_dir: str) -> None:
    """One streaming pass: hive-partitioned parquet, one dir per sink.

    ``route`` is the partition column, so sink fan-out costs no extra pass
    and no shuffle. At 100 TB the downstream aggregate reads these files
    back with column pruning instead of re-executing the parse chain.

    NOTE: writing twice into the same directory APPENDS part files
    (observed behavior of ``write_parquet``) — use a fresh directory, or
    the checkpointed runner in ``state/checkpoint.py`` for atomic,
    resumable per-partition commits.
    """
    routed.write_parquet(out_dir, partition_cols=["route"])


def write_errors_json(routed: Dataset, path: str) -> None:
    """R3: the redis-sink stand-in — the ``errors`` route additionally as
    JSON lines (the reference LPUSHes JSON to redis; sinks here are
    Parquet/JSON per BASELINE.json:L6). ``tags`` lists serialize as JSON
    arrays."""
    from ..stages.route import split_to_sink

    routed.map_batches(
        split_to_sink, fn_kwargs={"sink": "errors"}, batch_format="pyarrow",
    ).write_json(path)


def sink_counts(routed: Dataset) -> Dataset:
    """A1: counts by (route, role, tool, ts_hour); columns named for SQL."""
    return counts_by(routed, AGG_KEYS, alias="n")


def conv_counts(routed: Dataset) -> Dataset:
    """A1: per-conversation turn counts."""
    return counts_by(routed, ["conv_id"], alias="n")


def run_flagship(
    paths: str | list[str],
    out_dir: str | None = None,
    *,
    parse_concurrency: int | tuple[int, int] | None = None,
    batch_size: int | None = 16 * 1024,
) -> dict:
    """Read → filter chain → (optional sinks) → aggregates.

    Returns {"routed": Dataset, "sink_counts": Dataset, "conv_counts":
    Dataset}. Ray must already be initialised by the caller (driver
    contract — this library never calls ray.init).
    """
    import ray.data as rd

    ds = rd.read_parquet(paths)
    routed = parse_enrich_route(
        ds, parse_concurrency=parse_concurrency, batch_size=batch_size
    )
    if out_dir is not None:
        write_sinks(routed, out_dir)
    return {
        "routed": routed,
        "sink_counts": sink_counts(routed),
        "conv_counts": conv_counts(routed),
    }
