"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship parse→enrich→route→aggregate pipeline on
/root/testdata/sf0.001 (transcripts derived deterministically from the
events table — the testdata has no transcripts table; the derivation is
SQL-mirrorable so the oracle covers the whole chain).

``queries()`` / ``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 plus the training-data ops (dedup, ANN, text analysis); see
go_logagent_ray/pipelines/queries.py for the definitions.

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in the library) calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001; returns the routed
    Dataset (stable schema, rows == input events rows)."""
    from go_logagent_ray.pipelines.queries import transcripts_from_events
    from go_logagent_ray.pipelines.transcript import parse_enrich_route

    return parse_enrich_route(transcripts_from_events("/root/testdata/sf0.001"))


def queries() -> dict[str, Callable[[str], Any]]:
    from go_logagent_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    # only oracles for driver-exposed queries (ORACLE_SQL also carries
    # entries for the EXTRA_QUERIES variants pytest runs locally)
    from go_logagent_ray.pipelines.queries import ORACLE_SQL, QUERIES

    return {k: v for k, v in ORACLE_SQL.items() if k in QUERIES}
