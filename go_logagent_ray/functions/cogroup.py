"""Shared scaffold for two-sided co-grouped operators (as-of join,
bucketed range join): pad each side's batches to one union schema with
TYPED nulls plus an int8 ``_side`` tag, so the two Datasets can be
``union``-ed and co-located by a single ``groupby`` shuffle.

The per-group function MUST run with ``batch_format="pyarrow"`` and
split the sides BEFORE any pandas conversion: a pandas frame holding the
null-padded union would silently convert int64 columns to float64 and
corrupt values above 2^53 (distinct snowflake-style ids collapse).
Filtering each side first leaves only that side's fully-populated
columns, so types survive exactly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

SIDE_COL = "_side"


def pad_to_schema(cols: dict[str, pa.Array],
                  schema_types: dict[str, "pa.DataType"],
                  n: int, side: int) -> pa.Table:
    """One side's batch → the shared union schema: present columns pass
    through, absent ones become typed nulls, plus the ``_side`` tag."""
    out = {name: cols.get(name, pa.nulls(n, typ))
           for name, typ in schema_types.items()}
    out[SIDE_COL] = pa.array(np.full(n, side, dtype=np.int8))
    return pa.table(out)


def split_sides(group: pa.Table) -> tuple[pa.Table, pa.Table]:
    """Split a co-grouped table back into (left, right) by ``_side`` —
    call BEFORE selecting columns / converting to pandas."""
    import pyarrow.compute as pc

    side = group[SIDE_COL]
    return (group.filter(pc.equal(side, 0)),
            group.filter(pc.equal(side, 1)))
