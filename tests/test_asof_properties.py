"""Property tests for the pure-Arrow as-of merge kernel against
pandas.merge_asof — both directions, arbitrary times including
duplicates and empty sides.  No Ray session needed: _merge_asof is a
local function."""

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from go_logagent_ray.stages.asof import _merge_asof

times = st.lists(st.integers(min_value=-1000, max_value=1000),
                 min_size=0, max_size=40)


def _run(l_times, r_times, direction):
    lg = pa.table({"t": pa.array(l_times, pa.int64()),
                   "lid": pa.array(range(len(l_times)), pa.int64())})
    rg = pa.table({"t_r": pa.array(r_times, pa.int64())})
    matched, unmatched = _merge_asof(lg, rg, "t", "t_r",
                                     ["t", "lid"], ["t_r"], direction)
    got = {int(r["lid"]): int(r["t_r"])
           for r in matched.to_pylist()}
    miss = {int(r["lid"]) for r in unmatched.to_pylist()}
    return got, miss


def _ref(l_times, r_times, direction):
    ldf = pd.DataFrame({"t": pd.array(l_times, dtype="int64"),
                        "lid": pd.array(range(len(l_times)),
                                        dtype="int64")}) \
        .sort_values("t", kind="stable")
    rdf = pd.DataFrame({"t": pd.array(r_times, dtype="int64"),
                        "rt": pd.array(r_times, dtype="int64")}) \
        .sort_values("t", kind="stable")
    if len(rdf) == 0:
        return {}, set(range(len(l_times)))
    m = pd.merge_asof(ldf, rdf, on="t", direction=direction)
    got = {int(r.lid): int(r.rt) for r in m.itertuples()
           if not pd.isna(r.rt)}
    miss = {int(r.lid) for r in m.itertuples() if pd.isna(r.rt)}
    return got, miss


@settings(max_examples=150, deadline=None)
@given(l=times, r=times,
       direction=st.sampled_from(["backward", "forward"]))
def test_merge_asof_matches_pandas(l, r, direction):
    got, miss = _run(l, r, direction)
    want, want_miss = _ref(l, r, direction)
    assert got == want
    assert miss == want_miss
