"""Deterministic synthetic transcript tables (FIXTURES.md §1, SURVEY.md M0).

The graft input schema is fixed by BASELINE.json:L15:
``(conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
ts:timestamp[us])``. No transcripts exist in ``/root/testdata``, so tests
and benchmarks synthesize them here — seeded numpy, fully deterministic
given the arguments, no external data.

``text`` is a synthetic agent-log line so grok has real structure to parse
(three templates; ~10% unparseable → ``_grokparsefailure``; ~0.5% empty and
~0.5% null text so null vs "" preservation is exercised). A ``hot_frac``
fraction of conversations get 100× mean length to exercise salted
partitioning (SURVEY.md §4.2).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

ROLES = np.array(["system", "user", "assistant", "tool"])
TOOLS = np.array(["bash", "search", "editor", "browser"])
LEVELS = np.array(["DEBUG", "INFO", "WARN", "ERROR"])
STATUSES = np.array(["ok", "err", "timeout"])
COMPONENTS = np.array(["planner", "executor", "router", "memory", "sandbox"])
_WORDS = np.array(
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu "
    "xi omicron pi rho sigma tau upsilon phi chi psi omega token batch "
    "stream shard block arrow".split()
)

TRANSCRIPT_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)


def gen_transcripts(
    n_convs: int,
    mean_turns: int = 8,
    seed: int = 42,
    hot_frac: float = 0.01,
) -> pa.Table:
    """Deterministic transcript table; see module docstring for the spec."""
    rng = np.random.default_rng(seed)

    lens = rng.geometric(1.0 / mean_turns, size=n_convs)
    lens = np.maximum(lens, 1)
    n_hot = int(round(n_convs * hot_frac))
    if n_hot:
        hot_ids = rng.choice(n_convs, size=n_hot, replace=False)
        lens[hot_ids] = mean_turns * 100
    total = int(lens.sum())

    conv_num = np.repeat(np.arange(n_convs), lens)
    conv_id = np.char.add("c", np.char.zfill(conv_num.astype(str), 8))
    # turn_idx: 0..len-1 within each conversation
    starts = np.zeros(n_convs, dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    turn_idx = (np.arange(total) - np.repeat(starts, lens)).astype(np.int32)

    role = ROLES[rng.integers(0, 4, size=total)]
    tool = np.where(role == "tool", TOOLS[rng.integers(0, 4, size=total)], "")
    # p=0.15 of assistant turns are tool calls and also set tool
    asst_call = (role == "assistant") & (rng.random(total) < 0.15)
    tool = np.where(asst_call, TOOLS[rng.integers(0, 4, size=total)], tool)

    # ts strictly increasing within conv_id, spanning >=48h
    base = np.datetime64("2024-03-01T00:00:00", "us")
    conv_start = rng.integers(0, 48 * 3600, size=n_convs) * 1_000_000
    step = rng.integers(1, 30_000_000, size=total)  # 1s..30s gaps
    step_cum = np.cumsum(step)
    ts_off = np.repeat(conv_start, lens) + step_cum - np.repeat(
        step_cum[starts] - step[starts], lens
    )
    ts = base + ts_off.astype("timedelta64[us]")

    # text templates
    tmpl = rng.random(total)
    lvl = LEVELS[rng.integers(0, 4, size=total)]
    comp = COMPONENTS[rng.integers(0, 5, size=total)]
    status = STATUSES[rng.choice(3, size=total, p=[0.8, 0.12, 0.08])]
    latency = rng.integers(1, 5000, size=total)
    args_bytes = rng.integers(10, 100_000, size=total)
    nw = rng.integers(5, 21, size=total)
    word_pick = rng.integers(0, len(_WORDS), size=(total, 20))

    texts: list[str | None] = []
    tool_for_line = np.where(tool == "", "bash", tool)
    for i in range(total):
        words = " ".join(_WORDS[word_pick[i, : nw[i]]])
        if tmpl[i] < 0.50:
            texts.append(
                f"{lvl[i]} {comp[i]} conv={conv_id[i]} step={turn_idx[i]} "
                f"latency_ms={latency[i]} status={status[i]} :: {words}"
            )
        elif tmpl[i] < 0.90:
            texts.append(
                f"{lvl[i]} tool_call tool={tool_for_line[i]} "
                f"args_bytes={args_bytes[i]} :: {words}"
            )
        else:
            texts.append(words)
    # ~0.5% empty, ~0.5% null
    special = rng.random(total)
    for i in np.nonzero(special < 0.005)[0]:
        texts[i] = ""
    for i in np.nonzero((special >= 0.005) & (special < 0.010))[0]:
        texts[i] = None

    return pa.table(
        {
            "conv_id": pa.array(conv_id, type=pa.string()),
            "turn_idx": pa.array(turn_idx, type=pa.int32()),
            "role": pa.array(role, type=pa.string()),
            "text": pa.array(texts, type=pa.string()),
            "tool": pa.array(tool, type=pa.string()),
            "ts": pa.array(ts, type=pa.timestamp("us")),
        },
        schema=TRANSCRIPT_SCHEMA,
    )


def write_transcripts(
    path: str,
    n_convs: int,
    mean_turns: int = 8,
    seed: int = 42,
    hot_frac: float = 0.01,
    row_group_size: int = 64 * 1024,
) -> str:
    """Write a transcript table to one parquet file; returns the path."""
    table = gen_transcripts(n_convs, mean_turns, seed=seed, hot_frac=hot_frac)
    pq.write_table(table, path, row_group_size=row_group_size)
    return path
