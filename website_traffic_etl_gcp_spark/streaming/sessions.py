"""Stateful streaming sessionization via ``applyInPandasWithState``.

Custom per-key state the built-in window functions can't express: each
user carries an open session (start/end/count/value) across
micro-batches; events extend it or close it on the 30-minute gap.
Closed sessions are emitted as soon as the closing event arrives; the
trailing open session per user is emitted at the end of each batch
(flagged ``is_open``) so a bounded run reproduces the batch operator
exactly. State per key is O(1) — four scalars — so the state store
stays tiny no matter how long the stream runs."""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..operators.sessionize import DEFAULT_GAP_SECONDS

SESSION_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", StringType()),
        StructField("session_end", StringType()),
        StructField("n_events", LongType()),
        StructField("value_sum", DoubleType()),
        StructField("is_open", BooleanType()),
    ]
)

# state: (start_us, end_us, n_events, value_cents)
STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("end_us", LongType()),
        StructField("n_events", LongType()),
        StructField("value_cents", LongType()),
    ]
)


def _fmt_us(us: int) -> str:
    ts = pd.Timestamp(us, unit="us")
    return ts.strftime("%Y-%m-%d %H:%M:%S.%f")


def session_func(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Merge this batch's events (sorted by ts) into the open-session
    state; yield closed sessions plus the trailing open one."""
    (user_id,) = key
    gap_us = DEFAULT_GAP_SECONDS * 1_000_000

    if state.exists:
        start_us, end_us, n_events, value_cents = state.get
        have = True
    else:
        start_us = end_us = n_events = value_cents = 0
        have = False

    out: list[tuple] = []
    # A group's rows arrive as MULTIPLE Arrow chunks in arbitrary
    # order once the user's batch slice exceeds one Arrow record
    # batch (~10k rows — routine at sf1). Per-chunk sorting is not
    # enough: a later chunk can hold earlier timestamps, which merges
    # sessions the gap rule should split. Concat the batch's chunks
    # and sort ONCE globally (bounded by this user's rows in THIS
    # micro-batch, not the stream's history — state stays O(1)).
    chunks = [pdf for pdf in pdfs if len(pdf)]
    if chunks:
        batch = chunks[0] if len(chunks) == 1 else pd.concat(chunks)
        batch = batch.sort_values(["ts", "event_id"])
        for ts, value in zip(
            batch["ts"].astype("int64") // 1000, batch["value"]
        ):  # ns → µs
            cents = int(round(value * 100))
            if not have:
                start_us, end_us, n_events, value_cents = ts, ts, 1, cents
                have = True
            elif ts - end_us > gap_us:
                out.append(
                    (user_id, _fmt_us(start_us), _fmt_us(end_us), n_events,
                     value_cents / 100.0, False)
                )
                start_us, end_us, n_events, value_cents = ts, ts, 1, cents
            else:
                end_us = ts
                n_events += 1
                value_cents += cents

    if have:
        state.update((start_us, end_us, n_events, value_cents))
        out.append(
            (user_id, _fmt_us(start_us), _fmt_us(end_us), n_events,
             value_cents / 100.0, True)
        )

    if out:
        yield pd.DataFrame(
            out, columns=[f.name for f in SESSION_OUTPUT_SCHEMA.fields]
        )
    else:
        # typed empty frame: an object-dtype empty yield triggers
        # pandas concat dtype warnings on every batch
        yield pd.DataFrame(
            {
                "user_id": pd.Series(dtype="int64"),
                "session_start": pd.Series(dtype="object"),
                "session_end": pd.Series(dtype="object"),
                "n_events": pd.Series(dtype="int64"),
                "value_sum": pd.Series(dtype="float64"),
                "is_open": pd.Series(dtype="bool"),
            }
        )


def sessionize_stream(raw: DataFrame) -> DataFrame:
    """raw events stream (ts still int64 ns) → session stream."""
    return (
        raw.groupBy("user_id")
        .applyInPandasWithState(
            session_func,
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
