"""Streaming sessionization: the live counterpart of the batch
inactivity-gap session rollup (`events_sessionize` in the gate suite).

Per context, the state is ONE open session (seq, start, end, n_events,
total_value_cents). An arriving event either extends it (gap <= gap_s) or
closes it — closed sessions are emitted in append mode and match the
batch rollup rows exactly, because server-assigned timestamps make
per-key arrival order equal timestamp order (the reference's T2
semantics: no late data, no watermark needed). The still-open tail
session per context stays in state; an idle-timeout flush emits it once
no event has extended it for `gap_s` of processing time — the same
boundary the batch gap rule would draw.

Scale shape: one shuffle on context_id per micro-batch (identical to the
batch plan's single window exchange), O(1) state per context, emissions
only on session close. The hot path is Arrow-batched pandas over each
key group.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("context_id", T.StringType()),
        T.StructField("session_seq", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("session_start", T.LongType()),
        T.StructField("session_end", T.LongType()),
        T.StructField("total_value_cents", T.LongType()),
        T.StructField("duration_s", T.LongType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("seq", T.LongType()),
        T.StructField("start", T.LongType()),
        T.StructField("end", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("total", T.LongType()),
    ]
)


def streaming_sessionize(
    events: DataFrame,
    gap_s: int = 1800,
    value_col: str = "value_cents",
    flush_idle: bool = True,
) -> DataFrame:
    """events: streaming DataFrame with at least (context_id, timestamp,
    event_id, <value_col>). Returns the closed-session stream (append).

    With ``flush_idle`` the open session also emits after ``gap_s`` of
    processing-time inactivity (server-assigned timestamps track
    processing time, so the two clocks agree up to scheduling slack).
    """

    def sess_fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        ctx = key[0]
        out: dict[str, list[Any]] = {
            "context_id": [], "session_seq": [], "n_events": [],
            "session_start": [], "session_end": [], "total_value_cents": [],
            "duration_s": [],
        }

        def emit(seq: int, start: int, end: int, n: int, total: int) -> None:
            out["context_id"].append(ctx)
            out["session_seq"].append(seq)
            out["n_events"].append(n)
            out["session_start"].append(start)
            out["session_end"].append(end)
            out["total_value_cents"].append(total)
            out["duration_s"].append(end - start)

        if state.hasTimedOut:
            # Idle flush: the open session's gap has elapsed in wall time.
            # Keep the counter in state (n == 0 means "no open session") so
            # the next event resumes numbering at seq + 1 instead of
            # emitting a duplicate (context_id, 1) key. No new timeout is
            # set: the sentinel has nothing left to flush.
            if state.exists:
                seq, start, end, n, total = [int(x) for x in state.get]
                if n > 0:
                    emit(seq, start, end, n, total)
                state.update((seq, 0, 0, 0, 0))
            if out["context_id"]:
                yield pd.DataFrame(out)
            return

        if state.exists:
            seq, start, end, n, total = [int(x) for x in state.get]
        else:
            seq = start = end = n = total = 0
        for pdf in pdfs:
            pdf = pdf.sort_values(["timestamp", "event_id"], kind="stable")
            for ts, val in zip(pdf["timestamp"], pdf["value"]):
                ts, val = int(ts), int(val)
                if n == 0:  # fresh context (seq=0) or post-flush sentinel
                    seq, start, end, n, total = seq + 1, ts, ts, 1, val
                elif ts - end > gap_s:  # close + open
                    emit(seq, start, end, n, total)
                    seq, start, end, n, total = seq + 1, ts, ts, 1, val
                else:  # extend
                    end, n, total = ts, n + 1, total + val
        state.update((seq, start, end, n, total))
        if flush_idle:
            state.setTimeoutDuration(gap_s * 1000)
        if out["context_id"]:
            yield pd.DataFrame(out)

    prepared = events.select(
        F.col("context_id").cast("string").alias("context_id"),
        F.col("timestamp").cast("long").alias("timestamp"),
        F.col("event_id").cast("long").alias("event_id"),
        F.coalesce(F.col(value_col), F.lit(0)).cast("long").alias("value"),
    )
    return prepared.groupBy("context_id").applyInPandasWithState(
        sess_fn,
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if flush_idle
            else GroupStateTimeout.NoTimeout
        ),
    )
