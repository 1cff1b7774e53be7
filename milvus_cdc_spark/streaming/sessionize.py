"""Custom stateful streaming operator: gap-based sessionization via
``applyInPandasWithState`` — the Structured Streaming facility for
operators the built-in windowed aggregations can't express (a session's
extent depends on the DATA gaps, not a fixed window).

Shape: events are grouped by ``user_id``; per group, an Arrow-batched
pandas function folds the batch's events (sorted by ts) into the carried
state ``(session_start, last_ts, n_events)``. An event more than
``gap_seconds`` after ``last_ts`` CLOSES the current session (emitted
with ``open=false``, final) and opens a new one; the still-open session
is emitted as a snapshot (``open=true``) each time it changes, so the
LATEST row per (user_id, session_start) is always the current truth —
downstream can upsert into a lake table with the engine's own
seq-resolved merge, or just take closed rows as an append-only feed.

Scale notes: state is O(1) per user (only the open session), the
shuffle is one exchange on user_id per micro-batch, and the pandas
function sees Arrow record batches (no per-row Python). Event-time
ordering ACROSS micro-batches is the deployment's job (watermark +
ordered source); within a batch the fold sorts.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
        StructField("open", BooleanType()),
    ]
)

# carried per-user state: (session_start_epoch_us, last_ts_epoch_us, n_events)
STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n", LongType()),
    ]
)


def make_sessionizer(gap_seconds: int = 1800):
    gap_us = gap_seconds * 1_000_000

    def fold(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            start_us, last_us, n = state.get
        else:
            start_us = last_us = None
            n = 0
        out: list[dict[str, Any]] = []
        for pdf in pdfs:
            for ts in pdf["ts"].sort_values():
                ts_us = int(ts.value // 1_000)  # pandas ns → µs
                if start_us is None:
                    start_us, last_us, n = ts_us, ts_us, 1
                elif ts_us - last_us > gap_us:
                    out.append(
                        {"user_id": user_id, "start_us": start_us,
                         "end_us": last_us, "n": n, "open": False}
                    )
                    start_us, last_us, n = ts_us, ts_us, 1
                else:
                    last_us, n = ts_us, n + 1
        if start_us is not None:
            state.update((start_us, last_us, n))
            out.append(
                {"user_id": user_id, "start_us": start_us,
                 "end_us": last_us, "n": n, "open": True}
            )
        if out:
            yield pd.DataFrame(
                {
                    "user_id": pd.Series([r["user_id"] for r in out], dtype="int64"),
                    "session_start": pd.to_datetime(
                        [r["start_us"] for r in out], unit="us"
                    ),
                    "session_end": pd.to_datetime(
                        [r["end_us"] for r in out], unit="us"
                    ),
                    "n_events": pd.Series([r["n"] for r in out], dtype="int64"),
                    "open": pd.Series([r["open"] for r in out], dtype="bool"),
                }
            )

    return fold


def sessionize_stream(
    spark,
    events_path: str,
    checkpoint: str,
    out_dir: str,
    gap_seconds: int = 1800,
):
    """Tail an events directory (parquet: user_id, ts, ...) and append
    session emissions to ``out_dir`` (parquet), stamped with the epoch id
    — the LATEST row per (user_id, session_start) is the current truth.
    availableNow drains what exists; rerunning after new files appear
    resumes the operator STATE from the stream checkpoint (the session
    open at the end of one run continues in the next — the property a
    memory sink cannot give, since it does not support checkpoint
    recovery)."""
    from pyspark.sql import functions as F

    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string"
        )
        .parquet(events_path)
        .select("user_id", "ts")
    )
    sessions = stream.groupBy("user_id").applyInPandasWithState(
        make_sessionizer(gap_seconds),
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

    def sink(df, epoch_id: int) -> None:
        df.withColumn("emitted_seq", F.lit(epoch_id)).write.mode(
            "append"
        ).parquet(out_dir)

    return (
        sessions.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
