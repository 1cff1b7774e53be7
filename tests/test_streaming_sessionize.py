"""Custom stateful streaming operator (applyInPandasWithState):
gap-based sessionization must carry state ACROSS micro-batches and match
a batch-mode pandas sessionization of the same events."""

import datetime
import os

import pandas as pd
from pyspark.sql import functions as F

from milvus_cdc_spark.streaming.sessionize import sessionize_stream

T0 = datetime.datetime(2024, 1, 1, 0, 0, 0)


def _mk_events(rows):
    # rows: (event_id, user_id, minutes-from-T0)
    return [
        (eid, T0 + datetime.timedelta(minutes=m), uid, "click", 1.0, None)
        for eid, uid, m in rows
    ]


def _write(spark, rows, path, mode):
    spark.createDataFrame(
        _mk_events(rows),
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.mode(mode).parquet(path)


def _pandas_sessions(all_rows, gap_minutes=30):
    out = {}
    by_user: dict = {}
    for _eid, uid, m in sorted(all_rows, key=lambda r: (r[1], r[2])):
        s = by_user.setdefault(uid, [])
        if s and m - s[-1][1] <= gap_minutes:
            s[-1] = (s[-1][0], m, s[-1][2] + 1)
        else:
            s.append((m, m, 1))
    for uid, sess in by_user.items():
        for start, end, n in sess:
            out[(uid, T0 + datetime.timedelta(minutes=start))] = (
                T0 + datetime.timedelta(minutes=end), n,
            )
    return out


def _final_sessions(spark, out_dir):
    # the LATEST emission per (user_id, session_start) is the truth
    pdf = spark.read.parquet(out_dir).toPandas()
    pdf = pdf.sort_values("emitted_seq").groupby(
        ["user_id", "session_start"], as_index=False
    ).last()
    return {
        (int(r.user_id), r.session_start.to_pydatetime()): (
            r.session_end.to_pydatetime(), int(r.n_events),
        )
        for r in pdf.itertuples()
    }


def test_sessionize_stream_matches_batch_fold(spark, tmp_base):
    log = os.path.join(tmp_base, "evlog")
    ck = os.path.join(tmp_base, "ck")
    chunk1 = [
        (1, 10, 0), (2, 10, 10), (3, 10, 25),        # session A (u10)
        (4, 20, 5),                                   # session C (u20)
    ]
    chunk2 = [
        (5, 10, 120), (6, 10, 130),                   # session B (u10): 95min gap
        (7, 20, 20),                                  # extends session C
        (8, 30, 0),                                   # session D (u30)
    ]
    out = os.path.join(tmp_base, "sessions")
    # chunk 1 drains in its own run: state must CARRY to the second run
    _write(spark, chunk1, log, "overwrite")
    q = sessionize_stream(spark, log, ck, out, gap_seconds=1800)
    q.awaitTermination()
    _write(spark, chunk2, log, "append")
    q = sessionize_stream(spark, log, ck, out, gap_seconds=1800)
    q.awaitTermination()

    got = _final_sessions(spark, out)
    assert got == _pandas_sessions(chunk1 + chunk2)
    # the closed session (u10 session A) was emitted as final (open=false)
    closed = spark.read.parquet(out).filter(~F.col("open")).toPandas()
    assert ((closed.user_id == 10) & (closed.n_events == 3)).any()


def test_fold_is_chunk_order_independent_and_vectorized():
    """applyInPandasWithState delivers a group as MULTIPLE Arrow chunks
    (arrow.maxRecordsPerBatch) with no cross-chunk ordering: a later
    chunk carrying earlier timestamps must not regress last_ts or split
    sessions at chunk borders (ADVICE r2). Also pins the no-per-row-
    Python rule: the fold source must not iterate event values."""
    import inspect

    import numpy as np
    import pandas as pd

    import milvus_cdc_spark.streaming.sessionize as mod
    from milvus_cdc_spark.streaming.sessionize import make_sessionizer

    class FakeState:
        def __init__(self):
            self.v = None

        @property
        def exists(self):
            return self.v is not None

        @property
        def get(self):
            return self.v

        def update(self, v):
            self.v = v

    fold = make_sessionizer(1800)
    # two sessions: [0, 100, 200] and [10_000s, 10_100s]; chunk 2 holds
    # EARLIER timestamps than chunk 1 — chunk-local ordering would fold
    # 10_000s before 100s and fabricate extra sessions
    c1 = pd.DataFrame({"ts": pd.to_datetime([200, 10_000, 10_100], unit="s")})
    c2 = pd.DataFrame({"ts": pd.to_datetime([0, 100], unit="s")})
    st = FakeState()
    (out,) = fold((1,), iter([c1, c2]), st)
    got = [
        (int(r["session_start"].timestamp()), int(r["session_end"].timestamp()),
         int(r["n_events"]), bool(r["open"]))
        for _, r in out.iterrows()
    ]
    assert got == [(0, 200, 3, False), (10_000, 10_100, 2, True)]
    assert st.v == (10_000 * 10**6, 10_100 * 10**6, 2)
    src = inspect.getsource(mod.make_sessionizer)
    assert "iterrows" not in src and "for ts in" not in src
