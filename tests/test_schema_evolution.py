"""Schema-evolution-in-stream tests: DDL events applied transactionally
before the data that needs them (SURVEY.md §3.3 ordering guarantee)."""

import json
import os

from milvus_cdc_spark.plans.apply import ReplicateJob, parquet_source
from milvus_cdc_spark.plans.metastore import Metastore

EV = (
    "partition_id int, event_seq long, event_type string, repo string, "
    "path string, commit string, lang string, content string, "
    "schema_change string, event_ts timestamp"
)


def _job(spark, tmp, log, batch_size=100):
    return ReplicateJob(
        spark=spark,
        source=parquet_source(log),
        table_root=os.path.join(tmp, "tbl"),
        metastore=Metastore(os.path.join(tmp, "meta")),
        batch_size=batch_size,
        num_buckets=4,
    )


def _write(spark, tmp, rows, name="log"):
    p = os.path.join(tmp, name)
    spark.createDataFrame(rows, EV).write.parquet(p)
    return p


def test_add_column_mid_stream_batch_capped(spark, tmp_base):
    """DDL inside a batch range caps the batch: data before the DDL is
    merged first, then the DDL commits, then later data sees the column."""
    add = json.dumps({"table": "code_files", "op": "add_column", "name": "stars", "type": "int"})
    rows = [
        (0, 0, "insert", "r", "a", "c0", "py", "v0", None, None),
        (0, 1, "insert", "r", "b", "c1", "py", "v1", None, None),
        (0, 2, "add_column", None, None, None, None, None, add, None),
        (0, 3, "insert", "r", "c", "c3", "py", "v3", None, None),
    ]
    log = _write(spark, tmp_base, rows)
    job = _job(spark, tmp_base, log, batch_size=100)  # all 4 in one range
    job.run(until_seq=3)
    t = job.table()
    assert "stars" in t.schema.fieldNames()
    assert t.read().count() == 3
    # checkpoint passed through the DDL seq (batch was capped at 2, then resumed)
    assert job.metastore.load_checkpoint(job.task_id)["global_offset"] == 3
    # the DDL got its own snapshot between the two data commits
    assert len(t.snapshots()) >= 4  # create + data + ddl + data


def test_type_widen_event(spark, tmp_base):
    widen = json.dumps({"table": "code_files", "op": "widen", "name": "last_event_seq",
                        "type": "bigint"})
    rows = [
        (0, 0, "insert", "r", "a", "c0", "py", "v0", None, None),
        (0, 1, "type_widen", None, None, None, None, None, widen, None),
        (0, 2, "insert", "r", "b", "c2", "py", "v2", None, None),
    ]
    log = _write(spark, tmp_base, rows)
    job = _job(spark, tmp_base, log)
    job.run(until_seq=2)  # idempotent widen (already bigint) must not fail
    assert job.table().read().count() == 2


def test_drop_table_freezes_positions(spark, tmp_base):
    drop = json.dumps({"table": "code_files", "op": "drop_table"})
    rows = [
        (0, 0, "insert", "r", "a", "c0", "py", "v0", None, None),
        (0, 1, "drop_table", None, None, None, None, None, drop, None),
        (0, 2, "insert", "r", "b", "c2", "py", "v2", None, None),
    ]
    log = _write(spark, tmp_base, rows)
    job = _job(spark, tmp_base, log)
    job.run(until_seq=2)
    ck = job.metastore.load_checkpoint(job.task_id)
    assert ck["dropped"] is True
    # positions frozen: later saves are ignored (meta_op.go:145-177 analog)
    job.metastore.save_checkpoint(job.task_id, 99, {0: 999}, global_offset=999)
    assert job.metastore.load_checkpoint(job.task_id)["global_offset"] == ck["global_offset"]


def test_run_after_drop_returns_cleanly(spark, tmp_base):
    """Resuming a task whose drop_table already replayed must be a clean
    no-op summary, not an AssertionError on a snapshotless handle."""
    import os

    from pyspark.sql import functions as F

    from milvus_cdc_spark.plans.apply import ReplicateJob, parquet_source
    from milvus_cdc_spark.plans.metastore import Metastore
    from milvus_cdc_spark.sources.event_log import EVENT_SCHEMA

    rows = [
        (0, 0, "insert", "org0/r", "a.py", None, "py", "v0", None, None),
        (0, 1, "drop_table", None, None, None, None, None, None, None),
        (0, 2, "insert", "org0/r", "b.py", None, "py", "v2", None, None),
    ]
    log = os.path.join(tmp_base, "log")
    spark.createDataFrame(rows, EVENT_SCHEMA).coalesce(1).write.parquet(log)
    job = ReplicateJob(
        spark=spark, source=parquet_source(log),
        table_root=os.path.join(tmp_base, "tbl"),
        metastore=Metastore(os.path.join(tmp_base, "meta")),
        num_buckets=4, batch_size=10,
    )
    job.run(until_seq=2)
    assert job.metastore.load_checkpoint(job.task_id)["dropped"]
    # fresh handle, same metastore — the retry/resume path
    job2 = ReplicateJob(
        spark=spark, source=parquet_source(log),
        table_root=os.path.join(tmp_base, "tbl"),
        metastore=Metastore(os.path.join(tmp_base, "meta")),
        num_buckets=4, batch_size=10,
    )
    res = job2.run(until_seq=2)
    assert res["batches"] == 0 and res.get("dropped") is True
