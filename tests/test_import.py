"""Bulk import (Milvus Import msg analog) + user start positions.

Reference parity: ``isSupportedMsgType`` includes Import
(``core/reader/replicate_channel_manager.go:1447``, handled ``:1699,
1899``) — bulk loads are the first thing a CDC user replays; and task
create accepts user-supplied start positions persisted before the task
runs (``server/cdc_impl.go:480-539``).
"""

import hashlib
import os

from pyspark.sql import functions as F

from milvus_cdc_spark.plans.apply import ReplicateJob, parquet_source
from milvus_cdc_spark.plans.metastore import Metastore
from milvus_cdc_spark.plans.task import TaskManager
from milvus_cdc_spark.sources.event_log import EVENT_SCHEMA, generate_events, write_event_log
from tests.oracle import engine_hashes, expected_hashes

BULK_SCHEMA = "repo string, path string, commit string, lang string, content string"


def _bulk_df(spark, n=100):
    return spark.range(n).select(
        F.concat(F.lit("org9/repo"), F.col("id") % 7).alias("repo"),
        F.concat(F.lit("f"), F.col("id"), F.lit(".py")).alias("path"),
        F.md5(F.col("id").cast("string")).alias("commit"),
        F.lit("py").alias("lang"),
        F.concat(F.lit("bulk content "), F.col("id")).alias("content"),
    )


def _event(seq, etype, repo=None, path=None, content=None, schema_change=None):
    return (0, seq, etype, repo, path, None, "py" if repo else None, content,
            schema_change, None)


def _write_events(spark, rows, log):
    spark.createDataFrame(rows, EVENT_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(log)


def _job(spark, tmp, log):
    return ReplicateJob(
        spark=spark,
        source=parquet_source(log),
        table_root=os.path.join(tmp, "tbl"),
        metastore=Metastore(os.path.join(tmp, "meta")),
        num_buckets=4,
        batch_size=10,
    )


def test_import_append_then_dml(spark, tmp_base):
    """Import materializes the bulk file through the normal pipeline
    (sha256 stamped, seq = the import event's seq); later DML mutates the
    imported rows; earlier DML loses to the import under seq resolution."""
    bulk_path = os.path.join(tmp_base, "bulk")
    _bulk_df(spark, 50).write.parquet(bulk_path)
    log = os.path.join(tmp_base, "log")
    rows = [
        # pre-import DML on an imported key: LOWER seq → import wins
        _event(0, "insert", "org9/repo0", "f0.py", "stale content"),
        _event(1, "import", schema_change=f'{{"op":"import","path":"{bulk_path}"}}'),
        # post-import DML: HIGHER seq → wins over imported rows
        _event(2, "update", "org9/repo1", "f1.py", "updated content"),
        _event(3, "delete", "org9/repo2", "f2.py"),
    ]
    _write_events(spark, rows, log)
    job = _job(spark, tmp_base, log)
    job.run(until_seq=3)

    got = {(r["repo"], r["path"]): r for r in job.table().read().collect()}
    assert len(got) == 49  # 50 imported, 1 deleted
    assert got[("org9/repo0", "f0.py")]["content"] == "bulk content 0"
    assert got[("org9/repo1", "f1.py")]["content"] == "updated content"
    assert ("org9/repo2", "f2.py") not in got
    # sha256 stamped by the same vectorized pipeline
    r = got[("org9/repo0", "f0.py")]
    assert r["content_sha256"] == hashlib.sha256(b"bulk content 0").hexdigest()
    assert r["last_event_seq"] == 1  # the import event's seq


def test_import_replay_is_idempotent(spark, tmp_base):
    """Re-running the replay range containing the import is a structural
    no-op (seq-resolved MoR merge)."""
    bulk_path = os.path.join(tmp_base, "bulk")
    _bulk_df(spark, 30).write.parquet(bulk_path)
    log = os.path.join(tmp_base, "log")
    rows = [
        _event(0, "import", schema_change=f'{{"op":"import","path":"{bulk_path}"}}'),
        _event(1, "update", "org9/repo1", "f1.py", "v2"),
    ]
    _write_events(spark, rows, log)
    job = _job(spark, tmp_base, log)
    job.run(until_seq=1)
    state1 = {(r["repo"], r["path"]): r["content_sha256"]
              for r in job.table().read().collect()}
    # force a re-apply of the same range (fresh metastore = lost checkpoint)
    job2 = ReplicateJob(
        spark=spark, source=parquet_source(log), table_root=job.table_root,
        metastore=Metastore(os.path.join(tmp_base, "meta2")), num_buckets=4,
        batch_size=10,
    )
    job2.run(until_seq=1)
    state2 = {(r["repo"], r["path"]): r["content_sha256"]
              for r in job2.table().read().collect()}
    assert state1 == state2


def test_import_overwrite_bootstrap(spark, tmp_base):
    """mode=overwrite replaces prior state wholesale (INSERT OVERWRITE) —
    the bootstrap shape for attaching CDC to an existing corpus."""
    bulk_path = os.path.join(tmp_base, "bulk")
    _bulk_df(spark, 20).write.parquet(bulk_path)
    log = os.path.join(tmp_base, "log")
    rows = [
        _event(0, "insert", "orgX/old", "gone.py", "pre-bootstrap row"),
        _event(
            1, "import",
            schema_change=f'{{"op":"import","path":"{bulk_path}","mode":"overwrite"}}',
        ),
    ]
    _write_events(spark, rows, log)
    job = _job(spark, tmp_base, log)
    job.run(until_seq=1)
    got = {(r["repo"], r["path"]) for r in job.table().read().collect()}
    assert len(got) == 20
    assert ("orgX/old", "gone.py") not in got


def test_create_task_with_start_seq(spark, tmp_base):
    """A task created at seq K replays only (K, hi] — final state equals
    the oracle folded from K."""
    log = os.path.join(tmp_base, "log")
    write_event_log(generate_events(spark, 1200, num_keys=150), log)
    tm = TaskManager(spark, Metastore(os.path.join(tmp_base, "meta")))
    tm.create("tS", log, os.path.join(tmp_base, "tblS"),
              start_seq=600, num_buckets=4, batch_size=300)
    res = tm.run("tS", until_seq=1199)
    assert res["events_applied"] < 650  # did NOT replay from 0
    pdf = spark.read.parquet(log).filter("event_seq > 600").toPandas()
    job = tm._job(tm.get("tS"))
    assert engine_hashes(job.table().read()) == expected_hashes(pdf)
    # the seed survives before any run too
    tm.create("tT", log, os.path.join(tmp_base, "tblT"), start_seq=100)
    assert tm.get_position("tT")["global_offset"] == 100
