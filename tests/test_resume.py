"""Resumability / exactly-once tests (SURVEY.md §3.4 analog).

Kill at every batch boundary, resume, final state identical; plus the
crash-between-commit-and-checkpoint fence.
"""

import json
import os

from milvus_cdc_spark.plans.apply import ReplicateJob, parquet_source
from milvus_cdc_spark.plans.metastore import Metastore
from milvus_cdc_spark.sources.event_log import generate_events, write_event_log
from milvus_cdc_spark.sources.icebox import IceboxTable
from tests.oracle import engine_hashes, expected_hashes

N = 2500


def _job(spark, tmp, log, **kw):
    return ReplicateJob(
        spark=spark,
        source=parquet_source(log),
        table_root=os.path.join(tmp, "tbl"),
        metastore=Metastore(os.path.join(tmp, "meta")),
        batch_size=kw.pop("batch_size", 600),
        num_buckets=8,
        **kw,
    )


def test_kill_resume_every_batch_boundary(spark, tmp_base):
    log = os.path.join(tmp_base, "log")
    write_event_log(generate_events(spark, N, num_keys=250, ddl_every=900), log)
    exp = expected_hashes(spark.read.parquet(log).toPandas())

    # run one batch at a time with a FRESH job object each time — the
    # in-process equivalent of killing the driver after every batch.
    while True:
        job = _job(spark, tmp_base, log)
        res = job.run(until_seq=N - 1, max_batches=1)
        if res["batches"] == 0:
            break
    assert engine_hashes(IceboxTable(spark, os.path.join(tmp_base, "tbl")).read()) == exp


def test_crash_between_commit_and_checkpoint(spark, tmp_base):
    """Data commit landed, checkpoint write lost → fence fast-forwards
    without re-applying; state identical; no new snapshot."""
    log = os.path.join(tmp_base, "log")
    write_event_log(generate_events(spark, N, num_keys=250), log)
    job = _job(spark, tmp_base, log)
    job.run(until_seq=N - 1)
    table = job.table()
    before_snaps = table.snapshots()
    before = engine_hashes(table.read())

    # roll the checkpoint back one batch (simulating the lost write)
    ckpt_path = job.metastore._ckpt_path(job.task_id)
    with open(ckpt_path) as f:
        ck = json.load(f)
    ck["batch_id"] -= 1
    ck["global_offset"] = N - 1 - 600
    with open(ckpt_path, "w") as f:
        json.dump(ck, f)

    job2 = _job(spark, tmp_base, log)
    res = job2.run(until_seq=N - 1)
    table2 = IceboxTable(spark, os.path.join(tmp_base, "tbl"))
    assert res["batches"] == 0  # fence skipped the replay entirely
    assert table2.snapshots() == before_snaps
    assert engine_hashes(table2.read()) == before


def test_replay_without_fence_is_idempotent(spark, tmp_base):
    """Even bypassing the fence (checkpoint rolled back AND snapshot
    properties wiped), re-merging a range is a semantic no-op."""
    log = os.path.join(tmp_base, "log")
    write_event_log(generate_events(spark, N, num_keys=250), log)
    job = _job(spark, tmp_base, log)
    job.run(until_seq=N - 1)
    table = job.table()
    before = engine_hashes(table.read())

    ckpt_path = job.metastore._ckpt_path(job.task_id)
    with open(ckpt_path) as f:
        ck = json.load(f)
    last_batch = ck["batch_id"]
    ck["batch_id"] = last_batch - 1
    ck["global_offset"] = N - 1 - 600
    with open(ckpt_path, "w") as f:
        json.dump(ck, f)
    # wipe the fence properties so the merge really re-runs
    snap_file = os.path.join(tmp_base, "tbl", "snapshots", f"v{table.snap.snapshot_id}.json")
    with open(snap_file) as f:
        s = json.load(f)
    s["properties"]["batch_id"] = -1
    s["properties"]["offset_end"] = -1
    with open(snap_file, "w") as f:
        json.dump(s, f)

    job2 = _job(spark, tmp_base, log)
    res = job2.run(until_seq=N - 1)
    assert res["batches"] == 1  # really re-applied
    after = engine_hashes(IceboxTable(spark, os.path.join(tmp_base, "tbl")).read())
    assert after == before
