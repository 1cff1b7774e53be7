"""Task lifecycle tests — the Create/Pause/Resume/Get/List/Position API
surface (analog of /root/reference/server/cdc_api.go:26-37 tests)."""

import os

import pytest

from milvus_cdc_spark.plans.metastore import Metastore
from milvus_cdc_spark.plans.task import DuplicateTaskError, TaskManager
from milvus_cdc_spark.sources.event_log import generate_events, write_event_log


@pytest.fixture()
def env(spark, tmp_base):
    log = os.path.join(tmp_base, "log")
    write_event_log(generate_events(spark, 1200, num_keys=120), log)
    tm = TaskManager(spark, Metastore(os.path.join(tmp_base, "meta")))
    return tm, log, tmp_base


def test_create_run_get_list_delete(spark, env):
    tm, log, tmp = env
    tm.create("tA", log, os.path.join(tmp, "tblA"), batch_size=500, num_buckets=4)
    res = tm.run("tA", until_seq=1199)
    assert res["batches"] == 3
    assert tm.get("tA")["state"] == "running"
    assert [t["task_id"] for t in tm.list()] == ["tA"]
    pos = tm.get_position("tA")
    assert pos["global_offset"] == 1199 and len(pos["positions"]) > 0
    tm.delete("tA")
    assert tm.get("tA") is None


def test_duplicate_guards(spark, env):
    tm, log, tmp = env
    tm.create("tA", log, os.path.join(tmp, "tblA"), num_buckets=4)
    with pytest.raises(DuplicateTaskError):
        tm.create("tA", log, os.path.join(tmp, "tblB"))
    with pytest.raises(DuplicateTaskError):
        tm.create("tB", log, os.path.join(tmp, "tblA"))


def test_pause_resume_roundtrip(spark, env):
    tm, log, tmp = env
    tm.create("tA", log, os.path.join(tmp, "tblA"), batch_size=500, num_buckets=4)
    tm.run("tA", until_seq=1199, max_batches=1)
    tm.pause("tA")
    with pytest.raises(RuntimeError):
        tm.run("tA", until_seq=1199)
    tm.resume("tA")
    res = tm.run("tA", until_seq=1199)
    assert res["final_offset"] == 1199


def test_failure_pauses_with_reason(spark, env):
    tm, log, tmp = env
    tm.create("tA", log + "-missing", os.path.join(tmp, "tblA"), num_buckets=4)
    with pytest.raises(Exception):
        tm.run("tA", until_seq=1199)
    t = tm.get("tA")
    assert t["state"] == "paused" and t["reason"]


def test_create_over_paused_task_rejected(spark, env):
    """The one-writer-per-table guard must include PAUSED tasks: a paused
    task can be resumed, and then two writers would cover one table."""
    import pytest

    from milvus_cdc_spark.plans.task import DuplicateTaskError

    tm, log, tmp = env
    tm.create("tA", log, os.path.join(tmp, "tbl"))
    tm.pause("tA")
    with pytest.raises(DuplicateTaskError):
        tm.create("tB", log, os.path.join(tmp, "tbl"))


def test_start_positions_seed_uses_min(spark, env):
    """Seeding from per-partition positions must take the MIN: the replay
    seeks by global_offset alone, so max() would permanently skip the
    lagging partitions' unconsumed events (re-applying already-consumed
    ones is idempotent; skipping is silent data loss)."""
    tm, log, tmp = env
    tm.create("tP", log, os.path.join(tmp, "tblP"),
              start_positions={0: 900, 1: 300})
    assert tm.get_position("tP")["global_offset"] == 300
