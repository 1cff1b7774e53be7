"""Profile the per-batch SERIAL driver time in the replay hot path.

Runs the same warmed single-batch steady window the scaling slices use
(4 pinned cores, warm 2M excluded, steady 4M as one batch) but with
phase timers wrapped around every driver-side step:

  plan_build     _build_changes + Observation wiring (py4j, driver)
  spark_action   the delta write job (the only parallel part)
  list_staged    _list_bucket_files os.walk
  compact        _compact_buckets (incl. any compaction Spark job)
  commit         _commit_retrying (snapshot JSON + pointer swap)
  observe        obs.get + lineage/metrics appends
  checkpoint     metastore save_checkpoint

Prints one JSON line. Pure diagnosis tool — never imported by the
engine or the tests.
"""
from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CORES = int(os.environ.get("PROF_CORES", "4"))
os.sched_setaffinity(0, set(range(CORES)))
os.environ.setdefault("TMPDIR", "/dev/shm")
os.environ.setdefault("SPARK_LOCAL_DIRS", "/dev/shm")

WARM = int(os.environ.get("PROF_WARM", "2000000"))
STEADY = int(os.environ.get("PROF_STEADY", "4000000"))

from milvus_cdc_spark.session import get_spark  # noqa: E402

spark = get_spark(app_name="profile_serial", master=f"local[{CORES}]")

from milvus_cdc_spark.plans.apply import ReplicateJob, generated_source  # noqa: E402
from milvus_cdc_spark.plans.metastore import Metastore  # noqa: E402
from milvus_cdc_spark.sources import icebox as icebox_mod  # noqa: E402

TIMES: dict[str, float] = {}


def timed(name):
    def deco(fn):
        def wrap(*a, **k):
            t0 = time.perf_counter()
            try:
                return fn(*a, **k)
            finally:
                TIMES[name] = TIMES.get(name, 0.0) + (time.perf_counter() - t0)
        return wrap
    return deco


# ---- monkeypatch the phases -------------------------------------------
icebox_mod._list_bucket_files = timed("list_staged")(icebox_mod._list_bucket_files)
icebox_mod.IceboxTable._compact_buckets = timed("compact")(
    icebox_mod.IceboxTable._compact_buckets
)
icebox_mod.IceboxTable._commit_retrying = timed("commit")(
    icebox_mod.IceboxTable._commit_retrying
)
ReplicateJob._build_changes = timed("plan_build")(ReplicateJob._build_changes)
ReplicateJob._emit_observability = timed("observe")(ReplicateJob._emit_observability)
Metastore.save_checkpoint = timed("checkpoint")(Metastore.save_checkpoint)

# time the actual Spark action (the partitionBy parquet write) by
# wrapping DataFrameWriter.parquet
from pyspark.sql.readwriter import DataFrameWriter  # noqa: E402

DataFrameWriter.parquet = timed("spark_action")(DataFrameWriter.parquet)

n_events = WARM + STEADY
work = tempfile.mkdtemp(prefix="cdc_prof_", dir="/dev/shm")
job = ReplicateJob(
    spark=spark,
    source=generated_source(
        stable_max_batch=STEADY,
        num_keys=max(n_events // 10, 1000),
        content_repeat=8,
    ),
    table_root=os.path.join(work, "tbl"),
    metastore=Metastore(os.path.join(work, "meta")),
    batch_size=WARM,
    num_buckets=64,
    collect_metrics=True,
    log_max_seq=n_events - 1,
)
job.run(until_seq=n_events - 1, max_batches=1)  # warm-up (excluded)
TIMES.clear()

t0 = time.perf_counter()
job.batch_size = STEADY
res = job.run(until_seq=n_events - 1, max_batches=1)
wall = time.perf_counter() - t0

accounted = sum(TIMES.values())
# spark_action contains the parallel work; everything else is serial,
# plus the unaccounted loop glue
serial = {k: round(v, 3) for k, v in TIMES.items() if k != "spark_action"}
out = {
    "cores": CORES,
    "steady_events": STEADY,
    "wall_s": round(wall, 3),
    "eps": round(res["events_applied"] / wall, 1),
    "spark_action_s": round(TIMES.get("spark_action", 0.0), 3),
    "serial_phases_s": serial,
    "serial_total_s": round(sum(serial.values()), 3),
    "unaccounted_s": round(wall - accounted, 3),
}
print(json.dumps(out))
import shutil

shutil.rmtree(work, ignore_errors=True)
