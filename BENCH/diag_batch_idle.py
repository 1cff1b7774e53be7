"""Diagnose the ~15 s/extra-batch idle observed in cluster-mode
multi-batch headline runs (BENCH/r5h headline-attempt-1787045940:
35% utilization at 4M batches; single-batch slices run 0.88-0.95).

Runs local-cluster[4,1,4096] with the same driver-apart/executors-pinned
topology as protocol v4, 1 warm batch then K steady batches, per-phase
perf timers per batch:

  plan_build    _build_changes (driver, py4j)
  spark_action  DataFrameWriter.parquet (the delta write job)
  list_staged   _list_bucket_files os.walk
  compact       _compact_buckets (may contain a Spark job)
  commit        _commit_retrying
  observe       _emit_observability (obs.get + jsonl appends)
  checkpoint    save_checkpoint
  ddl_scan      _scan_ddl_positions

Prints one JSON line per batch plus a summary. Pure diagnosis tool.
Usage: python BENCH/diag_batch_idle.py [batch_events] [n_batches]
"""
from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
N_BATCHES = int(sys.argv[2]) if len(sys.argv) > 2 else 4
BUCKETS = int(sys.argv[3]) if len(sys.argv) > 3 else 16
GEN_SLICES = int(sys.argv[4]) if len(sys.argv) > 4 else 0
CORES = 4

os.environ.setdefault("TMPDIR", "/dev/shm")
os.environ.setdefault("SPARK_LOCAL_DIRS", "/dev/shm")
os.sched_setaffinity(0, {4})  # driver apart, like protocol v4

from milvus_cdc_spark.session import get_spark  # noqa: E402

spark = get_spark(
    app_name="diag_batch_idle",
    master=f"local-cluster[{CORES},1,4096]",
    extra_conf={
        "spark.executorEnv.PYTHONPATH": os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))),
        "spark.memory.fraction": "0.6",
        **{kv.partition("=")[0].strip(): kv.partition("=")[2].strip()
           for kv in filter(None, os.environ.get("BENCH_SPARK_CONF", "").split(";"))},
    },
)

# pin executor JVMs to cores 0-3 (same as bench.py BENCH_CLUSTER_PIN)
deadline = time.time() + 60
while time.time() < deadline:
    if spark.sparkContext._jsc.sc().getExecutorMemoryStatus().size() >= CORES + 1:
        break
    time.sleep(0.5)
exec_cpus = set(range(CORES))
for pid in os.listdir("/proc"):
    if not pid.isdigit():
        continue
    try:
        with open(f"/proc/{pid}/cmdline", "rb") as f:
            cmd = f.read()
    except OSError:
        continue
    if b"CoarseGrainedExecutorBackend" in cmd:
        try:
            for tid in os.listdir(f"/proc/{pid}/task"):
                try:
                    os.sched_setaffinity(int(tid), exec_cpus)
                except OSError:
                    pass
        except OSError:
            pass

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


icebox_mod._list_bucket_files = timed("list_staged")(icebox_mod._list_bucket_files)
icebox_mod.IceboxTable._compact_buckets = timed("compact")(
    icebox_mod.IceboxTable._compact_buckets)
icebox_mod.IceboxTable._commit_retrying = timed("commit")(
    icebox_mod.IceboxTable._commit_retrying)
ReplicateJob._build_changes = timed("plan_build")(ReplicateJob._build_changes)
ReplicateJob._emit_observability = timed("observe")(ReplicateJob._emit_observability)
ReplicateJob._scan_ddl_positions = timed("ddl_scan")(ReplicateJob._scan_ddl_positions)
Metastore.save_checkpoint = timed("checkpoint")(Metastore.save_checkpoint)

from pyspark.sql.readwriter import DataFrameWriter  # noqa: E402

DataFrameWriter.parquet = timed("spark_action")(DataFrameWriter.parquet)

n_events = BATCH * (N_BATCHES + 1)
work = tempfile.mkdtemp(prefix="cdc_diag_", dir="/dev/shm")
job = ReplicateJob(
    spark=spark,
    source=generated_source(
        stable_max_batch=BATCH,
        gen_slices=GEN_SLICES or None,
        num_keys=1_000_000, content_repeat=16,
    ),
    table_root=os.path.join(work, "tbl"),
    metastore=Metastore(os.path.join(work, "meta")),
    batch_size=BATCH,
    num_buckets=BUCKETS,
    collect_metrics=True,
    log_max_seq=n_events - 1,
)
job.run(until_seq=n_events - 1, max_batches=1)  # warm-up (excluded)

def percpu():
    out = {}
    with open("/proc/stat") as f:
        for line in f:
            if line.startswith("cpu") and line[3].isdigit():
                parts = line.split()
                n = int(parts[0][3:])
                if n < CORES:
                    out[n] = [int(x) for x in parts[1:9]]
    return out


for b in range(N_BATCHES):
    TIMES.clear()
    pc0 = percpu()
    t0 = time.perf_counter()
    res = job.run(until_seq=n_events - 1, max_batches=1)
    wall = time.perf_counter() - t0
    pc1 = percpu()
    clk = os.sysconf("SC_CLK_TCK")
    idle = sum(pc1[c][3] - pc0[c][3] for c in pc0) / clk
    steal = sum(pc1[c][7] - pc0[c][7] for c in pc0) / clk
    busy = sum(sum(pc1[c][i] - pc0[c][i] for i in (0, 1, 2, 5, 6)) for c in pc0) / clk
    phases = {k: round(v, 3) for k, v in sorted(TIMES.items())}
    accounted = sum(TIMES.values())
    print(json.dumps({
        "batch": b, "buckets": BUCKETS, "wall_s": round(wall, 3),
        "eps": round(res["events_applied"] / wall, 1),
        "phases": phases,
        "idle_frac": round(idle / (wall * CORES), 3),
        "steal_frac": round(steal / (wall * CORES), 3),
        "busy_frac": round(busy / (wall * CORES), 3),
        "unaccounted_s": round(wall - accounted, 3),
    }), flush=True)

import shutil  # noqa: E402

shutil.rmtree(work, ignore_errors=True)
spark.stop()
