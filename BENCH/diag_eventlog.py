"""Locate the ~10% 4-core idle precisely: run warm + one 8M steady
batch in the v4 cluster topology with the Spark event log on, then
parse per-stage/per-task timings out of the log:

- per stage: submit->first-launch gap, last-finish->next-stage gap,
  task wave structure, straggler spread
- per task: duration, scheduler delay (launch - ready), GC, shuffle
  fetch wait, result serialization

Pure diagnosis tool. Usage: python BENCH/diag_eventlog.py [steady]
"""
from __future__ import annotations

import glob
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STEADY = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
WARM = 2_000_000
CORES = 4

os.environ.setdefault("TMPDIR", "/dev/shm")
os.environ.setdefault("SPARK_LOCAL_DIRS", "/dev/shm")
os.sched_setaffinity(0, {4})

evdir = tempfile.mkdtemp(prefix="cdc_evlog_", dir="/dev/shm")

from milvus_cdc_spark.session import get_spark  # noqa: E402

spark = get_spark(
    app_name="diag_eventlog",
    master=f"local-cluster[{CORES},1,{os.environ.get('DIAG_EXEC_MB', '4096')}]",
    extra_conf={
        "spark.executorEnv.PYTHONPATH": os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))),
        "spark.memory.fraction": "0.6",
        "spark.eventLog.enabled": "true",
        "spark.eventLog.dir": evdir,
        "spark.eventLog.compress": "false",
        "spark.eventLog.rolling.enabled": "false",
        **{kv.partition("=")[0].strip(): kv.partition("=")[2].strip()
           for kv in filter(None, os.environ.get("BENCH_SPARK_CONF", "").split(";"))},
    },
)

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

n_events = WARM + STEADY
work = tempfile.mkdtemp(prefix="cdc_diag_", dir="/dev/shm")
job = ReplicateJob(
    spark=spark,
    source=generated_source(
        stable_max_batch=STEADY,
        gen_slices=int(os.environ.get("DIAG_GEN_SLICES", "0")) or None,
        num_keys=1_000_000, content_repeat=16,
    ),
    table_root=os.path.join(work, "tbl"),
    metastore=Metastore(os.path.join(work, "meta")),
    batch_size=WARM,
    num_buckets=16,
    collect_metrics=True,
    log_max_seq=n_events - 1,
)
job.run(until_seq=n_events - 1, max_batches=1)  # warm
t_mark = time.time() * 1000  # ms epoch: steady window start
job.batch_size = STEADY
t0 = time.perf_counter()
job.run(until_seq=n_events - 1, max_batches=1)
wall = time.perf_counter() - t0
spark.stop()

# ---- parse the event log ------------------------------------------------
logf = sorted(glob.glob(os.path.join(evdir, "*")))[-1]
if os.path.isdir(logf):
    parts = sorted(glob.glob(os.path.join(logf, "events_*")))
else:
    parts = [logf]


def _lines():
    for p in parts:
        with open(p) as f:
            yield from f


stages = {}   # (stageId, attempt) -> dict
tasks = []    # steady-window tasks
jobs = []
for ln in _lines():
    try:
        ev = json.loads(ln)
    except json.JSONDecodeError:
        continue
    k = ev.get("Event")
    if k == "SparkListenerJobStart":
        jobs.append({"id": ev["Job ID"], "t0": ev["Submission Time"],
                     "stages": [s["Stage ID"] for s in ev["Stage Infos"]]})
    elif k == "SparkListenerJobEnd":
        for j in jobs:
            if j["id"] == ev["Job ID"]:
                j["t1"] = ev["Completion Time"]
    elif k == "SparkListenerStageSubmitted":
        si = ev["Stage Info"]
        stages[(si["Stage ID"], si["Stage Attempt ID"])] = {
            "name": si["Stage Name"].split(" ")[0],
            "ntask": si["Number of Tasks"], "submit": si.get("Submission Time"),
        }
    elif k == "SparkListenerStageCompleted":
        si = ev["Stage Info"]
        st = stages.setdefault((si["Stage ID"], si["Stage Attempt ID"]), {})
        st["submit"] = si.get("Submission Time", st.get("submit"))
        st["complete"] = si.get("Completion Time")
        st["name"] = si["Stage Name"].split(" ")[0]
        st["ntask"] = si["Number of Tasks"]
    elif k == "SparkListenerTaskEnd":
        ti = ev["Task Info"]
        tm = ev.get("Task Metrics") or {}
        sr = tm.get("Shuffle Read Metrics") or {}
        tasks.append({
            "stage": ev["Stage ID"], "launch": ti["Launch Time"],
            "finish": ti["Finish Time"], "exec": ti["Executor ID"],
            "dur": ti["Finish Time"] - ti["Launch Time"],
            "gc": tm.get("JVM GC Time", 0),
            "deser": tm.get("Executor Deserialize Time", 0),
            "fetch_wait": sr.get("Fetch Wait Time", 0),
            "rem_blocks": sr.get("Remote Blocks Fetched", 0),
            "loc_blocks": sr.get("Local Blocks Fetched", 0),
            "rem_bytes": sr.get("Remote Bytes Read", 0),
            "loc_bytes": sr.get("Local Bytes Read", 0),
            "cpu_ms": (tm.get("Executor CPU Time", 0)) // 1_000_000,
            "run_ms": tm.get("Executor Run Time", 0),
        })

# steady-window = events after t_mark
sw_jobs = [j for j in jobs if j["t0"] >= t_mark - 500]
out_stages = []
prev_end = None
for (sid, att), st in sorted(stages.items()):
    if not st.get("submit") or st["submit"] < t_mark - 500:
        continue
    ts = [t for t in tasks if t["stage"] == sid]
    ts.sort(key=lambda t: t["finish"])
    first_launch = min((t["launch"] for t in ts), default=None)
    last_finish = max((t["finish"] for t in ts), default=None)
    durs = sorted(t["dur"] for t in ts)
    # core-seconds idle inside the stage window (4 cores assumed)
    span = (last_finish - first_launch) if ts else 0
    busy = sum(t["dur"] for t in ts)
    rec = {
        "stage": sid, "name": st.get("name"), "ntask": st.get("ntask"),
        "submit_to_launch_ms": (first_launch - st["submit"]) if ts else None,
        "gap_from_prev_ms": (st["submit"] - prev_end) if prev_end else None,
        "span_ms": span, "task_busy_ms": busy,
        "in_stage_idle_coremS": span * CORES - busy,
        "task_dur_min_med_max": (
            [durs[0], durs[len(durs) // 2], durs[-1]] if durs else None),
        "gc_ms": sum(t["gc"] for t in ts),
        "fetch_wait_ms": sum(t["fetch_wait"] for t in ts),
        "rem_blocks": sum(t["rem_blocks"] for t in ts),
        "loc_blocks": sum(t["loc_blocks"] for t in ts),
        "rem_mb": round(sum(t["rem_bytes"] for t in ts) / 1e6, 1),
        "loc_mb": round(sum(t["loc_bytes"] for t in ts) / 1e6, 1),
        "deser_ms": sum(t["deser"] for t in ts),
        "cpu_ms": sum(t["cpu_ms"] for t in ts),
        "run_ms": sum(t["run_ms"] for t in ts),
    }
    prev_end = st.get("complete") or last_finish
    out_stages.append(rec)

print(json.dumps({"wall_s": round(wall, 2), "steady_events": STEADY,
                  "jobs": sw_jobs, "stages": out_stages}, indent=1))

import shutil  # noqa: E402

shutil.rmtree(work, ignore_errors=True)
shutil.rmtree(evdir, ignore_errors=True)
