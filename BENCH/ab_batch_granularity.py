"""A/B: does batch granularity (not serial driver cost) explain the
headline-vs-slice throughput gap?

Slice windows (ONE 4M-event batch) measure 240-272k ev/s at 4 pinned
cores; dedicated headline runs (2M batches) measure 90-120k in their
best segments. profile_serial.py showed driver-side serial time between
batches is ~0.05 s — so if the gap is real it lives INSIDE the Spark
jobs. Same JVM, warmed, alternating windows:

  A: 4M events as ONE batch
  B: 4M events as TWO 2M batches
  A2/B2: repeat (ramp control)

Prints one JSON line with per-window eps + cpu + gc/jit.
"""
from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CORES = 4
os.sched_setaffinity(0, set(range(CORES)))
os.environ.setdefault("TMPDIR", "/dev/shm")
os.environ.setdefault("SPARK_LOCAL_DIRS", "/dev/shm")

from milvus_cdc_spark.session import get_spark  # noqa: E402

spark = get_spark(app_name="ab_batch", master=f"local[{CORES}]")

from bench import jvm_gc_jit_ms, tree_cpu_split  # noqa: E402
from milvus_cdc_spark.plans.apply import ReplicateJob, generated_source  # noqa: E402
from milvus_cdc_spark.plans.metastore import Metastore  # noqa: E402

WARM = 2_000_000
WINDOW = 4_000_000
PLAN = ["A", "B", "A", "B"]
n_events = WARM + WINDOW * len(PLAN)

work = tempfile.mkdtemp(prefix="cdc_ab_", dir="/dev/shm")
job = ReplicateJob(
    spark=spark,
    source=generated_source(
        stable_max_batch=WINDOW,
        num_keys=max(n_events // 10, 1000),
        content_repeat=8,
    ),
    table_root=os.path.join(work, "tbl"),
    metastore=Metastore(os.path.join(work, "meta")),
    batch_size=WARM,
    num_buckets=64,
    collect_metrics=True,
    log_max_seq=n_events - 1,
    compact_threshold=1_000_000,  # never compact: isolate granularity
)
job.run(until_seq=n_events - 1, max_batches=1)  # warm (excluded)

windows = []
for mode in PLAN:
    nb, bs = (1, WINDOW) if mode == "A" else (2, WINDOW // 2)
    job.batch_size = bs
    u0, s0 = tree_cpu_split()
    g0, j0 = jvm_gc_jit_ms(spark)
    t0 = time.time()
    res = job.run(until_seq=n_events - 1, max_batches=nb)
    dt = time.time() - t0
    u1, s1 = tree_cpu_split()
    g1, j1 = jvm_gc_jit_ms(spark)
    windows.append(
        {
            "mode": mode,
            "batches": nb,
            "events": res["events_applied"],
            "wall_s": round(dt, 2),
            "eps": round(res["events_applied"] / dt, 1),
            "cpu_s": round((u1 - u0) + (s1 - s0), 2),
            "stime_s": round(s1 - s0, 2),
            "gc_ms": g1 - g0,
            "jit_ms": j1 - j0,
        }
    )

print(json.dumps({"cores": CORES, "windows": windows}))
import shutil

shutil.rmtree(work, ignore_errors=True)
