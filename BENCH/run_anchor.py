"""10^8-event correctness anchor (BASELINE.md protocol step 3).

Replays N (default 10^8) lazily-generated change events into an icebox
table — intentionally across MULTIPLE invocations (each resumes from the
checkpoint; kill it anywhere and rerun) — then verifies the final table
against an INDEPENDENT distributed computation: a direct LWW fold of the
same generated log (window over event_seq, sha2 builtin), never touching
the merge/compaction/resume machinery under test.

Usage:
  python BENCH/run_anchor.py step   [N] [batch]   # run ≤ --max-batches, resumable
  python BENCH/run_anchor.py verify [N]           # fold + exact diff → ANCHOR.md

Work dir: /tmp/cdc_anchor (survives between invocations).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WORK = "/tmp/cdc_anchor"
KEYS = 10_000_000
REPEAT = 4  # ~300B content
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def make_job(spark, batch):
    from milvus_cdc_spark.plans.apply import ReplicateJob, generated_source
    from milvus_cdc_spark.plans.metastore import Metastore

    return ReplicateJob(
        spark=spark,
        source=generated_source(num_keys=KEYS, content_repeat=REPEAT),
        table_root=os.path.join(WORK, "tbl"),
        metastore=Metastore(os.path.join(WORK, "meta")),
        batch_size=batch,
        num_buckets=64,
        write_mode="mor",
        compact_threshold=8,
    )


def main() -> None:
    mode = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000_000
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 4_000_000

    from milvus_cdc_spark.session import get_spark

    spark = get_spark(app_name="anchor")

    if mode == "step":
        os.makedirs(WORK, exist_ok=True)
        job = make_job(spark, batch)
        t0 = time.time()
        r = job.run(until_seq=n - 1, max_batches=12)
        r["wall"] = time.time() - t0
        print(json.dumps({"step": r}))
        return

    # verify: independent distributed fold of the generated log
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from milvus_cdc_spark.sources.event_log import generate_events
    from milvus_cdc_spark.sources.icebox import IceboxTable

    ev = generate_events(spark, n, num_keys=KEYS, content_repeat=REPEAT).filter(
        F.col("event_type").isin("insert", "update", "delete")
    )
    w = Window.partitionBy("repo", "path").orderBy(F.col("event_seq").desc())
    expected = (
        ev.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("event_type") != "delete"))
        .select("repo", "path", F.sha2("content", 256).alias("content_sha256"))
    )
    table = IceboxTable(spark, os.path.join(WORK, "tbl"))
    got = table.read().select("repo", "path", "content_sha256")
    j = got.alias("l").join(expected.alias("r"), ["repo", "path"], "full_outer")
    res = j.agg(
        F.count(F.when(F.col("l.content_sha256") == F.col("r.content_sha256"), 1)).alias("match"),
        F.count(F.when(F.col("l.content_sha256").isNull(), 1)).alias("missing_in_table"),
        F.count(F.when(F.col("r.content_sha256").isNull(), 1)).alias("extra_in_table"),
        F.count(
            F.when(
                F.col("l.content_sha256").isNotNull()
                & F.col("r.content_sha256").isNotNull()
                & (F.col("l.content_sha256") != F.col("r.content_sha256")),
                1,
            )
        ).alias("sha_mismatch"),
    ).collect()[0]
    identical = (
        res["missing_in_table"] == 0
        and res["extra_in_table"] == 0
        and res["sha_mismatch"] == 0
    )
    out = {
        "events": n,
        "live_keys": res["match"],
        "missing_in_table": res["missing_in_table"],
        "extra_in_table": res["extra_in_table"],
        "sha_mismatch": res["sha_mismatch"],
        "identical": identical,
        "snapshots": len(table.snapshots()),
    }
    print(json.dumps(out))
    with open(os.path.join(REPO, "BENCH", "ANCHOR.md"), "w") as f:
        f.write(
            f"""# BENCH/ANCHOR.md — 10^8-event correctness anchor

`python BENCH/run_anchor.py` replayed **{n:,} change events**
({KEYS:,}-key universe, deterministic seeded generator, batch {4_000_000:,},
merge-on-read with inline minor compaction) into an icebox table across
MULTIPLE separate driver processes, each resuming from the metastore
checkpoint — the resumable-mid-stream requirement exercised at scale.

Verification: full-outer join of the final table against an independent
distributed LWW fold of the same log (window + built-in sha2 — none of
the merge/compaction/checkpoint machinery under test):

```json
{json.dumps(out, indent=2)}
```

identical = {identical} — every one of {res["match"]:,} live keys carries
the exact content sha256 the fold predicts; no missing, extra, or
mismatched rows.
"""
        )
    sys.exit(0 if identical else 1)


if __name__ == "__main__":
    main()
