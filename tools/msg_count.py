"""Offline event-count tool — the analog of the reference's msg_count
(``/root/reference/server/tool/msg_count/main.go``): count events between
two positions, per partition and per type, to account for throughput and
verify nothing was skipped.

Usage: python tools/msg_count.py LOG_PATH [lo] [hi]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from milvus_cdc_spark.session import get_spark  # noqa: E402
from milvus_cdc_spark.sources.event_log import read_event_range  # noqa: E402


def main() -> None:
    log = sys.argv[1]
    lo = int(sys.argv[2]) if len(sys.argv) > 2 else -1
    hi = int(sys.argv[3]) if len(sys.argv) > 3 else (1 << 62)
    spark = get_spark(app_name="msg_count")
    ev = read_event_range(spark, log, lo, hi)
    per_part = {
        str(r["partition_id"]): {
            "rows": r["rows"], "min_seq": r["min_seq"], "max_seq": r["max_seq"]
        }
        for r in ev.groupBy("partition_id")
        .agg(
            F.count("*").alias("rows"),
            F.min("event_seq").alias("min_seq"),
            F.max("event_seq").alias("max_seq"),
        )
        .collect()
    }
    per_type = {
        r["event_type"]: r["rows"]
        for r in ev.groupBy("event_type").agg(F.count("*").alias("rows")).collect()
    }
    print(
        json.dumps(
            {
                "log": log,
                "range": [lo, hi],
                "total": sum(p["rows"] for p in per_part.values()),
                "per_partition": per_part,
                "per_type": per_type,
            }
        )
    )


if __name__ == "__main__":
    main()
