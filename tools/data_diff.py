"""Offline final-state diff tool — the analog of the reference's
data_diff (``/root/reference/server/tool/data_diff/main.go:39-77``),
which reconstructs per-PK timelines from both clusters and diffs final
state. Here: diff an icebox table against either another icebox table or
a replayed event log (pure fold), by (repo, path) → content_sha256.

Usage:
  python tools/data_diff.py TABLE_ROOT TABLE_ROOT2          # table vs table
  python tools/data_diff.py TABLE_ROOT --log LOG_PATH       # table vs log fold
Prints one JSON line: counts of matching / missing / extra / mismatched keys.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from milvus_cdc_spark.session import get_spark  # noqa: E402
from milvus_cdc_spark.sources.event_log import EVENT_SCHEMA  # noqa: E402
from milvus_cdc_spark.sources.icebox import IceboxTable  # noqa: E402


def table_state(spark, root: str) -> DataFrame:
    return IceboxTable(spark, root).read().select("repo", "path", "content_sha256")


def log_state(spark, log: str) -> DataFrame:
    """Fold the log distributedly: LWW per key, sha256 of the winner —
    usable as an at-scale oracle (the pandas fold in tests is the small-
    scale one)."""
    ev = spark.read.schema(EVENT_SCHEMA).parquet(log).filter(
        F.col("event_type").isin("insert", "update", "delete")
    )
    w = Window.partitionBy("repo", "path").orderBy(F.col("event_seq").desc())
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("event_type") != "delete"))
        .select("repo", "path", F.sha2("content", 256).alias("content_sha256"))
    )


def main() -> None:
    spark = get_spark(app_name="data_diff")
    left = table_state(spark, sys.argv[1])
    if sys.argv[2] == "--log":
        right = log_state(spark, sys.argv[3])
    else:
        right = table_state(spark, sys.argv[2])

    joined = left.alias("l").join(
        right.alias("r"), on=["repo", "path"], how="full_outer"
    )
    out = joined.agg(
        F.count(F.when(F.col("l.content_sha256") == F.col("r.content_sha256"), 1)).alias("match"),
        F.count(F.when(F.col("l.content_sha256").isNull(), 1)).alias("missing_left"),
        F.count(F.when(F.col("r.content_sha256").isNull(), 1)).alias("missing_right"),
        F.count(
            F.when(
                F.col("l.content_sha256").isNotNull()
                & F.col("r.content_sha256").isNotNull()
                & (F.col("l.content_sha256") != F.col("r.content_sha256")),
                1,
            )
        ).alias("sha_mismatch"),
    ).collect()[0]
    result = {k: out[k] for k in ("match", "missing_left", "missing_right", "sha_mismatch")}
    result["identical"] = (
        result["missing_left"] == 0
        and result["missing_right"] == 0
        and result["sha_mismatch"] == 0
    )
    print(json.dumps(result))
    sys.exit(0 if result["identical"] else 1)


if __name__ == "__main__":
    main()
