"""SparkSession factory with scale-appropriate defaults.

Local mode is a single JVM; on a real cluster the same settings hold
except ``spark.driver.memory`` (per-executor memory takes over) and
shuffle partitions, which should track total cores (AQE coalesces the
excess at runtime).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "milvus_cdc_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for this engine.

    AQE is on so skewed shuffle partitions are split at runtime (the
    reference has no skew answer — its channel mapping only balances
    channel counts, ``core/util/channel_mapping.go:27-169``; we get
    runtime skew-splitting for free and add explicit salting in
    ``operators/salting.py`` for the pathological cases).
    """
    master = master or os.environ.get("SPARK_GRAFT_MASTER", "local[32]")
    cores = _core_count(master)
    shuffle_partitions = shuffle_partitions or max(cores, 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "zstd")
        # TypedImperativeAggregates (collect_list/percentile/...) run on
        # ObjectHashAggregateExec, which silently falls back to SORT-based
        # aggregation after only 128 groups by default. Keep them
        # hash-based. (Note: max_by over a wide struct plans as
        # SortAggregate regardless — its buffer isn't hash-mutable — which
        # is fine: the partial/final split still combines map-side;
        # pinned by tests/test_plans.py.)
        .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", str(1 << 30))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        # files.maxPartitionBytes default 128m is right for the 100 TB
        # target; do not shrink it for local tests.
    )
    env_conf = os.environ.get("SPARK_GRAFT_EXTRA_CONF")
    if env_conf:
        # JSON {"spark.key": "value"} — lets subprocess harnesses (bench
        # diagnostics, event-log captures) inject conf without a code path
        import json

        for k, v in json.loads(env_conf).items():
            builder = builder.config(k, str(v))
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def _core_count(master: str) -> int:
    if master.startswith("local["):
        inner = master[len("local[") : -1]
        if inner == "*":
            return os.cpu_count() or 8
        try:
            return int(inner)
        except ValueError:
            return 8
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
