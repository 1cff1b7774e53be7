"""Skew salting for hot repos.

The reference has NO skew answer — ``core/util/channel_mapping.go`` only
balances channel *counts*, so a hot collection saturates one goroutine.
The north rule demands explicit salting. Two layers here:

1. AQE skew-join splitting is enabled globally (session.py) — handles
   join-side skew at runtime.
2. ``salted_repartition`` handles *processing* skew: wide per-row work
   (sha256/normalization UDFs) over a log where one repo holds 30%+ of
   events. Salting on ``(repo, salt)`` spreads a hot repo over
   ``salt_factor`` partitions. No de-salt pass is needed in this engine:
   the merge key is the full ``(repo, path)`` — finer than repo — so the
   later dedup/merge shuffle re-partitions anyway; the salt column is
   dropped after the repartition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def spread_scan(df: DataFrame, min_ratio: int = 1) -> DataFrame:
    """Round-robin-repartition a LOW-SPLIT scan up to the session's core
    count before CPU-heavy per-row work (hashing, shingling, HOF dot
    products).

    Parquet can only split between row groups, so a single-row-group
    file scans as ONE task no matter how many cores the session has —
    at r06 measurement the per-word md5 pipeline of simhash/minhash ran
    its whole corpus on 2 of 32 cores (13 s where the join it feeds
    takes 0.4 s). The repartition moves only the raw input rows (cheap
    next to the per-token work downstream) and is a NO-OP whenever the
    scan already has >= cores × ``min_ratio`` splits — the normal case
    at deployment scale, where inputs are many file splits; the helper
    is scale-adaptive (``defaultParallelism``), never a constant tuned
    to local mode.
    """
    par = df.sparkSession.sparkContext.defaultParallelism * min_ratio
    if df.rdd.getNumPartitions() >= par:
        return df
    return df.repartition(par)


def salted_repartition(
    df: DataFrame,
    hot_key_col: str,
    num_partitions: int,
    salt_factor: int = 8,
    seq_col: str = "event_seq",
) -> DataFrame:
    """Hash-repartition on ``(hot_key, salt)`` where salt is derived from
    a per-row column (deterministic — resumable replays see the same
    placement). Rows with a null hot key (DDL) get salt 0."""
    salt = F.pmod(F.xxhash64(F.col(seq_col)), F.lit(salt_factor))
    return (
        df.withColumn("__salt", F.coalesce(salt, F.lit(0)))
        .repartition(num_partitions, F.col(hot_key_col), F.col("__salt"))
        .drop("__salt")
    )
