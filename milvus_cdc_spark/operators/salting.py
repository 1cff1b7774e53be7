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
