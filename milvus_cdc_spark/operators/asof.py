"""As-of join and range join — temporal operators Spark's API lacks,
re-expressed as scale-safe compositions of built-in operators.

Named in the brief's custom-operator list. Neither uses a theta-join:
a naive ``l.join(r, (l.key == r.key) & (l.ts >= r.ts))`` plans as a
BroadcastNestedLoopJoin (or a per-key cartesian) — O(n·m) compare work
that dies at scale. Both operators here are single-shuffle equi-join /
window shapes whose cost is O(n + m) rows through one exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    suffix: str = "_asof",
    how: str = "inner",
) -> DataFrame:
    """For each left row, attach the LATEST right row with
    ``right_ts <= left_ts`` for the same key (inclusive match).

    Scale path — the tag/union/window trick: tag both sides, union them,
    sort each key's timeline once, and carry the last-seen right ROW
    (one struct: payload fields + its ts) forward with a single
    ``last(..., ignorenulls=True)``, so every attached column comes from
    the same matched row even when payload values are NULL. ONE shuffle
    on the key (the window), zero join blowup; at equal timestamps the
    right row sorts first (side 0 < 1), giving the inclusive <=
    semantics.

    ``right`` must be unique per (key, right_ts) — pre-aggregate it
    otherwise; with duplicates the "latest" among equal timestamps is
    not deterministic (the same caveat DuckDB's ASOF JOIN carries).

    Adds ``<payload>{suffix}`` columns plus ``asof_ts`` (the matched
    right timestamp). ``how="inner"`` drops left rows with no prior
    right row; ``"left"`` keeps them with nulls.
    """
    l = left.withColumn("__ts", F.col(left_ts)).withColumn("__side", F.lit(1))
    # a right row with NULL ts can never be an as-of match, but nulls
    # sort FIRST in the window — its payload would leak into every left
    # row before the first real right row (with asof_ts still null)
    right = right.filter(F.col(right_ts).isNotNull())
    r = right.select(
        *key_cols,
        F.col(right_ts).alias("__ts"),
        *[F.col(c).alias(c + suffix) for c in right_payload],
    ).withColumn("__side", F.lit(0))
    u = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(*key_cols)
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Carry the matched right row as ONE struct (payload fields + its ts)
    # through a single last(ignorenulls=True): all attached columns come
    # from the SAME right row. Per-column last() would skip right rows
    # whose value is NULL for one column but not another, stitching
    # payload from different rows than asof_ts points at.
    match = F.when(
        F.col("__side") == 0,
        F.struct(
            *[F.col(c + suffix).alias(c + suffix) for c in right_payload],
            F.col("__ts").alias("__rts"),
        ),
    )
    u = u.withColumn("__match", F.last(match, ignorenulls=True).over(w))
    for c in right_payload:
        u = u.withColumn(c + suffix, F.col(f"__match.{c}{suffix}"))
    u = u.withColumn("asof_ts", F.col("__match.__rts"))
    out = u.filter(F.col("__side") == 1).drop("__side", "__ts", "__match")
    if how == "inner":
        out = out.filter(F.col("asof_ts").isNotNull())
    return out


def range_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    ts_col: str,
    start_col: str,
    end_col: str,
    bin_seconds: int = 1800,
) -> DataFrame:
    """Join left rows to right intervals: same key and
    ``start <= ts < end`` (end exclusive).

    Scale path — bin-bucketed interval join: each right interval is
    exploded to the ``bin_seconds``-wide time bins it overlaps, each
    left row computes its single bin, and the join is a plain EQUI-join
    on (key, bin) followed by the exact range filter. Catalyst plans a
    shuffled hash/sort-merge join — never a BroadcastNestedLoopJoin.
    Each (left, right) pair can meet in at most one bin (the left row's
    bin), so no dedup pass is needed.

    Pick ``bin_seconds`` near the typical interval width: much smaller
    explodes intervals into many bins; much larger packs unrelated rows
    into one bin (both only cost, never correctness).
    """
    lbin = F.floor(F.unix_timestamp(F.col(ts_col)) / bin_seconds).cast("long")
    l = left.withColumn("__bin", lbin)
    rbins = F.sequence(
        F.floor(F.unix_timestamp(F.col(start_col)) / bin_seconds).cast("long"),
        F.floor(F.unix_timestamp(F.col(end_col)) / bin_seconds).cast("long"),
    )
    r = right.withColumn("__bin", F.explode(rbins))
    out = l.join(r, [*key_cols, "__bin"]).filter(
        (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col))
    )
    return out.drop("__bin")
