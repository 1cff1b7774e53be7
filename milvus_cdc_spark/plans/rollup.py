"""Continuous aggregate (hypertable-rollup analog): a time-bucketed
aggregate table maintained INCREMENTALLY from the same ordered event
log the replication path tails.

The classic continuous-aggregate maintenance loop, CDC-style:

    per batch (lo, hi]:
      partials   = batch events → groupBy(time_bucket, key) partial aggs
      affected   = the (bucket, key) rows the batch touches
      new_totals = current values for affected keys (outer-joined) + partials
      MERGE new_totals (LWW upsert keyed on (bucket, key), seq = batch_id)
      checkpoint

Cost per batch is O(batch + affected rows), never O(table) — and never
O(table AGE): the totals table is placed with the ``timehash:day``
formula (coarse day of ``window_start`` ABOVE a hash sub-bucket of
``user_id`` — the Iceberg ``days(ts), bucket(N, id)`` shape, see
``functions/hashing.py:placement_expr``), so a batch touching only
recent windows reads and rewrites only those days' buckets. Under pure
hash placement every bucket would hold rows for ALL windows ever seen
and the per-batch read-modify-write would grow with table age forever —
the decay a year-long 100 TB replay cannot afford. Exactly-once matters
MORE here than for the replica
table — adding a batch twice corrupts totals silently — so the additive
step is fenced by the snapshot's ``batch_id`` property (a replayed batch
is skipped, mirroring the apply path's fence) on top of
checkpoint-after-commit.

No reference analog (milvus-cdc replicates state; it has no derived
aggregates) — this is the training-data-pipeline extension the engine's
merge machinery makes ~80 lines.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from milvus_cdc_spark.plans.metastore import Metastore
from milvus_cdc_spark.sources.icebox import IceboxTable

ROLLUP_SCHEMA = (
    "window_start timestamp, user_id bigint, n_events bigint, "
    "sum_cents bigint, last_batch bigint"
)
KEYS = ["window_start", "user_id"]


@dataclass
class RollupJob:
    """Maintain an hourly (``bucket``) per-user rollup of the events
    stream: event count + sum of cents."""

    spark: SparkSession
    events_path: str
    table_root: str
    metastore: Metastore
    task_id: str = "rollup0"
    batch_size: int = 100_000
    num_buckets: int = 8  # hash SUB-buckets per day partition
    bucket: str = "1 hour"
    _table: IceboxTable | None = field(default=None, repr=False)

    def table(self) -> IceboxTable:
        if self._table is None:
            if not IceboxTable.exists(self.table_root):
                IceboxTable.create(
                    self.spark, self.table_root, ROLLUP_SCHEMA, KEYS,
                    num_buckets=self.num_buckets,
                    properties={"task_id": self.task_id, "batch_id": -1},
                    seq_col="last_batch",
                    write_mode="cow",  # totals are read-modify-write anyway
                    # day-of-window ABOVE the hash: per-batch reads prune
                    # to the batch's own days, never re-reading old totals
                    bucket_formula="timehash:day",
                )
            self._table = IceboxTable(self.spark, self.table_root)
        return self._table

    def _partials(self, lo: int, hi: int) -> DataFrame:
        ev = self.spark.read.parquet(self.events_path).filter(
            (F.col("event_id") > lo) & (F.col("event_id") <= hi)
        )
        return ev.groupBy(
            F.window("ts", self.bucket).getField("start").alias("window_start"),
            "user_id",
        ).agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("sum_cents"),
        )

    def apply_batch(self, batch_id: int, lo: int, hi: int) -> int:
        table = self.table()
        # additive fence: a batch already folded into the totals must
        # NEVER be folded again (double-add corrupts silently)
        if int(table.properties.get("batch_id", -1)) >= batch_id:
            return 0
        # Day bounds come from a SEPARATE, narrow scan of the batch range
        # (ts + pushed event_id range only — hour windows nest inside
        # days, so min/max day(ts) == min/max day(window_start)): cheaper
        # than materializing the whole partial aggregate into the cache
        # just to read two scalars off it, and the merge job below then
        # computes the partials exactly once with no persist/unpersist
        # bookkeeping or executor cache pressure (r06; guide §6 column
        # pruning).
        partials = self._partials(lo, hi)
        try:
            # Affected buckets under timehash:day placement = the batch's
            # DAY range × sub-buckets, from one min/max agg over the
            # cached partials (two scalars to the driver). The day MUST be
            # computed the way the placement formula computes it — UTC
            # epoch arithmetic, not cast('date'), which renders in the
            # session zone (functions/hashing.py:placement_expr). A day
            # inside the range with no events is rewritten as a carry-over
            # (harmless); a pathological range (one corrupt far-past
            # timestamp) falls back to the exact distinct so the rewrite
            # stays bounded.
            from milvus_cdc_spark.functions.hashing import placement_expr

            snap = table.snap
            sub = snap.num_buckets
            # cast through TIMESTAMP first: the events' ts (and hence the
            # partials' window_start) may be timestamp_ntz, and the merge
            # will cast it to the table's timestamp leading key before
            # placing — computing the day on the same casted value keeps
            # the bounds and the placement in lock-step under any session
            # timezone (and ntz has no direct cast to double anyway)
            ev_day = F.floor(
                F.col("ts").cast("timestamp").cast("double") / F.lit(86400.0)
            ).cast("int")
            d0, d1 = (
                self.spark.read.parquet(self.events_path)
                .filter((F.col("event_id") > lo) & (F.col("event_id") <= hi))
                .agg(F.min(ev_day), F.max(ev_day))
                .collect()[0]
            )
            if d0 is None:
                self.metastore.save_checkpoint(
                    self.task_id, batch_id, {}, global_offset=hi
                )
                return 0  # empty batch
            if (d1 - d0 + 1) * sub > 16_384:
                affected = sorted(
                    r[0]
                    for r in partials.select(
                        # same cast discipline as win_day above: the
                        # partials' window_start may be timestamp_ntz,
                        # so cast through TIMESTAMP before placement —
                        # matching both placement_expr's default
                        # time_type and the target table's timestamp
                        # leading key (ADVICE r4 #1)
                        placement_expr(
                            snap.bucket_formula,
                            [F.col(KEYS[0]).cast("timestamp"), *KEYS[1:]],
                            sub,
                        ).alias("b")
                    ).distinct().collect()
                )
            else:
                affected = [
                    d * sub + s
                    for d in range(int(d0), int(d1) + 1)
                    for s in range(sub)
                ]
            current = table.read_buckets(snap, affected).select(
                *KEYS,
                F.col("n_events").alias("cur_n"),
                F.col("sum_cents").alias("cur_sum"),
                F.col("last_batch").alias("cur_batch"),
            )
            # FULL outer join: touched keys get partials added; the
            # affected buckets' UNtouched keys (same day, other users/
            # windows) carry over unchanged. The result is the complete
            # post-image of the affected buckets, so the merge can skip
            # re-reading them and the winner-resolution shuffle (merge
            # complete=True) — one join is the batch's only shuffle over
            # existing totals.
            touched = F.col("n_events").isNotNull()
            new_totals = (
                partials.join(current, KEYS, "full_outer")
                .select(
                    *KEYS,
                    (F.coalesce(F.col("n_events"), F.lit(0))
                     + F.coalesce(F.col("cur_n"), F.lit(0))).alias("n_events"),
                    (F.coalesce(F.col("sum_cents"), F.lit(0))
                     + F.coalesce(F.col("cur_sum"), F.lit(0))).alias("sum_cents"),
                    F.when(touched, F.lit(batch_id).cast("bigint"))
                    .otherwise(F.col("cur_batch")).alias("last_batch"),
                    F.lit(False).alias("__deleted"),
                )
            )
            snapshot_id = table.merge(
                new_totals,
                # buckets known up front — the merge skips its discovery
                # staging write; with the complete post-image it reads and
                # shuffles nothing of its own (ONE write job per batch)
                affected_buckets=affected,
                complete=True,
                properties={
                    "task_id": self.task_id,
                    "batch_id": batch_id,
                    "offset_end": hi,
                },
            )
        finally:
            pass  # partials is lazy — nothing to release
        self.metastore.save_checkpoint(self.task_id, batch_id, {}, global_offset=hi)
        return snapshot_id

    def run(self, until_seq: int, max_batches: int | None = None) -> dict:
        ckpt = self.metastore.load_checkpoint(self.task_id)
        lo = int(ckpt.get("global_offset", -1))
        batch_id = int(ckpt["batch_id"]) + 1
        # crash fence: totals committed but checkpoint write lost →
        # fast-forward BOTH the offset and the batch numbering from the
        # snapshot properties. Replaying the range under a NEW batch_id
        # would slip past the additive fence and double-add — the offset
        # fast-forward is load-bearing here, not just bookkeeping.
        props = self.table().properties
        if int(props.get("batch_id", -1)) >= batch_id:
            lo = max(lo, int(props.get("offset_end", lo)))
            batch_id = int(props["batch_id"]) + 1
        batches = 0
        while lo < until_seq and (max_batches is None or batches < max_batches):
            hi = min(lo + self.batch_size, until_seq)
            self.apply_batch(batch_id, lo, hi)
            lo = hi
            batch_id += 1
            batches += 1
        return {"batches": batches, "final_offset": lo}
