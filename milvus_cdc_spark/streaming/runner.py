"""Structured Streaming front-end: the same apply pipeline inside
``foreachBatch``.

The batch path (plans/apply.py) drives itself with a driver loop over
offset ranges — the analog of the reference's packer + consume loop
(``server/msgpacker/packer.go``, ``server/cdc_impl.go:1089-1226``). This
module instead lets Structured Streaming own micro-batching, triggers
and source offset tracking (B1-B4 collapse into trigger config):

- source: file-stream over the event-log directory (new log files are
  discovered per trigger; Spark's streaming checkpoint/WAL records which
  files each epoch consumed — the position store for the source side),
- ``foreachBatch``: per epoch, the batch DataFrame goes through the SAME
  dedup → sha256 → MERGE pipeline; DDL events inside the epoch are
  applied in seq order between DML sub-ranges (DDL-before-DML preserved),
- exactly-once: Spark replays an epoch after a crash; the icebox
  snapshot's ``epoch`` property fences re-commits, and the seq-resolved
  MERGE is idempotent anyway (two independent layers, same as batch
  mode),
- triggers: ``availableNow=True`` (drain-and-stop: tests, catch-up) or
  ``processingTime`` (tailing, the TimerChecker analog —
  ``server/msgpacker/pack_checker.go:15-37``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from milvus_cdc_spark.plans.apply import ReplicateJob
from milvus_cdc_spark.sources.event_log import DDL_TYPES, EVENT_SCHEMA


class StreamingReplicator:
    """Tail an event-log directory into an icebox table via Structured
    Streaming. Wraps a :class:`ReplicateJob` for the apply logic."""

    def __init__(self, job: ReplicateJob, log_path: str, stream_checkpoint: str):
        self.job = job
        self.log_path = log_path
        self.stream_checkpoint = stream_checkpoint

    # ------------------------------------------------------------- epoch
    def _apply_epoch(self, batch_df: DataFrame, epoch_id: int) -> None:
        """foreachBatch body. DDL events split the epoch into ordered
        sub-ranges (DDL applied between them — §3.3 ordering)."""
        job = self.job
        table = job.table()

        # epoch fence: Spark re-runs an epoch whose commit crashed; skip
        # if this epoch already committed to the table.
        if int(table.properties.get("epoch", -1)) >= epoch_id:
            return

        ddl_rows = (
            batch_df.filter(F.col("event_type").isin(*DDL_TYPES))
            .select("event_seq", "event_type", "schema_change")
            .orderBy("event_seq")
            .collect()
        )
        bounds = [r["event_seq"] for r in ddl_rows]
        lo = None  # unbounded below: epoch contents are what Spark handed us
        segments: list[tuple[int | None, int | None]] = []
        prev: int | None = None
        for b in bounds:
            segments.append((prev, b))
            prev = b
        segments.append((prev, None))

        batch_id = int(job.metastore.load_checkpoint(job.task_id)["batch_id"]) + 1
        for i, (seg_lo, seg_hi) in enumerate(segments):
            df = batch_df
            if seg_lo is not None:
                df = df.filter(F.col("event_seq") > seg_lo)
            if seg_hi is not None:
                df = df.filter(F.col("event_seq") < seg_hi)
            changes = job._build_changes(
                df.filter(~F.col("event_type").isin(*DDL_TYPES))
            )
            table.merge(
                changes,
                compact_threshold=job.compact_threshold,
                changes_partitioned=True,
                properties={
                    "task_id": job.task_id,
                    "epoch": epoch_id,
                    "epoch_segment": i,
                },
            )
            if seg_hi is not None:
                ddl = ddl_rows[i]
                job._apply_ddl(ddl["event_type"], ddl["schema_change"])
        job.metastore.save_checkpoint(job.task_id, batch_id, {})

    # --------------------------------------------------------------- run
    def start(
        self,
        available_now: bool = True,
        processing_time: str | None = None,
        max_files_per_trigger: int | None = None,
    ):
        """Start the stream; returns the StreamingQuery. Use
        ``q.awaitTermination()`` (availableNow drains then stops) or
        ``q.stop()`` for processingTime mode."""
        reader = (
            self.job.spark.readStream.schema(EVENT_SCHEMA)
            .format("parquet")
        )
        if max_files_per_trigger:
            reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
        stream = reader.load(self.log_path)

        writer = (
            stream.writeStream.foreachBatch(self._apply_epoch)
            .option("checkpointLocation", self.stream_checkpoint)
            .outputMode("update")
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        else:
            writer = writer.trigger(processingTime=processing_time or "5 seconds")
        return writer.start()

    def run_until_drained(self) -> None:
        q = self.start(available_now=True)
        q.awaitTermination()
