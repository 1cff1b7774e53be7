"""Metastore: checkpoints, lineage, metrics, task state.

The analog of the reference's etcd/MySQL meta stores behind
``MetaStoreFactory`` (``/root/reference/server/store/etcd.go``,
``mysql.go``) holding ``TaskInfo`` + ``TaskCollectionPosition``
(``server/model/meta/task.go:29-116``).

These are tiny, driver-side, per-batch writes (one row per partition per
batch) — putting them through Spark jobs would add two JVM round trips
per batch for kilobytes of state. So, like the reference (which uses
etcd, not Milvus itself), the metastore is plain JSON with atomic
``os.replace`` swaps for state and O_APPEND JSONL for the audit tables.
Accessors expose lineage/metrics back as DataFrames for querying.

Checkpoint invariant (the exactly-once contract, SURVEY.md §3.4):
positions are written AFTER the data commit; a crash between commit and
checkpoint causes a re-apply on restart, which the batch-id fence + the
idempotent MERGE make a no-op. Positions for dropped tables are frozen,
mirroring ``server/store/meta_op.go:145-177``.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from typing import Any

from pyspark.sql import DataFrame, SparkSession

LINEAGE_SCHEMA = (
    "task_id string, batch_id long, partition_id int, offset_start long, "
    "offset_end long, snapshot_id long, committed_ts double"
)
METRICS_SCHEMA = (
    "task_id string, batch_id long, partition_id int, rows_in long, "
    "rows_applied long, bytes long, events_per_sec double, lag_events long"
)


class Metastore:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -------------------------------------------------------- checkpoints
    def _ckpt_path(self, task_id: str) -> str:
        return os.path.join(self.root, f"checkpoint-{task_id}.json")

    def load_checkpoint(self, task_id: str) -> dict[str, Any]:
        """{"batch_id": last applied, "global_offset": consumed-through seq,
        "positions": {partition_id: offset_end}, "dropped": bool} — the
        TaskCollectionPosition analog."""
        p = self._ckpt_path(task_id)
        if not os.path.exists(p):
            return {"batch_id": -1, "global_offset": -1, "positions": {}, "dropped": False}
        with open(p) as f:
            return json.load(f)

    def save_checkpoint(
        self,
        task_id: str,
        batch_id: int,
        positions: dict[int, int],
        global_offset: int | None = None,
        dropped: bool = False,
    ) -> None:
        prev = self.load_checkpoint(task_id)
        if prev.get("dropped"):
            return  # frozen — never move a dropped position (meta_op.go:145-177)
        merged = {**{int(k): v for k, v in prev["positions"].items()},
                  **{int(k): v for k, v in positions.items()}}
        state = {
            "batch_id": batch_id,
            "global_offset": prev.get("global_offset", -1)
            if global_offset is None
            else global_offset,
            "positions": merged,
            "dropped": dropped,
        }
        tmp = self._ckpt_path(task_id) + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump(state, f)
        os.replace(tmp, self._ckpt_path(task_id))

    # ------------------------------------------------------ lineage/metrics
    def append_lineage(self, rows: list[dict[str, Any]]) -> None:
        self._append("lineage.jsonl", rows)

    def append_metrics(self, rows: list[dict[str, Any]]) -> None:
        self._append("metrics.jsonl", rows)

    def _append(self, name: str, rows: list[dict[str, Any]]) -> None:
        with open(os.path.join(self.root, name), "a") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")

    def lineage_df(self, spark: SparkSession) -> DataFrame:
        return self._read_jsonl(spark, "lineage.jsonl", LINEAGE_SCHEMA)

    def metrics_df(self, spark: SparkSession) -> DataFrame:
        return self._read_jsonl(spark, "metrics.jsonl", METRICS_SCHEMA)

    def _read_jsonl(self, spark: SparkSession, name: str, schema: str) -> DataFrame:
        p = os.path.join(self.root, name)
        if not os.path.exists(p):
            return spark.createDataFrame([], schema)
        return spark.read.schema(schema).json(p)

    # ------------------------------------------------------------- tasks
    def _task_path(self, task_id: str) -> str:
        return os.path.join(self.root, f"task-{task_id}.json")

    def save_task(self, task: dict[str, Any]) -> None:
        tmp = self._task_path(task["task_id"]) + f".tmp-{uuid.uuid4().hex[:8]}"
        task = {**task, "updated_ts": time.time()}
        with open(tmp, "w") as f:
            json.dump(task, f)
        os.replace(tmp, self._task_path(task["task_id"]))

    def load_task(self, task_id: str) -> dict[str, Any] | None:
        p = self._task_path(task_id)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def list_tasks(self) -> list[dict[str, Any]]:
        out = []
        for fn in sorted(os.listdir(self.root)):
            if fn.startswith("task-") and fn.endswith(".json"):
                with open(os.path.join(self.root, fn)) as f:
                    out.append(json.load(f))
        return out

    def delete_task(self, task_id: str) -> None:
        for fn in (self._task_path(task_id), self._ckpt_path(task_id)):
            if os.path.exists(fn):
                os.remove(fn)
