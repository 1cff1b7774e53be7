"""Task lifecycle — Create/Pause/Resume/Delete/Get/List/GetPosition.

The analog of the reference's HTTP task API
(``/root/reference/server/cdc_api.go:26-37``) and task state machine
(``server/model/meta/task.go:29-75``: Initial/Running/Paused). The HTTP
layer itself is out of scope (our "server" is the driver program); the
semantics preserved are:

- duplicate-scope guard: two tasks may not cover the same repo scope
  (``server/cdc_impl.go:328-406``),
- pause-with-reason persisted on failure (``server/cdc_impl.go:1347-1383``),
- positions retrievable per task (``GetPosition``),
- delete removes task meta + positions.
"""

from __future__ import annotations

import traceback
from typing import Any

from pyspark.sql import SparkSession

from milvus_cdc_spark.plans.apply import ReplicateJob, parquet_source
from milvus_cdc_spark.plans.metastore import Metastore

STATE_INITIAL = "initial"
STATE_RUNNING = "running"
STATE_PAUSED = "paused"


class DuplicateTaskError(ValueError):
    pass


class TaskManager:
    def __init__(self, spark: SparkSession, metastore: Metastore):
        self.spark = spark
        self.meta = metastore

    def create(
        self,
        task_id: str,
        log_path: str,
        table_root: str,
        repo_pattern: str = "*",
        start_seq: int | None = None,
        start_positions: dict[int, int] | None = None,
        **job_kwargs: Any,
    ) -> dict[str, Any]:
        """Create a task. ``start_seq`` / ``start_positions`` seed the
        checkpoint BEFORE the first run — the analog of the reference
        decoding user-supplied per-vchannel positions at task create and
        persisting them before starting (``server/cdc_impl.go:480-539``).
        A user attaching CDC to an already-bootstrapped table starts from
        its known offset instead of replaying from seq 0.
        """
        if self.meta.load_task(task_id) is not None:
            raise DuplicateTaskError(f"task {task_id} exists")
        for t in self.meta.list_tasks():
            if t["table_root"] == table_root:
                # One writer per table — the duplicate-collection guard.
                # PAUSED tasks count too: a paused task can be resumed at
                # any time, and "create over a paused task, then resume
                # both" would put two writers on one table.
                raise DuplicateTaskError(
                    f"table {table_root} already covered by task {t['task_id']}"
                )
        task = {
            "task_id": task_id,
            "log_path": log_path,
            "table_root": table_root,
            "repo_pattern": repo_pattern,
            "state": STATE_INITIAL,
            "reason": None,
            "start_seq": start_seq,
            "job_kwargs": job_kwargs,
        }
        if start_seq is not None or start_positions:
            # MIN of the per-partition positions: the replay loop seeks by
            # global_offset alone, so the seed must not skip past any
            # partition's unconsumed events. Re-applying events another
            # partition already consumed is idempotent (seq-resolved
            # merge); skipping is silent data loss.
            offset = (
                start_seq
                if start_seq is not None
                else min(int(v) for v in start_positions.values())
            )
            # persist the seed position BEFORE the task can run, so a
            # crash between create and first run still resumes from it
            self.meta.save_checkpoint(
                task_id, -1, start_positions or {}, global_offset=offset
            )
        self.meta.save_task(task)
        return task

    def _job(self, task: dict[str, Any]) -> ReplicateJob:
        return ReplicateJob(
            spark=self.spark,
            source=parquet_source(task["log_path"]),
            table_root=task["table_root"],
            metastore=self.meta,
            task_id=task["task_id"],
            repo_pattern=task.get("repo_pattern") or None,
            **task.get("job_kwargs", {}),
        )

    def run(self, task_id: str, until_seq: int, max_batches: int | None = None) -> dict:
        """Run (or resume) a task. Any failure pauses the task with the
        reason persisted, mirroring ``pauseTaskWithReason``."""
        task = self.meta.load_task(task_id)
        if task is None:
            raise ValueError(f"no such task: {task_id}")
        if task["state"] == STATE_PAUSED and task.get("reason") == "user":
            raise RuntimeError(f"task {task_id} paused by user; resume first")
        task["state"] = STATE_RUNNING
        task["reason"] = None
        self.meta.save_task(task)
        try:
            result = self._job(task).run(until_seq, max_batches=max_batches)
        except Exception:
            task["state"] = STATE_PAUSED
            task["reason"] = traceback.format_exc(limit=3)
            self.meta.save_task(task)
            raise
        task["state"] = STATE_INITIAL if result["batches"] == 0 else STATE_RUNNING
        self.meta.save_task(task)
        return result

    def pause(self, task_id: str, reason: str = "user") -> None:
        task = self.meta.load_task(task_id)
        assert task is not None
        task["state"] = STATE_PAUSED
        task["reason"] = reason
        self.meta.save_task(task)

    def resume(self, task_id: str) -> None:
        task = self.meta.load_task(task_id)
        assert task is not None
        task["state"] = STATE_INITIAL
        task["reason"] = None
        self.meta.save_task(task)

    def get(self, task_id: str) -> dict[str, Any] | None:
        return self.meta.load_task(task_id)

    def list(self) -> list[dict[str, Any]]:
        return self.meta.list_tasks()

    def get_position(self, task_id: str) -> dict[str, Any]:
        return self.meta.load_checkpoint(task_id)

    def delete(self, task_id: str) -> None:
        self.meta.delete_task(task_id)
