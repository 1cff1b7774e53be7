"""Metastore: checkpoints, lineage, metrics, task state — behind a
driver seam.

The analog of the reference's meta stores behind ``MetaStoreFactory``
(``/root/reference/server/store/etcd.go``, ``mysql.go``) holding
``TaskInfo`` + ``TaskCollectionPosition``
(``server/model/meta/task.go:29-116``). Mirroring that factory,
:class:`MetastoreBackend` fixes the SEMANTICS (checkpoint merge rules,
frozen-when-dropped positions, audit-table schemas) while subclasses
provide only raw storage primitives — swapping the JSON files for a DB
(the etcd/MySQL analog) is a driver, not a rewrite of callers:

- :class:`Metastore` — JSON files + atomic ``os.replace`` swaps and
  O_APPEND JSONL audit logs (the default; right for a driver-side
  single host),
- :class:`SqliteMetastore` — stdlib ``sqlite3`` (the MySQL-store
  analog: a real transactional DB behind the same seam, zero new
  dependencies),
- :class:`InMemoryMetastore` — dict-backed (tests, ephemeral runs;
  also the template for a real DB driver: ~10 primitive methods).

These are tiny, driver-side, per-batch writes (one row per partition per
batch) — putting them through Spark jobs would add two JVM round trips
per batch for kilobytes of state. So, like the reference (which uses
etcd, not Milvus itself), storage is driver-local; accessors expose
lineage/metrics back as DataFrames for querying.

Checkpoint invariant (the exactly-once contract, SURVEY.md §3.4):
positions are written AFTER the data commit; a crash between commit and
checkpoint causes a re-apply on restart, which the batch-id fence + the
idempotent MERGE make a no-op. Positions for dropped tables are frozen,
mirroring ``server/store/meta_op.go:145-177``.
"""

from __future__ import annotations

import abc
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


class MetastoreBackend(abc.ABC):
    """Storage seam: subclasses provide raw primitives; the checkpoint
    merge semantics live HERE so no driver can drift from the
    exactly-once contract."""

    # ------------------------------------------------- raw primitives
    @abc.abstractmethod
    def _read_state(self, kind: str, key: str) -> dict[str, Any] | None:
        """Latest stored object for (kind, key) or None. kind ∈
        {"checkpoint", "task"}."""

    @abc.abstractmethod
    def _write_state(self, kind: str, key: str, state: dict[str, Any]) -> None:
        """Atomically replace the object for (kind, key)."""

    @abc.abstractmethod
    def _delete_state(self, kind: str, key: str) -> None:
        """Remove the object for (kind, key); missing is a no-op."""

    @abc.abstractmethod
    def _list_state(self, kind: str) -> list[dict[str, Any]]:
        """All stored objects of one kind (stable order)."""

    @abc.abstractmethod
    def _append_rows(self, table: str, rows: list[dict[str, Any]]) -> None:
        """Append rows to an audit table ("lineage" | "metrics")."""

    @abc.abstractmethod
    def _audit_rows(self, table: str) -> list[dict[str, Any]]:
        """All rows of an audit table (drivers with a native scan path
        may instead override lineage_df/metrics_df directly)."""

    # -------------------------------------------------------- checkpoints
    def load_checkpoint(self, task_id: str) -> dict[str, Any]:
        """{"batch_id": last applied, "global_offset": consumed-through seq,
        "positions": {partition_id: offset_end}, "dropped": bool} — the
        TaskCollectionPosition analog."""
        state = self._read_state("checkpoint", task_id)
        if state is None:
            return {"batch_id": -1, "global_offset": -1, "positions": {}, "dropped": False}
        return state

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
        self._write_state("checkpoint", task_id, state)

    # ------------------------------------------------------ lineage/metrics
    def append_lineage(self, rows: list[dict[str, Any]]) -> None:
        self._append_rows("lineage", rows)

    def append_metrics(self, rows: list[dict[str, Any]]) -> None:
        self._append_rows("metrics", rows)

    def lineage_df(self, spark: SparkSession) -> DataFrame:
        return spark.createDataFrame(self._audit_rows("lineage"), LINEAGE_SCHEMA)

    def metrics_df(self, spark: SparkSession) -> DataFrame:
        return spark.createDataFrame(self._audit_rows("metrics"), METRICS_SCHEMA)

    # ------------------------------------------------------------- tasks
    def save_task(self, task: dict[str, Any]) -> None:
        self._write_state("task", task["task_id"], {**task, "updated_ts": time.time()})

    def load_task(self, task_id: str) -> dict[str, Any] | None:
        return self._read_state("task", task_id)

    def list_tasks(self) -> list[dict[str, Any]]:
        return self._list_state("task")

    def delete_task(self, task_id: str) -> None:
        self._delete_state("task", task_id)
        self._delete_state("checkpoint", task_id)


class Metastore(MetastoreBackend):
    """JSON-file driver (the default): atomic ``os.replace`` swaps for
    state objects, O_APPEND JSONL for the audit tables — crash-safe on a
    single host with zero dependencies."""

    _PREFIX = {"checkpoint": "checkpoint-", "task": "task-"}

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _path(self, kind: str, key: str) -> str:
        return os.path.join(self.root, f"{self._PREFIX[kind]}{key}.json")

    def _read_state(self, kind: str, key: str) -> dict[str, Any] | None:
        p = self._path(kind, key)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def _write_state(self, kind: str, key: str, state: dict[str, Any]) -> None:
        p = self._path(kind, key)
        tmp = p + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump(state, f)
        os.replace(tmp, p)

    def _delete_state(self, kind: str, key: str) -> None:
        p = self._path(kind, key)
        if os.path.exists(p):
            os.remove(p)

    def _list_state(self, kind: str) -> list[dict[str, Any]]:
        prefix = self._PREFIX[kind]
        out = []
        for fn in sorted(os.listdir(self.root)):
            if fn.startswith(prefix) and fn.endswith(".json"):
                with open(os.path.join(self.root, fn)) as f:
                    out.append(json.load(f))
        return out

    def _append_rows(self, table: str, rows: list[dict[str, Any]]) -> None:
        # One os.write on an O_APPEND fd per call: concurrent router
        # threads share this metastore's audit files, and buffered
        # appends can flush mid-line, interleaving torn JSON rows
        # (ADVICE r4 #2). A single write to an O_APPEND regular file is
        # offset-atomic, so whole payloads interleave, never fragments.
        payload = "".join(json.dumps(r) + "\n" for r in rows).encode()
        fd = os.open(
            os.path.join(self.root, f"{table}.jsonl"),
            os.O_WRONLY | os.O_CREAT | os.O_APPEND,
            0o644,
        )
        try:
            os.write(fd, payload)
        finally:
            os.close(fd)

    def _audit_rows(self, table: str) -> list[dict[str, Any]]:
        p = os.path.join(self.root, f"{table}.jsonl")
        if not os.path.exists(p):
            return []
        with open(p) as f:
            return [json.loads(ln) for ln in f if ln.strip()]

    # audit tables can be large → read them with Spark's JSON scan
    # (distributed, schema-pruned) instead of driver-side rows
    def lineage_df(self, spark: SparkSession) -> DataFrame:
        return self._read_jsonl(spark, "lineage.jsonl", LINEAGE_SCHEMA)

    def metrics_df(self, spark: SparkSession) -> DataFrame:
        return self._read_jsonl(spark, "metrics.jsonl", METRICS_SCHEMA)

    def _read_jsonl(self, spark: SparkSession, name: str, schema: str) -> DataFrame:
        p = os.path.join(self.root, name)
        if not os.path.exists(p):
            return spark.createDataFrame([], schema)
        return spark.read.schema(schema).json(p)

    # kept for tests/tools that address checkpoint files directly
    def _ckpt_path(self, task_id: str) -> str:
        return self._path("checkpoint", task_id)


#: alias making the driver role explicit at call sites that configure one
JsonMetastore = Metastore


class SqliteMetastore(MetastoreBackend):
    """stdlib ``sqlite3`` driver — the transactional-DB analog of the
    reference's MySQL store (``server/store/mysql.go:55-101`` creates its
    tables the same way: idempotent DDL at connect, JSON blobs for task
    meta/positions). Proves the :class:`MetastoreBackend` seam against a
    real ACID store with zero new dependencies: state objects are JSON
    blobs UPSERTed by (kind, key), audit tables are append-only rows with
    a monotone rowid. WAL journal mode keeps concurrent readers (and a
    writer in another process) safe; a per-instance mutex serializes this
    process's threads over the one connection (foreachBatch runs on the
    stream execution thread)."""

    def __init__(self, path: str):
        import sqlite3
        import threading as _threading

        parent = os.path.dirname(os.path.abspath(path))
        if parent:
            os.makedirs(parent, exist_ok=True)
        self.path = path
        self._lock = _threading.Lock()
        # 60 s lock wait (connect timeout + busy_timeout): sqlite's 5 s
        # default surfaces 'database is locked' under a sustained writer
        # in another process, failing a batch mid-pipeline (ADVICE r4
        # #3); a CDC commit section is worth waiting a minute for.
        self._conn = sqlite3.connect(path, timeout=60.0, check_same_thread=False)
        with self._lock, self._conn:
            self._conn.execute("PRAGMA journal_mode=WAL")
            self._conn.execute("PRAGMA busy_timeout=60000")
            self._conn.execute(
                "CREATE TABLE IF NOT EXISTS state ("
                " kind TEXT NOT NULL, key TEXT NOT NULL, state TEXT NOT NULL,"
                " PRIMARY KEY (kind, key))"
            )
            self._conn.execute(
                "CREATE TABLE IF NOT EXISTS audit ("
                " seq INTEGER PRIMARY KEY AUTOINCREMENT,"
                " tbl TEXT NOT NULL, row TEXT NOT NULL)"
            )

    def _read_state(self, kind: str, key: str) -> dict[str, Any] | None:
        with self._lock:
            cur = self._conn.execute(
                "SELECT state FROM state WHERE kind=? AND key=?", (kind, key)
            )
            row = cur.fetchone()
        return None if row is None else json.loads(row[0])

    def _write_state(self, kind: str, key: str, state: dict[str, Any]) -> None:
        with self._lock, self._conn:  # one statement, one transaction
            self._conn.execute(
                "INSERT INTO state (kind, key, state) VALUES (?, ?, ?)"
                " ON CONFLICT (kind, key) DO UPDATE SET state=excluded.state",
                (kind, key, json.dumps(state)),
            )

    def _delete_state(self, kind: str, key: str) -> None:
        with self._lock, self._conn:
            self._conn.execute(
                "DELETE FROM state WHERE kind=? AND key=?", (kind, key)
            )

    def _list_state(self, kind: str) -> list[dict[str, Any]]:
        with self._lock:
            cur = self._conn.execute(
                "SELECT state FROM state WHERE kind=? ORDER BY key", (kind,)
            )
            rows = cur.fetchall()
        return [json.loads(r[0]) for r in rows]

    def _append_rows(self, table: str, rows: list[dict[str, Any]]) -> None:
        with self._lock, self._conn:
            self._conn.executemany(
                "INSERT INTO audit (tbl, row) VALUES (?, ?)",
                [(table, json.dumps(r)) for r in rows],
            )

    def _audit_rows(self, table: str) -> list[dict[str, Any]]:
        with self._lock:
            cur = self._conn.execute(
                "SELECT row FROM audit WHERE tbl=? ORDER BY seq", (table,)
            )
            rows = cur.fetchall()
        return [json.loads(r[0]) for r in rows]

    def close(self) -> None:
        with self._lock:
            self._conn.close()


class InMemoryMetastore(MetastoreBackend):
    """Dict-backed driver: ephemeral runs and tests, and the 1:1
    template for a DB-backed driver (each primitive maps to one
    statement). NOT crash-safe — state dies with the process."""

    def __init__(self):
        self._state: dict[tuple[str, str], dict[str, Any]] = {}
        self._audit: dict[str, list[dict[str, Any]]] = {"lineage": [], "metrics": []}

    def _read_state(self, kind: str, key: str) -> dict[str, Any] | None:
        v = self._state.get((kind, key))
        return None if v is None else dict(v)

    def _write_state(self, kind: str, key: str, state: dict[str, Any]) -> None:
        self._state[(kind, key)] = dict(state)

    def _delete_state(self, kind: str, key: str) -> None:
        self._state.pop((kind, key), None)

    def _list_state(self, kind: str) -> list[dict[str, Any]]:
        return [dict(v) for (k, _), v in sorted(self._state.items()) if k == kind]

    def _append_rows(self, table: str, rows: list[dict[str, Any]]) -> None:
        self._audit[table].extend(dict(r) for r in rows)

    def _audit_rows(self, table: str) -> list[dict[str, Any]]:
        return list(self._audit[table])
