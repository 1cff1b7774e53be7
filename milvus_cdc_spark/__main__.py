"""CLI — the task-API surface (analog of the reference's HTTP server,
``/root/reference/server/cdc_api.go:26-37``: Create/Delete/Pause/Resume/
Get/GetPosition/List). An HTTP daemon makes no sense for a Spark driver
program; the CLI exposes the same verbs over the same metastore.

Usage:
  python -m milvus_cdc_spark create  --meta DIR --task ID --log PATH --table DIR
  python -m milvus_cdc_spark run     --meta DIR --task ID --until SEQ
  python -m milvus_cdc_spark pause   --meta DIR --task ID
  python -m milvus_cdc_spark resume  --meta DIR --task ID
  python -m milvus_cdc_spark get     --meta DIR --task ID
  python -m milvus_cdc_spark position --meta DIR --task ID
  python -m milvus_cdc_spark list    --meta DIR
  python -m milvus_cdc_spark delete  --meta DIR --task ID
  python -m milvus_cdc_spark compact --table DIR
  python -m milvus_cdc_spark serve   --meta DIR --port 8444

``serve`` starts the HTTP front (``server.py``) over the same
TaskManager — the reference's POST /cdc endpoint shape."""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="milvus_cdc_spark")
    p.add_argument("verb", choices=[
        "create", "run", "pause", "resume", "get", "position", "list",
        "delete", "compact", "rebucket", "expire", "serve",
    ])
    p.add_argument("--meta", help="metastore directory")
    p.add_argument("--task", help="task id")
    p.add_argument("--log", help="event-log parquet path (create)")
    p.add_argument("--table", help="target table root")
    p.add_argument("--until", type=int, help="replay through this seq (run)")
    p.add_argument("--batch-size", type=int, default=100_000)
    p.add_argument("--num-buckets", type=int, default=32)
    p.add_argument("--repo-pattern", default="*")
    p.add_argument("--keep-last", type=int, default=10,
                   help="expire: number of newest snapshots to keep")
    p.add_argument("--start-seq", type=int, default=None,
                   help="create: seed the checkpoint at this seq (user start position)")
    p.add_argument("--master", default=None)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8444)
    a = p.parse_args(argv)

    from milvus_cdc_spark.session import get_spark

    def tm():
        from milvus_cdc_spark.plans.metastore import Metastore
        from milvus_cdc_spark.plans.task import TaskManager

        return TaskManager(get_spark(master=a.master), Metastore(a.meta))

    if a.verb == "serve":
        from milvus_cdc_spark.plans.metastore import Metastore
        from milvus_cdc_spark.server import serve

        serve(get_spark(master=a.master), Metastore(a.meta),
              host=a.host, port=a.port)
        return 0

    out: object
    if a.verb == "create":
        out = tm().create(
            a.task, a.log, a.table,
            repo_pattern=a.repo_pattern,
            start_seq=a.start_seq,
            batch_size=a.batch_size, num_buckets=a.num_buckets,
        )
    elif a.verb == "run":
        out = tm().run(a.task, until_seq=a.until)
    elif a.verb == "pause":
        tm().pause(a.task)
        out = {"task_id": a.task, "state": "paused"}
    elif a.verb == "resume":
        tm().resume(a.task)
        out = {"task_id": a.task, "state": "initial"}
    elif a.verb == "get":
        out = tm().get(a.task)
    elif a.verb == "position":
        out = tm().get_position(a.task)
    elif a.verb == "list":
        out = tm().list()
    elif a.verb == "delete":
        tm().delete(a.task)
        out = {"task_id": a.task, "deleted": True}
    elif a.verb in ("compact", "rebucket", "expire"):
        from milvus_cdc_spark.sources.icebox import IceboxTable

        if not IceboxTable.exists(a.table):
            print(json.dumps({"error": f"no such table: {a.table}"}))
            return 1
        t = IceboxTable(get_spark(master=a.master), a.table)
        if a.verb == "compact":
            out = {"table": a.table, "snapshot_id": t.compact(threshold=0)}
        elif a.verb == "expire":
            out = {"table": a.table, **t.expire_snapshots(keep_last=a.keep_last)}
        else:
            out = {"table": a.table, "snapshot_id": t.rebucket(a.num_buckets),
                   "num_buckets": a.num_buckets}
    print(json.dumps(out, default=str))
    return 0


if __name__ == "__main__":
    sys.exit(main())
