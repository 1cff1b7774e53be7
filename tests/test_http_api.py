"""HTTP task API (server.py) — the reference's POST /cdc endpoint shape
(``server/server.go:56-125`` dispatching the ``CDCService`` verbs of
``server/cdc_api.go:26-37``) over the same TaskManager the CLI drives.
The parity test interleaves HTTP and direct-TaskManager calls over ONE
metastore to pin that the two fronts are the same surface (VERDICT r4
#6: create/pause/resume/position/list parity)."""

import json
import os
import urllib.request

import pytest

from milvus_cdc_spark.plans.metastore import Metastore
from milvus_cdc_spark.plans.task import TaskManager
from milvus_cdc_spark.server import CdcHttpServer
from milvus_cdc_spark.sources.event_log import generate_events, write_event_log


@pytest.fixture()
def http_env(spark, tmp_base):
    log = os.path.join(tmp_base, "log")
    write_event_log(generate_events(spark, 1200, num_keys=120), log)
    meta = Metastore(os.path.join(tmp_base, "meta"))
    srv = CdcHttpServer(spark, meta, port=0)
    host, port = srv.start()
    yield srv, meta, log, tmp_base, f"http://{host}:{port}"
    srv.stop()


def _post(base: str, verb: str, data: dict | None = None) -> tuple[int, dict]:
    body = json.dumps({"request_type": verb, "request_data": data or {}}).encode()
    req = urllib.request.Request(
        f"{base}/cdc", data=body, headers={"Content-Type": "application/json"}
    )
    try:
        with urllib.request.urlopen(req) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_http_full_lifecycle_and_cli_parity(spark, http_env):
    srv, meta, log, tmp, base = http_env
    tbl = os.path.join(tmp, "tblA")

    # create + duplicate guard → 400 (the reference returns handler
    # errors as error payloads the same way)
    st, r = _post(base, "create", {
        "task_id": "tA", "log_path": log, "table_root": tbl,
        "job_kwargs": {"batch_size": 500, "num_buckets": 4},
    })
    assert st == 200 and r["data"]["state"] == "initial"
    st, r = _post(base, "create", {"task_id": "tA", "log_path": log, "table_root": tbl})
    assert st == 400 and "exists" in r["message"]

    # run (bounded replay) + position
    st, r = _post(base, "run", {"task_id": "tA", "until_seq": 1199})
    assert st == 200 and r["data"]["batches"] == 3
    st, r = _post(base, "getposition", {"task_id": "tA"})
    assert st == 200 and r["data"]["global_offset"] == 1199

    # PARITY: the HTTP front and a direct TaskManager (the CLI's engine)
    # on the same metastore observe identical state at every verb
    tm = TaskManager(spark, meta)
    st, r = _post(base, "get", {"task_id": "tA"})
    assert r["data"] == tm.get("tA")
    st, r = _post(base, "list")
    assert [t["task_id"] for t in r["data"]] == [t["task_id"] for t in tm.list()]
    assert r["data"][0]["state"] == "running"

    # pause over HTTP is visible to the CLI engine, and vice versa
    st, r = _post(base, "pause", {"task_id": "tA"})
    assert st == 200 and tm.get("tA")["state"] == "paused"
    st, r = _post(base, "run", {"task_id": "tA", "until_seq": 1199})
    assert st == 500 and "paused" in r["message"]
    tm.resume("tA")
    st, r = _post(base, "get", {"task_id": "tA"})
    assert r["data"]["state"] == "initial"
    st, r = _post(base, "getposition", {"task_id": "tA"})
    assert r["data"] == tm.get_position("tA")

    # maintenance: compact the table through the endpoint
    st, r = _post(base, "maintenance", {"table_root": tbl, "op": "compact"})
    assert st == 200 and r["data"]["snapshot_id"] >= 0

    # delete + get → 400 on the gone task
    st, r = _post(base, "delete", {"task_id": "tA"})
    assert st == 200 and tm.get("tA") is None
    st, r = _post(base, "get", {"task_id": "tA"})
    assert st == 400

    # protocol errors: unknown verb, wrong path
    st, r = _post(base, "frobnicate")
    assert st == 400 and "request_type" in r["message"]
    req = urllib.request.Request(f"{base}/nope", data=b"{}")
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req)
    assert ei.value.code == 404

    # GET /cdc/list read-only mirror
    with urllib.request.urlopen(f"{base}/cdc/list") as resp:
        assert json.loads(resp.read())["data"] == []
