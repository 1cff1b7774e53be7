"""Change-feed sink (K3 analog) + CLI (task-API surface) tests."""

import json
import os
import subprocess
import sys

from pyspark.sql import functions as F

from milvus_cdc_spark.sources.changefeed import changefeed_records, write_changefeed
from milvus_cdc_spark.sources.event_log import generate_events, write_event_log

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_changefeed_records_shape_and_order(spark, tmp_base):
    ev = generate_events(spark, 500, num_keys=50)
    recs = changefeed_records(ev)
    assert recs.columns == ["partition_id", "event_seq", "key", "value"]
    row = recs.orderBy("event_seq").first()
    payload = json.loads(row["value"])
    assert payload["event_seq"] == row["event_seq"]
    assert row["key"] == f"{payload['repo']}/{payload['path']}"

    topic = os.path.join(tmp_base, "topic")
    write_changefeed(ev, topic)
    write_changefeed(ev, topic)  # append semantics, like producing twice
    back = spark.read.json(topic)
    assert back.count() == 2 * ev.filter(
        F.col("event_type").isin("insert", "update", "delete")
    ).count()
    # per-partition dirs exist (topic-partition analog)
    assert any(d.startswith("partition_id=") for d in os.listdir(topic))


def _cli(*args):
    out = subprocess.run(
        [sys.executable, "-m", "milvus_cdc_spark", *args],
        capture_output=True, text=True, timeout=300, cwd=REPO,
        env={**os.environ, "SPARK_GRAFT_MASTER": "local[4]"},
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return json.loads(out.stdout.strip().splitlines()[-1])


def test_cli_lifecycle(spark, tmp_base):
    log = os.path.join(tmp_base, "log")
    write_event_log(generate_events(spark, 600, num_keys=60), log)
    meta = os.path.join(tmp_base, "meta")
    tbl = os.path.join(tmp_base, "tbl")

    created = _cli("create", "--meta", meta, "--task", "t1", "--log", log,
                   "--table", tbl, "--batch-size", "300", "--num-buckets", "4")
    assert created["state"] == "initial"
    ran = _cli("run", "--meta", meta, "--task", "t1", "--until", "599")
    assert ran["final_offset"] == 599
    pos = _cli("position", "--meta", meta, "--task", "t1")
    assert pos["global_offset"] == 599
    _cli("pause", "--meta", meta, "--task", "t1")
    assert _cli("get", "--meta", meta, "--task", "t1")["state"] == "paused"
    _cli("resume", "--meta", meta, "--task", "t1")
    listed = _cli("list", "--meta", meta)
    assert [t["task_id"] for t in listed] == ["t1"]
    comp = _cli("compact", "--table", tbl)
    assert comp["snapshot_id"] >= 1
    _cli("delete", "--meta", meta, "--task", "t1")
    assert _cli("get", "--meta", meta, "--task", "t1") is None


def test_kafka_swap_point_gated(spark):
    """No Kafka jars ship in this image: the real source/sink factories
    must refuse with the exact spark-submit instruction instead of
    failing deep inside py4j."""
    import pytest

    from milvus_cdc_spark.sources.changefeed import (
        kafka_available,
        kafka_sink_writer,
        kafka_stream_source,
    )
    from milvus_cdc_spark.sources.event_log import generate_events

    assert kafka_available(spark) is False
    with pytest.raises(RuntimeError, match="--packages"):
        kafka_sink_writer(generate_events(spark, 10, num_keys=5), "b:9092", "t")
    with pytest.raises(RuntimeError, match="Kafka connector"):
        kafka_stream_source(spark, "b:9092", "t")
