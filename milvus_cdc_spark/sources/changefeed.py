"""Change-feed sink — the Kafka-downstream analog (K3).

The reference can write each replicated op as JSON records onto a Kafka
topic instead of a target Milvus (``core/writer/kafka_handler.go``,
``kafka_formatter.go:27-89``: ``{name, type, value}`` records). No Kafka
broker/jars exist in this image, so the equivalent downstream is a
partitioned JSON-lines directory: one "topic" directory, one
subdirectory per log partition (the topic-partition analog), records
ordered by event_seq within a file, append-only per batch. A real Kafka
sink is the same ``df.write`` with ``format("kafka")`` + these columns
mapped to key/value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from milvus_cdc_spark.sources.event_log import DML_TYPES


def changefeed_records(events: DataFrame) -> DataFrame:
    """Format events as (key, value) records — the Kafka message shape.

    key = business key (partition routing on the broker side);
    value = the full event as a JSON string.
    """
    dml = events.filter(F.col("event_type").isin(*DML_TYPES))
    return dml.select(
        F.col("partition_id"),
        F.col("event_seq"),
        F.concat_ws("/", "repo", "path").alias("key"),
        F.to_json(
            F.struct(
                "event_seq", "event_type", "repo", "path", "commit", "lang",
                "content", "event_ts",
            )
        ).alias("value"),
    )


def write_changefeed(events: DataFrame, topic_dir: str) -> None:
    """Append one batch of records to the topic directory, one dir per
    source partition, ordered by event_seq within files."""
    (
        changefeed_records(events)
        .repartition(F.col("partition_id"))
        .sortWithinPartitions("event_seq")
        .select("partition_id", "key", "value")
        .write.partitionBy("partition_id")
        .mode("append")
        .json(topic_dir)
    )


def kafka_available(spark) -> bool:
    """True iff the spark-sql-kafka connector jars are on the session's
    classpath (they do not ship in this image)."""
    try:
        spark.read.format("kafka").option("kafka.bootstrap.servers", "x") \
            .option("subscribe", "x").load()
        return True
    except Exception as e:
        # "Failed to find data source: kafka" ⇒ jars absent; any OTHER
        # failure (e.g. broker unreachable) means the connector exists
        return "failed to find data source" not in str(e).lower()


def kafka_sink_writer(events: DataFrame, bootstrap_servers: str, topic: str):
    """The real K3 sink, identical dataflow to :func:`write_changefeed`:
    returns a configured DataFrameWriter — ``.save()`` publishes the
    batch. Requires the spark-sql-kafka connector on the classpath
    (``spark-submit --packages org.apache.spark:spark-sql-kafka-0-10_2.13:<ver>``);
    raises RuntimeError with that instruction when it is absent, so the
    swap point is one import away, not a rewrite.
    """
    if not kafka_available(events.sparkSession):
        raise RuntimeError(
            "Kafka connector not on classpath — run via spark-submit "
            "--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version> "
            "(the JSON-dir changefeed sink carries the same record shape meanwhile)"
        )
    return (
        changefeed_records(events)
        .select(F.col("key").cast("binary"), F.col("value").cast("binary"))
        .write.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
    )


def kafka_stream_source(spark, bootstrap_servers: str, topic: str):
    """The real S1 source: a readStream over the topic, decoded to the
    engine's EVENT_SCHEMA (value = JSON event, as produced by
    :func:`changefeed_records`). Same availability gate as the sink."""
    if not kafka_available(spark):
        raise RuntimeError(
            "Kafka connector not on classpath — use the parquet/file "
            "stream sources in this image (see kafka_sink_writer)"
        )
    from milvus_cdc_spark.sources.event_log import EVENT_SCHEMA

    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .load()
    )
    return raw.select(
        F.from_json(F.col("value").cast("string"), EVENT_SCHEMA).alias("e")
    ).select("e.*")
