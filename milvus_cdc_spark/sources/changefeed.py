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
