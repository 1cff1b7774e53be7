"""milvus_cdc_spark — a PySpark-native CDC / incremental-ingest engine.

A from-scratch reimplementation of the *capabilities* of SimFG/milvus-cdc
(reference at /root/reference, Go) on idiomatic PySpark:

- tail an ordered, partitioned change-event log (the analog of Milvus MQ
  pchannels, ``core/msgdispatcher/dispatcher.go``),
- window-over-event-sequence dedup with last-writer-wins resolution (the
  analog of per-pack sorting + per-channel serialization,
  ``core/reader/replicate_channel_manager.go:1451-1454`` and
  ``core/writer/replicate_message_manager.go:84-109``),
- key-partitioned MERGE INTO a snapshot-committed lake table ("icebox",
  our stand-in for Iceberg: no Iceberg jars ship in this image),
- schema-evolution events applied transactionally before the data batch
  that needs them (analog of the replicate API-event channel,
  ``server/cdc_impl.go:990-1068``),
- per-partition position checkpoints, per-batch lineage + metrics
  (analog of ``server/writer_callback.go`` and ``server/metrics/metrics.go``).

Everything here derives from public knowledge only: the Apache Spark /
PySpark API and the reference repo's observable behavior.
"""

__version__ = "0.1.0"

from milvus_cdc_spark.session import get_spark  # noqa: F401
