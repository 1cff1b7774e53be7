"""Structured Streaming front-end."""

from milvus_cdc_spark.streaming.runner import StreamingReplicator  # noqa: F401
