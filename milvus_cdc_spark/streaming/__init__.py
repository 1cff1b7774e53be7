"""Structured Streaming front-end."""

from milvus_cdc_spark.streaming.runner import StreamingReplicator  # noqa: F401
from milvus_cdc_spark.streaming.sessionize import sessionize_stream  # noqa: F401
