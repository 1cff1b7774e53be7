"""Event filters — the projection/filter analogs (SURVEY.md §2.3).

All pure Catalyst predicates: they push down to the parquet scan of the
event log, so unsupported types and out-of-scope repos never leave the
row-group reader.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from milvus_cdc_spark.sources.event_log import DDL_TYPES, DML_TYPES


def supported_dml(events: DataFrame) -> DataFrame:
    """Msg-type filter: keep DML the sink understands — the analog of
    ``isSupportedMsgType`` (``replicate_channel_manager.go:1442-1448``).
    Unknown/heartbeat types are dropped, exactly as the reference drops
    TimeTick and unknown msgs (``:1537-1545``)."""
    return events.filter(F.col("event_type").isin(*DML_TYPES))


def ddl_events(events: DataFrame) -> DataFrame:
    """Schema/DDL events (the replicate-channel analog)."""
    return events.filter(F.col("event_type").isin(*DDL_TYPES))


def scope_filter(
    events: DataFrame,
    repo_pattern: str | None = None,
    exclude_repos: list[str] | None = None,
) -> DataFrame:
    """Collection-scope filter: watch ``*`` or a pattern, minus an exclude
    list — the analog of ``GetShouldReadFunc`` / ``MatchCollection``
    (``server/cdc_impl.go:1591-1661``). DDL rows (null repo) pass."""
    out = events
    if repo_pattern and repo_pattern != "*":
        out = out.filter(F.col("repo").isNull() | F.col("repo").rlike(repo_pattern))
    if exclude_repos:
        out = out.filter(F.col("repo").isNull() | ~F.col("repo").isin(*exclude_repos))
    return out
