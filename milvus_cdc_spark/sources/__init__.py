"""Sources & sinks: the change-event log and the icebox lake format."""

from milvus_cdc_spark.sources.event_log import (  # noqa: F401
    EVENT_SCHEMA,
    generate_events,
    read_event_range,
    write_event_log,
)
from milvus_cdc_spark.sources.icebox import IceboxTable  # noqa: F401
