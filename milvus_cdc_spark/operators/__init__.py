"""Dataflow + data-pipeline operators."""

from milvus_cdc_spark.operators.asof import asof_join, range_join  # noqa: F401
from milvus_cdc_spark.operators.dedup import lww_dedup  # noqa: F401
from milvus_cdc_spark.operators.filters import (  # noqa: F401
    scope_filter,
    supported_dml,
)
from milvus_cdc_spark.operators.salting import salted_repartition  # noqa: F401
