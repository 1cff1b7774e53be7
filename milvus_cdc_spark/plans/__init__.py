"""Driver-side orchestration: metastore, the replication apply plan, tasks."""

from milvus_cdc_spark.plans.apply import ReplicateJob  # noqa: F401
from milvus_cdc_spark.plans.metastore import (  # noqa: F401
    InMemoryMetastore,
    JsonMetastore,
    Metastore,
    MetastoreBackend,
    SqliteMetastore,
)
from milvus_cdc_spark.plans.rollup import RollupJob  # noqa: F401
from milvus_cdc_spark.plans.task import TaskManager  # noqa: F401
