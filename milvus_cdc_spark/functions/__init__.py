"""Vectorized (Arrow/pandas) scalar functions — the engine's UDF surface."""

from milvus_cdc_spark.functions.hashing import (  # noqa: F401
    bucket_expr,
    content_sha256,
    normalize_content,
    stable_bucket,
)
