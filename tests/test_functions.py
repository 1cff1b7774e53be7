"""Vectorized UDF tests: the pandas sha256 UDF can never drift from the
JVM-side sha2 builtin (cross-check mandated by SURVEY.md §2.8)."""

from pyspark.sql import functions as F

from milvus_cdc_spark.functions.hashing import (
    content_sha256,
    normalize_content,
    stable_bucket,
)


def test_sha256_udf_matches_builtin_sha2(spark):
    df = spark.range(500).select(
        F.concat(F.lit("content-"), F.col("id"), F.lit(" é中")).alias("c")
    )
    bad = df.select(
        (content_sha256(F.col("c")) == F.sha2(F.col("c"), 256)).alias("ok")
    ).filter(~F.col("ok"))
    assert bad.count() == 0


def test_sha256_null_safe(spark):
    df = spark.createDataFrame([(None,), ("x",)], "c string")
    got = [r[0] for r in df.select(content_sha256("c")).collect()]
    assert got[0] is None and got[1] is not None


def test_normalize_content(spark):
    df = spark.createDataFrame([("a \r\nb\t \rc  ",)], "c string")
    assert df.select(normalize_content("c")).collect()[0][0] == "a\nb\nc"


def test_stable_bucket_deterministic_and_bounded(spark):
    df = spark.range(1000).select(
        F.concat(F.lit("r"), F.col("id") % 37).alias("repo"),
        F.col("id").cast("string").alias("path"),
    )
    b = df.select(stable_bucket(F.col("repo"), F.col("path"), 16).alias("b"))
    mn, mx = b.agg(F.min("b"), F.max("b")).collect()[0]
    assert 0 <= mn and mx <= 15
    # stable across evaluations
    a1 = sorted(r["b"] for r in b.collect())
    a2 = sorted(r["b"] for r in b.collect())
    assert a1 == a2


def test_frame_sample_counts(spark):
    """ceil(len/N) frames capped at max_frames; NULL/empty payloads give
    ZERO frames (least() skips nulls — unguarded, a missing payload
    emitted the full cap of phantom frames)."""
    from milvus_cdc_spark.operators.multimodal import frame_sample

    rows = [
        (1, bytearray(b"x" * 64)),    # exactly one frame at N=64
        (2, bytearray(b"x" * 65)),    # two frames
        (3, bytearray(b"x" * 1000)),  # capped at max_frames
        (4, None),                    # zero frames
        (5, bytearray(b"")),          # zero frames
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = (
        frame_sample(df, every_n_bytes=64, max_frames=8)
        .groupBy("media_id").count().collect()
    )
    counts = {r["media_id"]: r["count"] for r in got}
    assert counts == {1: 1, 2: 2, 3: 8}


def test_extract_features_validates_dim(spark):
    import pytest

    from milvus_cdc_spark.operators.multimodal import extract_features

    df = spark.createDataFrame([(1, "blob", bytearray(b"x"))],
                               "media_id long, kind string, payload binary")
    with pytest.raises(ValueError, match="1..32"):
        extract_features(df, feature_dim=64)
