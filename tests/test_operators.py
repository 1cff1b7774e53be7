"""Unit tests for the dataflow operators (SURVEY.md §2.3/§2.4 analogs)."""

from pyspark.sql import functions as F

from milvus_cdc_spark.operators.dedup import lww_dedup
from milvus_cdc_spark.operators.filters import ddl_events, scope_filter, supported_dml
from milvus_cdc_spark.operators.salting import salted_repartition

EV = (
    "partition_id int, event_seq long, event_type string, repo string, "
    "path string, commit string, lang string, content string, "
    "schema_change string, event_ts timestamp"
)


def _df(spark, rows):
    return spark.createDataFrame(rows, EV)


def test_lww_dedup_keeps_max_seq(spark):
    df = _df(
        spark,
        [
            (0, 1, "insert", "r", "p", "c1", "py", "v1", None, None),
            (0, 5, "update", "r", "p", "c5", "py", "v5", None, None),
            (0, 3, "update", "r", "p", "c3", "py", "v3", None, None),
            (0, 2, "insert", "r2", "p", "c2", "go", "v2", None, None),
        ],
    )
    out = {(r["repo"], r["path"]): (r["event_seq"], r["__deleted"])
           for r in lww_dedup(df, ["repo", "path"]).collect()}
    assert out == {("r", "p"): (5, False), ("r2", "p"): (2, False)}


def test_lww_dedup_delete_wins_when_last(spark):
    df = _df(
        spark,
        [
            (0, 1, "insert", "r", "p", "c1", "py", "v1", None, None),
            (0, 9, "delete", "r", "p", None, "py", None, None, None),
        ],
    )
    out = lww_dedup(df, ["repo", "path"]).collect()
    assert len(out) == 1 and out[0]["__deleted"] is True


def test_lww_tie_break_prefers_non_delete(spark):
    """At equal seq the reference applies Delete first, Insert after →
    insert wins (replicate_channel_manager.go:1451-1454)."""
    df = _df(
        spark,
        [
            (0, 7, "delete", "r", "p", None, "py", None, None, None),
            (0, 7, "insert", "r", "p", "c7", "py", "v7", None, None),
        ],
    )
    out = lww_dedup(df, ["repo", "path"]).collect()
    assert len(out) == 1 and out[0]["__deleted"] is False


def test_type_and_scope_filters(spark):
    df = _df(
        spark,
        [
            (0, 1, "insert", "org1/a", "p", "c", "py", "v", None, None),
            (0, 2, "heartbeat", None, None, None, None, None, None, None),
            (0, 3, "add_column", None, None, None, None, None, '{"name":"x"}', None),
            (0, 4, "delete", "org2/b", "p", None, "py", None, None, None),
        ],
    )
    assert {r["event_seq"] for r in supported_dml(df).collect()} == {1, 4}
    assert {r["event_seq"] for r in ddl_events(df).collect()} == {3}
    scoped = scope_filter(df, repo_pattern="^org1/")
    # DDL (null repo) passes; org2 filtered
    assert {r["event_seq"] for r in scoped.collect()} == {1, 2, 3}
    excl = scope_filter(df, exclude_repos=["org1/a"])
    assert {r["event_seq"] for r in excl.collect()} == {2, 3, 4}


def test_salted_repartition_preserves_rows_and_spreads(spark):
    rows = [(0, i, "insert", "hot/repo", f"p{i}", "c", "py", "v", None, None) for i in range(400)]
    df = _df(spark, rows)
    out = salted_repartition(df, "repo", 8, salt_factor=8)
    assert out.count() == 400
    assert "__salt" not in out.columns
    # one hot repo must land on >1 partition post-salt
    parts = (
        out.withColumn("pid", F.spark_partition_id())
        .select("pid").distinct().count()
    )
    assert parts > 1


def test_ann_bucketed_layout_prunes_files(spark, tmp_base):
    """write_bucketed + probe filter = PARTITION pruning: the scan lists
    only the probed __bucket= dirs — I/O is (1+n)/2^n of the corpus, not
    a full scan with post-filter."""
    import os

    from milvus_cdc_spark.operators.similarity import (
        ann_lsh_topk,
        ann_lsh_topk_bucketed,
        make_planes,
        probe_buckets,
        write_bucketed,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    dim = len(emb.select("embedding").first()[0])
    planes = make_planes(dim, 6, seed=42)
    qvec = [((i * 2654435761) % 1000) / 1000.0 - 0.5 for i in range(dim)]
    root = os.path.join(tmp_base, "emb_bucketed")
    write_bucketed(emb, root, planes)

    topk = ann_lsh_topk_bucketed(spark, root, qvec, planes, k=5)
    probes = set(probe_buckets(qvec, planes, hamming=1))
    plan = topk._jdf.queryExecution().sparkPlan().toString()
    import re

    m = re.search(r"PartitionFilters: \[[^\]]*IN \(([\d,]+)\)", plan)
    assert m, plan  # the probe filter reached the scan as a PARTITION filter
    assert {int(x) for x in m.group(1).split(",")} <= probes
    all_buckets = {
        int(d.split("=")[1]) for d in os.listdir(root) if d.startswith("__bucket=")
    }
    assert len(all_buckets) > len(probes)  # pruning is real, not vacuous

    # bucketed result == in-memory LSH result (same probe semantics)
    flat = ann_lsh_topk(emb, qvec, k=5, n_planes=6, seed=42, probe_hamming=1)
    assert sorted(map(tuple, topk.collect())) == sorted(map(tuple, flat.collect()))


def _ts(s):
    import datetime

    return datetime.datetime.fromisoformat(s)


def test_asof_join_semantics(spark):
    from milvus_cdc_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 10, _ts("2024-01-01 00:10:00")),
         (2, 10, _ts("2024-01-01 00:30:00")),
         (3, 10, _ts("2024-01-01 00:05:00")),   # before any right row
         (4, 20, _ts("2024-01-01 01:00:00"))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(10, _ts("2024-01-01 00:10:00"), 1.0),   # equal ts: inclusive match
         (10, _ts("2024-01-01 00:20:00"), 2.0),
         (20, _ts("2024-01-01 00:59:00"), 9.0)],
        "user_id long, ts timestamp, pvalue double",
    )
    got = {
        r["event_id"]: r["pvalue_asof"]
        for r in asof_join(left, right, ["user_id"], "ts", "ts", ["pvalue"]).collect()
    }
    assert got == {1: 1.0, 2: 2.0, 4: 9.0}  # 3 dropped (inner, no prior row)
    kept = asof_join(left, right, ["user_id"], "ts", "ts", ["pvalue"], how="left")
    assert {r["event_id"]: r["pvalue_asof"] for r in kept.collect()}[3] is None


def test_asof_join_single_shuffle_no_theta(spark):
    """The tag/union/window shape: ONE exchange (the key window), never a
    BroadcastNestedLoopJoin / cartesian."""
    from milvus_cdc_spark.operators.asof import asof_join

    left = spark.range(100).selectExpr(
        "id as event_id", "id % 5 as user_id",
        "timestamp_seconds(1700000000 + id * 60) as ts",
    )
    right = spark.range(20).selectExpr(
        "id % 5 as user_id",
        "timestamp_seconds(1700000000 + id * 300) as ts",
        "cast(id as double) as pvalue",
    )
    plan = asof_join(left, right, ["user_id"], "ts", "ts", ["pvalue"])._jdf \
        .queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
    assert "BroadcastNestedLoop" not in plan and "Cartesian" not in plan


def test_range_join_semantics_and_plan(spark):
    from milvus_cdc_spark.operators.asof import range_join

    left = spark.createDataFrame(
        [(1, 10, _ts("2024-01-01 00:00:00")),   # == start: included
         (2, 10, _ts("2024-01-01 00:29:59")),   # inside
         (3, 10, _ts("2024-01-01 00:30:00")),   # == end: excluded
         (4, 20, _ts("2024-01-01 00:10:00"))],  # wrong key
        "click_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(100, 10, _ts("2024-01-01 00:00:00"), _ts("2024-01-01 00:30:00"))],
        "window_id long, user_id long, w_start timestamp, w_end timestamp",
    )
    rj = range_join(left, right, ["user_id"], "ts", "w_start", "w_end", bin_seconds=600)
    assert sorted(r["click_id"] for r in rj.collect()) == [1, 2]
    plan = rj._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoop" not in plan and "Cartesian" not in plan


def test_asof_join_ignores_null_right_ts(spark):
    """A right row with NULL ts can never be an as-of match — without
    the guard its payload leaks into pre-first-match left rows (nulls
    sort first in the window) while asof_ts stays null."""
    from milvus_cdc_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 10, _ts("2024-01-01 00:05:00"))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(10, None, 666.0)],
        "user_id long, ts timestamp, pvalue double",
    )
    rows = asof_join(left, right, ["user_id"], "ts", "ts", ["pvalue"], how="left").collect()
    assert len(rows) == 1
    assert rows[0]["pvalue_asof"] is None and rows[0]["asof_ts"] is None
    assert asof_join(left, right, ["user_id"], "ts", "ts", ["pvalue"]).count() == 0


def test_asof_join_null_payload_comes_from_matched_row(spark):
    """All attached columns must come from the SAME matched right row: a
    matched row with a NULL value in one payload column attaches that
    null — not an older row's non-null value for that column (which
    would pair payload and asof_ts from different rows)."""
    from pyspark.sql import functions as F

    from milvus_cdc_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 100, 20)], "event_id long, user_id long, t long")
    left = left.withColumn("ts", F.timestamp_seconds("t")).drop("t")
    right = spark.createDataFrame(
        [(100, 10, 7.0, "a"), (100, 15, None, "b")],
        "user_id long, t long, pvalue double, tag string",
    )
    right = right.withColumn("ts", F.timestamp_seconds("t")).drop("t")
    (row,) = asof_join(
        left, right, ["user_id"], "ts", "ts", ["pvalue", "tag"]
    ).collect()
    # matched row is t=15 (latest <= 20): tag 'b' AND its null pvalue
    assert row["tag_asof"] == "b"
    assert row["pvalue_asof"] is None
    assert int(row["asof_ts"].timestamp()) == 15


def test_ngram_jaccard_exact_values(spark):
    """Hand-computed Jaccard on word bigrams (distinct per doc)."""
    from milvus_cdc_spark.operators.dedup_text import ngram_jaccard_pairs

    docs = spark.createDataFrame(
        [
            (1, "a b c d"),       # bigrams {ab, bc, cd}
            (2, "b c d e"),       # {bc, cd, de}; ∩ with 1 = {bc, cd} → 2/4
            (3, "x y z"),         # disjoint with 1 → no output row
            (4, "a b a b"),       # {ab, ba}; ∩ with 1 = {ab} → 1/4
        ],
        "doc_id int, text string",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4)], "id_a int, id_b int"
    )
    got = {
        (r["id_a"], r["id_b"]): (r["n_inter"], r["n_a"], r["n_b"], r["jaccard"])
        for r in ngram_jaccard_pairs(docs, pairs, shingle_n=2).collect()
    }
    assert got == {(1, 2): (2, 3, 3, 0.5), (1, 4): (1, 3, 2, 0.25)}


def test_neardup_matches_bruteforce_cosine(spark):
    """Norm-precompute refactor must not change scores: every LSH pair's
    cosine equals the directly computed value."""
    import math

    from milvus_cdc_spark.operators.similarity import pairwise_cosine_neardup

    vecs = {
        i: [((i * 37 + j * 11) % 10) / 10.0 + 0.1 for j in range(4)]
        for i in range(12)
    }
    vecs[11] = [v * 1.001 for v in vecs[0]]  # a true near-dup pair
    emb = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id int, embedding array<float>"
    )
    got = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in pairwise_cosine_neardup(
            emb, threshold=0.9, n_planes=2, n_tables=2
        ).collect()
    }
    assert (0, 11) in got

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return round(d / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b))), 6)

    for (ia, ib), c in got.items():
        # float32 storage: compare at 5dp
        assert abs(c - cos([float(__import__("numpy").float32(x)) for x in vecs[ia]],
                           [float(__import__("numpy").float32(x)) for x in vecs[ib]])) < 1e-4
