"""Physical-plan assertions: the scale claims, pinned by tests.

These read `.explain`/executedPlan output and assert the properties the
100 TB design depends on — if a refactor silently adds a shuffle or
breaks scan pushdown, these fail before any benchmark notices.
"""

import os
import re

from pyspark.sql import functions as F

from milvus_cdc_spark.operators.dedup import lww_dedup
from milvus_cdc_spark.plans.apply import ReplicateJob, parquet_source
from milvus_cdc_spark.plans.metastore import Metastore
from milvus_cdc_spark.sources.event_log import generate_events, write_event_log


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_range_predicate_pushed_to_parquet_scan(spark, tmp_base):
    """The seek: offset-range filter must reach the scan (row-group
    pruning via min/max stats), not run post-scan only."""
    log = os.path.join(tmp_base, "log")
    write_event_log(generate_events(spark, 2000, num_keys=200), log)
    df = parquet_source(log)(spark, 500, 1000)
    plan = df._jdf.queryExecution().sparkPlan().toString()
    m = re.search(r"PushedFilters: \[(.*?)\]", plan)
    assert m, plan
    assert "GreaterThan(event_seq,500)" in m.group(1)
    assert "LessThanOrEqual(event_seq,1000)" in m.group(1)


def test_column_pruning_reaches_scan(spark, tmp_base):
    """A 2-column projection must read a 2-column schema."""
    log = os.path.join(tmp_base, "log")
    write_event_log(generate_events(spark, 1000, num_keys=100), log)
    df = spark.read.parquet(log).select("event_seq", "event_type")
    plan = df._jdf.queryExecution().sparkPlan().toString()
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    cols = {c.split(":")[0] for c in m.group(1).split(",")}
    assert cols == {"event_seq", "event_type"}


def test_dedup_agg_has_map_side_partial(spark):
    """The LWW agg must keep a PARTIAL aggregate on the map side — the
    property that collapses hot-key duplicates before the shuffle (skew
    defense). Note: max_by over a string-struct payload plans as
    SortAggregate (its buffer isn't hash-agg mutable); that's fine —
    the sort is within already-clustered partitions and spillable. What
    must never regress is the partial/final split."""
    ev = generate_events(spark, 10_000, num_keys=2_000)
    plan = _plan(lww_dedup(ev, ["repo", "path"]))
    assert "partial_max_by" in plan


def test_dedup_single_exchange_and_map_side_combine(spark):
    """One shuffle: explicit repartition(n, keys) satisfies the groupBy's
    clustering, so no second Exchange; partial_max_by before the exchange
    is the map-side combine that defeats hot-key skew."""
    ev = generate_events(spark, 10_000, num_keys=2_000)
    plan = _plan(lww_dedup(ev, ["repo", "path"], num_partitions=16))
    assert plan.count("Exchange") == 1
    assert "partial_max_by" in plan


def test_mor_merge_plan_has_single_shuffle(spark, tmp_base):
    """The whole hot path (dedup + sha256 + delta write) = ONE exchange,
    and with the default builtin hasher the plan is entirely JVM-side —
    no Python eval node of any kind (sha2 runs inside whole-stage
    codegen; the r5 fixed-cost work). The pandas hasher stays available
    (hash_impl="pandas"): vectorized ArrowEvalPython, same single
    exchange, and row-at-a-time BatchEvalPython never appears on either.

    Captured by building the exact changes plan the merge writes."""
    log = os.path.join(tmp_base, "log")
    write_event_log(generate_events(spark, 3000, num_keys=300), log)
    job = ReplicateJob(
        spark=spark, source=parquet_source(log),
        table_root=os.path.join(tmp_base, "tbl"),
        metastore=Metastore(os.path.join(tmp_base, "meta")),
        num_buckets=8,
    )
    job.table()
    dml = parquet_source(log)(spark, -1, 2999).filter(
        F.col("event_type").isin("insert", "update", "delete")
    )
    plan = _plan(job._build_changes(dml))
    assert plan.count("Exchange") == 1, plan
    assert "EvalPython" not in plan, plan  # default path: zero Python
    assert "sha2" in plan

    job_pd = ReplicateJob(
        spark=spark, source=parquet_source(log),
        table_root=os.path.join(tmp_base, "tbl"),
        metastore=Metastore(os.path.join(tmp_base, "meta")),
        num_buckets=8, hash_impl="pandas",
    )
    plan_pd = _plan(job_pd._build_changes(dml))
    assert plan_pd.count("Exchange") == 1, plan_pd
    assert "ArrowEvalPython" in plan_pd  # the vectorized sha256 UDF
    assert "BatchEvalPython" not in plan_pd


def test_scope_filter_pushes_into_scan(spark, tmp_base):
    log = os.path.join(tmp_base, "log")
    write_event_log(generate_events(spark, 1000, num_keys=100), log)
    from milvus_cdc_spark.operators.filters import supported_dml

    df = supported_dml(spark.read.parquet(log))
    plan = df._jdf.queryExecution().sparkPlan().toString()
    assert re.search(r"PushedFilters: \[In\(event_type", plan), plan


def test_broadcast_join_for_small_dims(spark, tmp_base):
    """Catalyst must broadcast a small dimension against the big log —
    the T5 dropped-tables anti-join shape."""
    log = os.path.join(tmp_base, "log")
    write_event_log(generate_events(spark, 5000, num_keys=500), log)
    big = spark.read.parquet(log)
    dropped = spark.createDataFrame([("org0/repo0",)], "repo string")
    joined = big.join(dropped, on="repo", how="left_anti")
    # AQE decides at runtime; .count() would build a different query —
    # execute THIS plan, then inspect its final adaptive form
    joined.collect()
    plan = _plan(joined)
    assert "isFinalPlan=true" in plan
    assert "BroadcastHashJoin" in plan, plan


def _docs(spark):
    rows = [(i, f"the quick brown fox {i} jumps over the lazy dog " * 3) for i in range(50)]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_minhash_signatures_shuffle_free(spark):
    """The signature is a pure projection: each mh_i is an
    array_min(transform(...md5...)) computed INSIDE the row — no
    explode, no Exchange, and no SortAggregate (min over strings has a
    var-length buffer, so the former explode→groupBy(min) form could
    not hash-aggregate and sorted the exploded corpus twice). r06."""
    from milvus_cdc_spark.operators.dedup_text import minhash_signatures

    plan = _plan(minhash_signatures(_docs(spark), "doc_id", "text", num_hashes=8))
    assert plan.count("Exchange") == 0, plan
    assert "SortAggregate" not in plan, plan
    assert "array_min" in plan, plan


def test_word_shingles_distinct_is_shuffle_free(spark):
    """Per-doc shingle dedup is array_distinct before the explode — a
    pure projection, zero Exchange."""
    from milvus_cdc_spark.operators.dedup_text import word_shingles

    plan = _plan(word_shingles(_docs(spark), "doc_id", "text"))
    assert "Exchange" not in plan, plan


def test_doc_fingerprint_is_shuffle_free(spark):
    """Winnowing window-minima via array HOFs: the whole fingerprint is
    a projection — no posexplode + window-by-doc exchange."""
    from milvus_cdc_spark.operators.text import doc_fingerprint

    plan = _plan(doc_fingerprint(_docs(spark), "doc_id", "text"))
    assert "Exchange" not in plan, plan
    assert "Window" not in plan, plan


def test_word_shingles_no_inferred_filter_reexpansion(spark):
    """Regression: exploding a STAGED shingle column lets the optimizer's
    InferFiltersFromGenerate add a size()>0 filter that predicate
    pushdown re-expands below the projection — the whole split→transform
    tree inline, re-evaluated per lambda element (measured 10×). The
    generator child must stay an expression; the optimized plan then
    contains exactly ONE split()."""
    from milvus_cdc_spark.operators.dedup_text import word_shingles

    plan = _optimized(word_shingles(_docs(spark), "doc_id", "text", distinct=False))
    assert plan.count("split(") == 1, plan


def test_jaccard_single_tokenization_tree(spark):
    """VERDICT r3 #6: ngram_jaccard_pairs must tokenize the corpus ONCE
    per join side — the exploded shingles and the per-doc set sizes come
    from one projection (size rides the exploded rows), so the optimized
    plan holds exactly one split() tree per self-join side and exactly
    two joins (pairs⋈a, ⋈b) — no extra size-joins."""
    from milvus_cdc_spark.operators.dedup_text import ngram_jaccard_pairs

    docs = spark.createDataFrame(
        [(1, "a b c d"), (2, "b c d e"), (3, "x y z w")], "doc_id int, text string"
    )
    pairs = spark.createDataFrame([(1, 2), (1, 3)], "id_a int, id_b int")
    plan = _optimized(ngram_jaccard_pairs(docs, pairs, shingle_n=2))
    assert plan.count("split(") == 2, plan  # one tokenization per side
    assert len(re.findall(r"\bJoin\b", plan)) == 2, plan  # no size-joins


def test_neardup_scores_in_grouped_numpy_no_join(spark):
    """r06: pairwise_cosine_neardup scores pairs per (table, bucket,
    shard-pair) group inside applyInPandas — the quadratic pair stream
    never exists as JVM rows, so the optimized plan has NO join at all;
    rounding (Spark decimal HALF_UP) stays in the JVM above the Python
    node."""
    from milvus_cdc_spark.operators.similarity import pairwise_cosine_neardup

    emb = spark.createDataFrame(
        [(i, [float(i), 1.0, 0.5]) for i in range(6)],
        "vec_id int, embedding array<float>",
    )
    plan = _optimized(pairwise_cosine_neardup(emb, n_planes=2, n_tables=1))
    assert "Join" not in plan, plan
    assert "FlatMapGroupsInPandas" in plan, plan
    assert "round(" in plan, plan


def test_neardup_bit_identical_to_jvm_join(spark):
    """The numpy scorer reproduces the former JVM bucketed self-join
    BIT-for-bit: same fold order per dim, same casts, same rounding —
    pinned here by recomputing the reference result with the original
    zip_with/aggregate formulation over every same-bucket pair."""
    import math
    import random

    from pyspark.sql import functions as F

    from milvus_cdc_spark.operators.similarity import (
        _dot,
        _norm,
        make_planes,
        pairwise_cosine_neardup,
        srp_bucket,
    )

    rng = random.Random(7)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(120)
    ]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    got = {
        (r.id_a, r.id_b): r.cosine
        for r in pairwise_cosine_neardup(
            emb, threshold=0.1, n_planes=2, seed=11, n_tables=2, n_shards=3
        ).collect()
    }

    def jvm_table(t):
        planes = make_planes(8, 2, seed=11 + t)
        b = emb.select(
            F.col("vec_id"),
            F.col("embedding"),
            srp_bucket(F.col("embedding"), planes).alias("__bucket"),
            _norm(F.col("embedding")).alias("__norm"),
        )
        left = b.select(
            F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"),
            F.col("__norm").alias("na"), "__bucket",
        )
        right = b.select(
            F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"),
            F.col("__norm").alias("nb"), "__bucket",
        )
        return (
            left.join(right, "__bucket")
            .filter(F.col("id_a") < F.col("id_b"))
            .withColumn(
                "cosine",
                F.round(_dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6),
            )
            .filter(F.col("cosine") >= 0.1)
            .select("id_a", "id_b", "cosine")
        )

    ref_df = jvm_table(0).unionByName(jvm_table(1)).distinct()
    ref = {(r.id_a, r.id_b): r.cosine for r in ref_df.collect()}
    assert got.keys() == ref.keys()
    for k in ref:
        # exact double equality — not a tolerance check
        assert math.isclose(got[k], ref[k], rel_tol=0, abs_tol=0), (k, got[k], ref[k])
