"""Multi-table routing (S2 vchannel-dispatch analog) + offline tools."""

import json
import os
import subprocess
import sys

import pytest

from milvus_cdc_spark.plans.metastore import Metastore, SqliteMetastore
from milvus_cdc_spark.plans.router import MultiTableRouter, Route
from milvus_cdc_spark.plans.apply import parquet_source
from milvus_cdc_spark.sources.event_log import generate_events, write_event_log
from milvus_cdc_spark.sources.icebox import IceboxTable
from tests.oracle import engine_hashes, expected_hashes

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_router_splits_by_scope(spark, tmp_base):
    log = os.path.join(tmp_base, "log")
    write_event_log(generate_events(spark, 3000, num_keys=300), log)
    router = MultiTableRouter(
        spark,
        parquet_source(log),
        Metastore(os.path.join(tmp_base, "meta")),
        routes=[
            Route("org0", os.path.join(tmp_base, "t0"), r"^org0/"),
            Route("rest", os.path.join(tmp_base, "t1"), r"^org[^0]/"),
        ],
        batch_size=1000,
        num_buckets=4,
    )
    router.run(until_seq=2999)
    pdf = spark.read.parquet(log).toPandas()
    exp = expected_hashes(pdf)
    exp0 = {k: v for k, v in exp.items() if k[0].startswith("org0/")}
    exp1 = {k: v for k, v in exp.items() if not k[0].startswith("org0/")}
    got0 = engine_hashes(IceboxTable(spark, os.path.join(tmp_base, "t0")).read())
    got1 = engine_hashes(IceboxTable(spark, os.path.join(tmp_base, "t1")).read())
    assert got0 == exp0 and got1 == exp1
    pos = router.positions()
    assert pos["org0"]["global_offset"] == 2999
    assert pos["rest"]["global_offset"] == 2999


def test_data_diff_and_msg_count_tools(spark, tmp_base):
    log = os.path.join(tmp_base, "log")
    write_event_log(generate_events(spark, 1500, num_keys=200), log)
    from milvus_cdc_spark.plans.apply import ReplicateJob

    job = ReplicateJob(
        spark=spark, source=parquet_source(log),
        table_root=os.path.join(tmp_base, "tbl"),
        metastore=Metastore(os.path.join(tmp_base, "meta")),
        batch_size=800, num_buckets=4,
    )
    job.run(until_seq=1499)

    env = {**os.environ, "SPARK_GRAFT_MASTER": "local[4]"}
    diff = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "data_diff.py"),
         os.path.join(tmp_base, "tbl"), "--log", log],
        capture_output=True, text=True, env=env, timeout=300,
    )
    out = json.loads(diff.stdout.strip().splitlines()[-1])
    assert out["identical"] is True and diff.returncode == 0

    cnt = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "msg_count.py"), log],
        capture_output=True, text=True, env=env, timeout=300,
    )
    out = json.loads(cnt.stdout.strip().splitlines()[-1])
    assert out["total"] == 1500
    assert sum(out["per_type"].values()) == 1500


def test_router_rejects_overlapping_literal_scopes(spark, tmp_base):
    """Literal scopes are checked for disjointness eagerly: rlike is an
    unanchored substring match, so 'org1' overlaps 'org1/repo3'."""
    import pytest

    from milvus_cdc_spark.plans.metastore import Metastore
    from milvus_cdc_spark.plans.router import MultiTableRouter, Route

    meta = Metastore(os.path.join(tmp_base, "meta"))
    with pytest.raises(ValueError, match="overlapping"):
        MultiTableRouter(
            spark, None, meta,
            [Route("a", os.path.join(tmp_base, "ta"), "org1"),
             Route("b", os.path.join(tmp_base, "tb"), "org1/repo3")],
        )
    # match-all overlaps everything
    with pytest.raises(ValueError, match="overlapping"):
        MultiTableRouter(
            spark, None, meta,
            [Route("a", os.path.join(tmp_base, "ta"), "*"),
             Route("b", os.path.join(tmp_base, "tb"), "org1")],
        )
    # regex scopes stay the operator's responsibility (no false positive)
    MultiTableRouter(
        spark, None, meta,
        [Route("a", os.path.join(tmp_base, "ta"), r"^org0/"),
         Route("b", os.path.join(tmp_base, "tb"), r"^org[^0]/")],
    )


def test_name_remap_replicates_into_renamed_target(spark, tmp_base):
    """T3 second half: source→target repo rename on the way through
    (channel_writer.go:1208-1232 analog) — full-state equality against
    the renamed oracle, and the remap adds NO exchange (literal-map
    projection)."""
    from milvus_cdc_spark.plans.apply import ReplicateJob, parquet_source
    from milvus_cdc_spark.plans.metastore import Metastore
    from milvus_cdc_spark.sources.event_log import generate_events, write_event_log
    from tests.oracle import engine_hashes, expected_hashes

    log = os.path.join(tmp_base, "log")
    write_event_log(generate_events(spark, 2000, num_keys=300), log)
    src_repos = [
        r[0] for r in spark.read.parquet(log)
        .filter("repo rlike '^org1/'").select("repo").distinct().collect()
    ]
    name_map = {r: "mirror/" + r.split("/", 1)[1] for r in src_repos}
    job = ReplicateJob(
        spark=spark,
        source=parquet_source(log),
        table_root=os.path.join(tmp_base, "tbl"),
        metastore=Metastore(os.path.join(tmp_base, "meta")),
        num_buckets=4,
        repo_pattern=r"^org1/",
        name_map=name_map,
    )
    job.run(until_seq=1999)
    pdf = spark.read.parquet(log).filter("repo rlike '^org1/'").toPandas()
    pdf["repo"] = pdf["repo"].map(name_map)
    assert engine_hashes(job.table().read()) == expected_hashes(pdf)
    got_repos = {r["repo"] for r in job.table().read().select("repo").distinct().collect()}
    # only renamed targets appear (repos whose keys all ended deleted are absent)
    assert got_repos and got_repos <= set(name_map.values())
    # remap must not add a shuffle to the hot path
    from pyspark.sql import functions as F

    dml = spark.read.parquet(log).filter(
        F.col("event_type").isin("insert", "update", "delete")
        & F.col("repo").rlike("^org1/")
    )
    plan = job._build_changes(dml)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan


def test_router_star_pattern_not_misread_as_literal(spark, tmp_base):
    """'org1*' contains a regex metacharacter ('*' = zero-or-more of the
    previous atom, NOT a glob) — it must be excluded from the literal
    check rather than misclassified as the literal string 'org1*', which
    would let genuinely-overlapping scopes pass validation."""
    from milvus_cdc_spark.plans.metastore import Metastore
    from milvus_cdc_spark.plans.router import MultiTableRouter, Route

    meta = Metastore(os.path.join(tmp_base, "meta2"))
    # regex scope: operator's responsibility, constructor must accept
    MultiTableRouter(
        spark, None, meta,
        [Route("a", os.path.join(tmp_base, "t2a"), "org1*"),
         Route("b", os.path.join(tmp_base, "t2b"), "org1")],
    )


def test_anchored_exact_scopes_fully_decidable(spark, tmp_base):
    """Anchored-exact scopes are the decidable class: equal names clash,
    different names pass even when one contains the other as a substring
    (unanchored, those WOULD be rejected)."""
    import pytest

    from milvus_cdc_spark.plans.metastore import Metastore
    from milvus_cdc_spark.plans.router import MultiTableRouter, Route

    ms = Metastore(os.path.join(tmp_base, "meta_anchor"))

    def mk(routes):
        return MultiTableRouter(
            spark, None, ms,
            [Route(f"r{i}", os.path.join(tmp_base, f"t_anchor{i}"), p)
             for i, p in enumerate(routes)],
        )

    # exact vs exact, different names — OK even with substring relation
    mk(["^org1/repo5$", "^org1/repo55$"])
    # exact vs exact, equal — clash
    with pytest.raises(ValueError, match="overlapping"):
        mk(["^org1/repo5$", "^org1/repo5$"])
    # exact vs substring occurring in the exact name — clash
    with pytest.raises(ValueError, match="overlapping"):
        mk(["^org1/repo5$", "repo5"])
    # exact vs substring NOT occurring in it — OK (decidable disjoint)
    mk(["^org1/repo5$", "org2/"])


@pytest.mark.parametrize("backend", ["json", "sqlite"])
def test_router_concurrent_routes_with_error_isolation(spark, tmp_base, backend):
    """VERDICT r3 #8 / r4 #5: concurrent=True advances routes in parallel
    driver threads; a route that fails mid-run reports an error in its own
    slot and stops advancing, while the other route completes and its
    final state matches the oracle. Parametrized over metastore backends:
    N route threads × ONE shared store is exactly the topology the
    sqlite driver's per-instance mutex (and the JSON driver's atomic
    os.replace + single-write O_APPEND audit appends) must serialize."""
    if backend == "sqlite":
        metastore = SqliteMetastore(os.path.join(tmp_base, "meta.db"))
    else:
        metastore = Metastore(os.path.join(tmp_base, "meta"))
    log = os.path.join(tmp_base, "log")
    write_event_log(generate_events(spark, 3000, num_keys=300), log)
    router = MultiTableRouter(
        spark,
        parquet_source(log),
        metastore,
        routes=[
            Route("org0", os.path.join(tmp_base, "t0"), r"^org0/"),
            Route("rest", os.path.join(tmp_base, "t1"), r"^org[^0]/"),
        ],
        batch_size=500,
        num_buckets=4,
    )
    # sabotage ONE route mid-run: its table merge raises after 2 batches
    bad = router.jobs["rest"]
    calls = {"n": 0}
    orig_merge = type(bad.table()).merge

    def failing_merge(self, *a, **kw):
        if self.root == bad.table_root:
            calls["n"] += 1
            if calls["n"] > 2:
                raise RuntimeError("injected route failure")
        return orig_merge(self, *a, **kw)

    try:
        type(bad.table()).merge = failing_merge
        results = router.run(until_seq=2999, concurrent=True)
    finally:
        type(bad.table()).merge = orig_merge

    # failing route isolated: error reported, checkpoint stalled
    assert "error" in results["rest"]
    assert "injected route failure" in results["rest"]["error"]
    pos = router.positions()
    assert pos["rest"]["global_offset"] < 2999

    # healthy route unaffected and exactly correct
    assert "error" not in results["org0"]
    assert pos["org0"]["global_offset"] == 2999
    pdf = spark.read.parquet(log).toPandas()
    exp0 = {k: v for k, v in expected_hashes(pdf).items() if k[0].startswith("org0/")}
    got0 = engine_hashes(IceboxTable(spark, os.path.join(tmp_base, "t0")).read())
    assert got0 == exp0

    # and the stalled route RESUMES cleanly once the fault clears
    resumed = router.run(until_seq=2999, concurrent=True)
    assert "error" not in resumed["rest"]
    exp1 = {k: v for k, v in expected_hashes(pdf).items() if not k[0].startswith("org0/")}
    got1 = engine_hashes(IceboxTable(spark, os.path.join(tmp_base, "t1")).read())
    assert got1 == exp1

    # shared audit tables intact under concurrent per-route appends:
    # every row parses (no torn JSON lines) and carries the full schema
    lineage = metastore._audit_rows("lineage")
    assert lineage and all(
        {"task_id", "batch_id", "snapshot_id"} <= set(r) for r in lineage
    )
    assert {r["task_id"] for r in lineage} == {"route-org0", "route-rest"}
