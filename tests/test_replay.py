"""End-to-end replay tests: engine final state == pandas oracle.

The analog of the reference's e2e sync tests
(``tests/testcases/test_cdc_sync_requests.py``) with the data_diff tool
as oracle — here the oracle is a pure-pandas fold and the invariant is
per-row sha256(content) equality (BASELINE.json input_hint).
"""

import os

import pytest
from pyspark.sql import functions as F

from milvus_cdc_spark.plans.apply import ReplicateJob, generated_source, parquet_source
from milvus_cdc_spark.plans.metastore import Metastore
from milvus_cdc_spark.sources.event_log import generate_events, write_event_log
from tests.oracle import engine_hashes, expected_hashes, fold_events

N_EVENTS = 4000
N_KEYS = 400


@pytest.fixture(scope="module")
def log_path(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("log") / "events")
    write_event_log(generate_events(spark, N_EVENTS, num_keys=N_KEYS), p)
    return p


def _run(spark, tmp, log_path, **kw):
    job = ReplicateJob(
        spark=spark,
        source=parquet_source(log_path),
        table_root=os.path.join(tmp, "tbl"),
        metastore=Metastore(os.path.join(tmp, "meta")),
        batch_size=kw.pop("batch_size", 1500),
        num_buckets=8,
        **kw,
    )
    job.run(until_seq=N_EVENTS - 1)
    return job


def test_full_replay_matches_oracle(spark, tmp_base, log_path):
    job = _run(spark, tmp_base, log_path)
    pdf = spark.read.parquet(log_path).toPandas()
    exp = expected_hashes(pdf)
    got = engine_hashes(job.table().read())
    assert got == exp
    # full-column equality on the winning rows, not just hashes
    state = fold_events(pdf)
    rows = job.table().read().collect()
    for r in rows:
        s = state[(r["repo"], r["path"])]
        assert r["commit"] == s["commit"]
        assert r["lang"] == s["lang"]
        assert r["content"] == s["content"]
        assert r["last_event_seq"] == s["last_event_seq"]


def test_replay_hash_impls_identical(spark, tmp_base, log_path):
    """The builtin (JVM sha2, the r5 default) and pandas-UDF hashers
    must yield byte-identical final table state — the per-row sha256
    invariant cannot depend on which execution path computed it."""
    a = _run(spark, os.path.join(tmp_base, "a"), log_path)  # builtin
    b = _run(spark, os.path.join(tmp_base, "b"), log_path, hash_impl="pandas")
    ha, hb = engine_hashes(a.table().read()), engine_hashes(b.table().read())
    assert ha == hb and ha == expected_hashes(spark.read.parquet(log_path).toPandas())


def test_lww_many_updates_single_batch(spark, tmp_base):
    """One key updated many times inside one batch → winner is max seq.
    (FIXTURES.md generation rule: 'at least one key with many updates in
    a single batch'.)"""
    rows = [
        (0, i, "update" if i else "insert", "r", "p", f"c{i}", "py", f"content-{i}", None, None)
        for i in range(50)
    ]
    df = spark.createDataFrame(
        rows,
        "partition_id int, event_seq long, event_type string, repo string, "
        "path string, commit string, lang string, content string, "
        "schema_change string, event_ts timestamp",
    )
    import tempfile

    log = os.path.join(tmp_base, "lwwlog")
    df.write.parquet(log)
    job = ReplicateJob(
        spark=spark,
        source=parquet_source(log),
        table_root=os.path.join(tmp_base, "tbl"),
        metastore=Metastore(os.path.join(tmp_base, "meta")),
        batch_size=1000,
        num_buckets=4,
    )
    job.run(until_seq=49)
    out = job.table().read().collect()
    assert len(out) == 1
    assert out[0]["content"] == "content-49"
    assert out[0]["last_event_seq"] == 49


def test_delete_then_reinsert_resurrection(spark, tmp_base):
    rows = [
        (0, 0, "insert", "r", "p", "c0", "py", "v0", None, None),
        (0, 1, "delete", "r", "p", None, "py", None, None, None),
        (0, 2, "insert", "r", "p", "c2", "py", "v2", None, None),
        (0, 3, "insert", "r2", "p2", "c3", "go", "v3", None, None),
        (0, 4, "delete", "r2", "p2", None, "go", None, None, None),
    ]
    df = spark.createDataFrame(
        rows,
        "partition_id int, event_seq long, event_type string, repo string, "
        "path string, commit string, lang string, content string, "
        "schema_change string, event_ts timestamp",
    )
    log = os.path.join(tmp_base, "reslog")
    df.write.parquet(log)
    job = ReplicateJob(
        spark=spark,
        source=parquet_source(log),
        table_root=os.path.join(tmp_base, "tbl"),
        metastore=Metastore(os.path.join(tmp_base, "meta")),
        batch_size=2,  # delete and re-insert land in different batches
        num_buckets=4,
    )
    job.run(until_seq=4)
    out = {(r["repo"], r["path"]): r["content"] for r in job.table().read().collect()}
    assert out == {("r", "p"): "v2"}  # resurrected; r2/p2 deleted


def test_generated_source_equals_parquet_source(spark, tmp_base, log_path):
    """The lazy generator sliced by seq range is event-identical to the
    materialized log — what makes the 10^8+ bench replay trustworthy."""
    gen = generated_source(num_keys=N_KEYS)(spark, 999, 2000)
    mat = spark.read.parquet(log_path).filter(
        (F.col("event_seq") > 999) & (F.col("event_seq") <= 2000)
    )
    assert gen.exceptAll(mat).count() == 0 and mat.exceptAll(gen).count() == 0


def test_stable_plan_source_equals_literal_source(spark, tmp_base, log_path):
    """Prepared-statement batching (bounds as a broadcast row instead of
    codegen-inlined literals) is a pure physical-plan change: the window
    contents and the full replayed state are identical to the literal
    path. Windows narrower than the cap (warm-up / final partial batch)
    are exercised on purpose."""
    lit = generated_source(num_keys=N_KEYS)(spark, 999, 2000)
    stab = generated_source(num_keys=N_KEYS, stable_max_batch=1500)(spark, 999, 2000)
    assert stab.exceptAll(lit).count() == 0 and lit.exceptAll(stab).count() == 0

    # end-to-end: multi-batch replay (uniform batches + final partial)
    # through the exact_range fast path reaches the same final state
    tmp = os.path.join(tmp_base, "stable_plan")
    job = ReplicateJob(
        spark=spark,
        source=generated_source(num_keys=N_KEYS, stable_max_batch=1500),
        table_root=os.path.join(tmp, "tbl"),
        metastore=Metastore(os.path.join(tmp, "meta")),
        batch_size=1500,
        num_buckets=8,
    )
    job.run(until_seq=N_EVENTS - 1)
    pdf = spark.read.parquet(log_path).toPandas()
    assert engine_hashes(job.table().read()) == expected_hashes(pdf)


def test_skewed_hot_repo_replay(spark, tmp_base, log_path):
    """Salted path produces the identical final state as unsalted."""
    job = _run(spark, tmp_base, log_path, salt_factor=8)
    pdf = spark.read.parquet(log_path).toPandas()
    assert engine_hashes(job.table().read()) == expected_hashes(pdf)
    # generator skew promise: hot repo 0 holds ≥ 25% of events
    hot = pdf[pdf.repo == "org0/repo0"].shape[0] / pdf.shape[0]
    assert hot >= 0.25


def test_metrics_and_lineage_emitted(spark, tmp_base, log_path):
    job = _run(spark, tmp_base, log_path)
    lin = job.metastore.lineage_df(spark)
    met = job.metastore.metrics_df(spark)
    assert lin.count() > 0 and met.count() > 0
    # lineage rows carry a real snapshot id per batch/partition
    snaps = set(job.table().snapshots())
    assert {r["snapshot_id"] for r in lin.select("snapshot_id").distinct().collect()} <= snaps
    # metrics rows_in sums to the number of DML events
    total = met.agg(F.sum("rows_in")).collect()[0][0]
    dml = spark.read.parquet(log_path).filter(
        F.col("event_type").isin("insert", "update", "delete")
    )
    assert total == dml.count()


def test_pathological_single_hot_key(spark, tmp_base):
    """Worst-case skew: EVERY event hits one key. Map-side combine must
    collapse it (correctness here; the plan property is pinned in
    test_plans.py) — winner is the global max seq."""
    rows = [
        (0, i, "update" if i else "insert", "hot/r", "p", f"c{i}", "py", f"v{i}", None, None)
        for i in range(2000)
    ]
    df = spark.createDataFrame(
        rows,
        "partition_id int, event_seq long, event_type string, repo string, "
        "path string, commit string, lang string, content string, "
        "schema_change string, event_ts timestamp",
    )
    log = os.path.join(tmp_base, "hotlog")
    df.write.parquet(log)
    job = ReplicateJob(
        spark=spark, source=parquet_source(log),
        table_root=os.path.join(tmp_base, "tbl"),
        metastore=Metastore(os.path.join(tmp_base, "meta")),
        batch_size=700, num_buckets=4,
    )
    job.run(until_seq=1999)
    out = job.table().read().collect()
    assert len(out) == 1 and out[0]["content"] == "v1999"


def test_consecutive_ddl_events(spark, tmp_base):
    """Back-to-back DDLs (and a DDL as the first event) each get their
    own capped batch and apply in seq order."""
    import json as _json

    def add(name):
        return _json.dumps({"op": "add_column", "name": name, "type": "int"})

    rows = [
        (0, 0, "add_column", None, None, None, None, None, add("c0"), None),
        (0, 1, "add_column", None, None, None, None, None, add("c1"), None),
        (0, 2, "insert", "r", "p", "cx", "py", "vx", None, None),
        (0, 3, "add_column", None, None, None, None, None, add("c2"), None),
    ]
    df = spark.createDataFrame(
        rows,
        "partition_id int, event_seq long, event_type string, repo string, "
        "path string, commit string, lang string, content string, "
        "schema_change string, event_ts timestamp",
    )
    log = os.path.join(tmp_base, "ddllog")
    df.write.parquet(log)
    job = ReplicateJob(
        spark=spark, source=parquet_source(log),
        table_root=os.path.join(tmp_base, "tbl"),
        metastore=Metastore(os.path.join(tmp_base, "meta")),
        batch_size=100, num_buckets=4,
    )
    job.run(until_seq=3)
    t = job.table()
    assert {"c0", "c1", "c2"} <= set(t.schema.fieldNames())
    assert t.read().count() == 1
    assert job.metastore.load_checkpoint(job.task_id)["global_offset"] == 3
