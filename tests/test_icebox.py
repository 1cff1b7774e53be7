"""icebox table-format unit tests: merge semantics, bucket pruning,
schema evolution, time travel, commit conflicts."""

import os

import pytest
from pyspark.sql import functions as F

from milvus_cdc_spark.sources.icebox import CommitConflictError, IceboxTable

SCHEMA = "repo string, path string, v bigint"


def _mk(spark, tmp, name="t", buckets=8):
    return IceboxTable.create(
        spark, os.path.join(tmp, name), SCHEMA, ["repo", "path"], num_buckets=buckets
    )


def _changes(spark, rows):
    return spark.createDataFrame(rows, SCHEMA + ", __deleted boolean")


def test_merge_upsert_update_delete(spark, tmp_base):
    t = _mk(spark, tmp_base)
    t.merge(_changes(spark, [("a", "1", 1, False), ("b", "2", 2, False)]))
    t.merge(_changes(spark, [("a", "1", 10, False), ("b", "2", 0, True), ("c", "3", 3, False)]))
    got = {(r["repo"], r["path"]): r["v"] for r in t.read().collect()}
    assert got == {("a", "1"): 10, ("c", "3"): 3}


def test_merge_rewrites_only_affected_buckets(spark, tmp_base):
    """Copy-on-write pruning: untouched buckets keep their exact files —
    the property that keeps 100 TB merges O(touched data)."""
    t = _mk(spark, tmp_base, buckets=16)
    big = spark.range(2000).select(
        F.concat(F.lit("r"), F.col("id") % 50).alias("repo"),
        F.col("id").cast("string").alias("path"),
        F.col("id").alias("v"),
        F.lit(False).alias("__deleted"),
    )
    t.merge(big)
    files_before = {b: [f["path"] for f in fs] for b, fs in t.snap.buckets.items()}
    # touch exactly one key
    t.merge(_changes(spark, [("r1", "1", 999, False)]))
    files_after = {b: [f["path"] for f in fs] for b, fs in t.snap.buckets.items()}
    changed = [b for b in files_before if files_before[b] != files_after.get(b)]
    assert len(changed) == 1  # only the bucket holding ("r1","1")
    untouched = [b for b in files_before if b not in changed]
    assert all(files_before[b] == files_after[b] for b in untouched)


def test_time_travel(spark, tmp_base):
    t = _mk(spark, tmp_base)
    s1 = t.merge(_changes(spark, [("a", "1", 1, False)]))
    s2 = t.merge(_changes(spark, [("a", "1", 2, False)]))
    assert t.read(s1).collect()[0]["v"] == 1
    assert t.read(s2).collect()[0]["v"] == 2


def test_add_column_reads_null_for_old_files(spark, tmp_base):
    t = _mk(spark, tmp_base)
    t.merge(_changes(spark, [("a", "1", 1, False)]))
    t.add_column("stars", "int")
    row = t.read().collect()[0]
    assert row["stars"] is None
    # new writes carry the column
    ch = spark.createDataFrame(
        [("b", "2", 2, 5, False)], SCHEMA + ", stars int, __deleted boolean"
    )
    t.merge(ch)
    got = {r["path"]: r["stars"] for r in t.read().collect()}
    assert got == {"1": None, "2": 5}


def test_widen_column_upcasts_old_files(spark, tmp_base):
    t = IceboxTable.create(
        spark, os.path.join(tmp_base, "w"), "repo string, path string, v int",
        ["repo", "path"], num_buckets=4,
    )
    ch = spark.createDataFrame(
        [("a", "1", 7, False)], "repo string, path string, v int, __deleted boolean"
    )
    t.merge(ch)
    t.widen_column("v", "bigint")
    assert t.schema["v"].dataType.simpleString() == "bigint"
    assert t.read().collect()[0]["v"] == 7
    with pytest.raises(ValueError):
        t.widen_column("repo", "int")


def _bucket_of(spark, repo, path, n):
    from milvus_cdc_spark.functions import bucket_expr

    return spark.createDataFrame([(repo, path)], "repo string, path string").select(
        bucket_expr(["repo", "path"], n)
    ).collect()[0][0]


def test_commit_conflict_cow_same_bucket_raises(spark, tmp_base):
    """CoW rewrote a bucket from a point-in-time read; if the winner of a
    lost commit race touched that SAME bucket, the rewrite is stale and
    must surface the conflict (no silent clobber)."""
    root = os.path.join(tmp_base, "c")
    t1 = IceboxTable.create(spark, root, SCHEMA, ["repo", "path"], num_buckets=4)
    t2 = IceboxTable(spark, root)  # second writer handle, stale after t1 commits
    t1.merge(_changes(spark, [("a", "1", 1, False)]))
    with pytest.raises(CommitConflictError):
        t2.merge(_changes(spark, [("a", "1", 2, False)]))


def test_commit_conflict_disjoint_buckets_resolved_by_retry(spark, tmp_base):
    """A lost commit race over DIFFERENT buckets resolves by refresh +
    rebuild instead of pausing the task (reference: retry.Do around every
    external call)."""
    root = os.path.join(tmp_base, "r")
    n = 4
    t1 = IceboxTable.create(spark, root, SCHEMA, ["repo", "path"], num_buckets=n)
    t2 = IceboxTable(spark, root)
    b_a = _bucket_of(spark, "a", "1", n)
    other = next(
        (r, p)
        for r in ("b", "c", "d", "e")
        for p in ("2", "3", "4")
        if _bucket_of(spark, r, p, n) != b_a
    )
    t1.merge(_changes(spark, [("a", "1", 1, False)]))
    t2.merge(_changes(spark, [(other[0], other[1], 2, False)]))  # stale handle
    t2.refresh()
    got = {(r["repo"], r["path"]): r["v"] for r in t2.read().collect()}
    assert got == {("a", "1"): 1, other: 2}  # both commits survive


def test_commit_conflict_mor_resolved_by_retry(spark, tmp_base):
    """MoR delta files are parent-independent: a stale handle's merge
    re-attaches them to the winner's snapshot — even for the same key
    (seq resolution orders the rows)."""
    root = os.path.join(tmp_base, "m")
    t1 = IceboxTable.create(
        spark, root, SCHEMA, ["repo", "path"], num_buckets=4,
        seq_col="v", write_mode="mor",
    )
    t2 = IceboxTable(spark, root)
    t1.merge(_changes(spark, [("a", "1", 1, False), ("b", "2", 2, False)]))
    t2.merge(_changes(spark, [("a", "1", 10, False)]))  # stale handle, same key
    t2.refresh()
    got = {(r["repo"], r["path"]): r["v"] for r in t2.read().collect()}
    assert got == {("a", "1"): 10, ("b", "2"): 2}


def test_create_if_not_exists_idempotent(spark, tmp_base):
    root = os.path.join(tmp_base, "i")
    IceboxTable.create(spark, root, SCHEMA, ["repo", "path"])
    IceboxTable.create(spark, root, SCHEMA, ["repo", "path"], if_not_exists=True)
    with pytest.raises(FileExistsError):
        IceboxTable.create(spark, root, SCHEMA, ["repo", "path"])


def test_empty_merge_no_new_snapshot(spark, tmp_base):
    t = _mk(spark, tmp_base)
    sid = t.snap.snapshot_id
    out = t.merge(_changes(spark, []))
    assert out == sid


def test_overwrite_bootstrap_then_merge_consistent_buckets(spark, tmp_base):
    """Regression: overwrite() once bucketed with a DIFFERENT hash than
    merge/compact/rebucket; a bootstrapped table then merged read the
    wrong buckets for existing keys — duplicate rows, missed deletes.
    All write paths now share one bucket formula (functions.bucket_expr).
    """
    t = _mk(spark, tmp_base, buckets=16)
    base = spark.range(500).select(
        F.concat(F.lit("r"), F.col("id") % 40).alias("repo"),
        F.col("id").cast("string").alias("path"),
        F.col("id").alias("v"),
    )
    t.overwrite(base)
    # update + delete EXISTING keys through merge
    t.merge(_changes(spark, [("r1", "1", 999, False), ("r2", "2", 0, True)]))
    got = {(r["repo"], r["path"]): r["v"] for r in t.read().collect()}
    assert len(got) == 499  # one deleted, none duplicated
    assert got[("r1", "1")] == 999
    assert ("r2", "2") not in got


def test_bucket_formula_single_source_of_truth():
    """Every bucket-id expression in the table format must come from
    functions.bucket_expr — grep-level pin against reintroducing a
    second formula."""
    import inspect

    import milvus_cdc_spark.sources.icebox as icebox

    src = inspect.getsource(icebox)
    assert "xxhash64" not in src, "divergent bucket hash reintroduced"
    # exactly one import of the helper, used at every withColumn site
    assert src.count("F.hash(") == 0, "inline hash bucket formula"


def test_cow_merge_executes_changes_pipeline_once(spark, tmp_base):
    """Regression: CoW affected-bucket discovery used to .collect() the
    changes plan and then execute it AGAIN for the write. The changes
    pipeline (potentially dedup + Arrow UDFs) must run exactly once —
    counted here with an accumulator inside a nondeterministic UDF."""
    from pyspark.sql.types import LongType

    t = _mk(spark, tmp_base, name="once", buckets=4)
    acc = spark.sparkContext.accumulator(0)

    def bump(v):
        acc.add(1)
        return v

    bump_udf = F.udf(bump, LongType()).asNondeterministic()
    changes = spark.range(100).select(
        F.concat(F.lit("r"), F.col("id") % 10).alias("repo"),
        F.col("id").cast("string").alias("path"),
        bump_udf(F.col("id")).alias("v"),
        F.lit(False).alias("__deleted"),
    )
    t.merge(changes)
    assert acc.value == 100, f"changes pipeline executed {acc.value / 100}x"
    got = {(r["repo"], r["path"]): r["v"] for r in t.read().collect()}
    assert len(got) == 100


def test_concurrent_writers_one_table_threads(spark, tmp_base):
    """Two threads hammering ONE MoR table through separate handles: the
    per-table commit mutex + rebuild-on-conflict retry must serialize
    every commit — all rows from both writers survive, snapshot ids are
    gapless, no corruption."""
    import os
    import threading

    root = os.path.join(tmp_base, "cc")
    t0 = IceboxTable.create(
        spark, root, SCHEMA, ["repo", "path"], num_buckets=4,
        seq_col="v", write_mode="mor",
    )
    errs = []

    def writer(tag, base):
        try:
            h = IceboxTable(spark, root)
            for i in range(4):
                h.refresh()
                h.merge(_changes(
                    spark, [(tag, str(k), base + i * 10 + k, False) for k in range(3)]
                ))
        except Exception as e:  # pragma: no cover
            errs.append(e)

    th = [threading.Thread(target=writer, args=(t, b)) for t, b in
          (("wa", 100), ("wb", 200))]
    for x in th:
        x.start()
    for x in th:
        x.join()
    assert not errs, errs
    t0.refresh()
    got = {(r["repo"], r["path"]): r["v"] for r in t0.read().collect()}
    # each writer's LAST round wins per key (seq = v is monotonic per writer)
    assert {k for k in got} == {(t, str(k)) for t in ("wa", "wb") for k in range(3)}
    assert got[("wa", "0")] == 130 and got[("wb", "2")] == 232
    sids = t0.snapshots()
    assert sids == list(range(len(sids)))  # gapless: no clobbered manifests


TSCHEMA = "ts timestamp, k bigint, v bigint"


def _mk_timehash(spark, tmp, name="tt", sub=4):
    return IceboxTable.create(
        spark, os.path.join(tmp, name), TSCHEMA, ["ts", "k"],
        num_buckets=sub, bucket_formula="timehash:day",
    )


def _tchanges(spark, rows):
    import datetime

    rows = [(datetime.datetime.utcfromtimestamp(ts), k, v, d) for ts, k, v, d in rows]
    return spark.createDataFrame(rows, TSCHEMA + ", __deleted boolean")


def test_timehash_placement_separates_days(spark, tmp_base):
    """timehash:day places rows of different days in disjoint buckets and
    merge semantics (upsert/delete by key) are unchanged."""
    t = _mk_timehash(spark, tmp_base)
    day = 86_400
    t.merge(_tchanges(spark, [(0, 1, 10, False), (day, 1, 20, False)]))
    days = sorted({int(b) // 4 for b in t.snap.buckets})
    assert len(days) == 2 and days[1] == days[0] + 1
    # update day-0 row, delete day-1 row
    t.merge(_tchanges(spark, [(0, 1, 11, False), (day, 1, 0, True)]))
    got = {(r["ts"].timestamp(), r["k"]): r["v"] for r in t.read().collect()}
    assert got == {(0.0, 1): 11}


def test_timehash_requires_time_typed_leading_key(spark, tmp_base):
    with pytest.raises(ValueError, match="time-typed"):
        IceboxTable.create(
            spark, os.path.join(tmp_base, "bad"), SCHEMA, ["repo", "path"],
            bucket_formula="timehash:day",
        )
    with pytest.raises(ValueError, match="granularity"):
        IceboxTable.create(
            spark, os.path.join(tmp_base, "bad2"), TSCHEMA, ["ts", "k"],
            bucket_formula="timehash:week",
        )


def test_unknown_bucket_formula_refused(spark, tmp_base):
    t = _mk(spark, tmp_base, "fref")
    t.snap.bucket_formula = "fnv1a"  # manifest from a newer writer
    with pytest.raises(ValueError, match="unknown bucket formula"):
        t.merge(_changes(spark, [("a", "1", 1, False)]))


def test_merge_rejects_stray_affected_buckets(spark, tmp_base):
    """merge(affected_buckets=...) must refuse changes that hash outside
    the caller-supplied set — appending to an uncleared bucket would
    duplicate keys silently (ADVICE r2)."""
    t = _mk(spark, tmp_base, "stray")
    t.merge(_changes(spark, [("a", "1", 1, False), ("b", "2", 2, False)]))
    b_a = _bucket_of(spark, "a", "1", 8)
    b_b = _bucket_of(spark, "b", "2", 8)
    assert b_a != b_b
    before = {(r["repo"], r["path"]): r["v"] for r in t.read().collect()}
    with pytest.raises(ValueError, match="outside the"):
        t.merge(
            _changes(spark, [("a", "1", 10, False), ("b", "2", 20, False)]),
            affected_buckets=[b_a],  # caller forgot b's bucket
        )
    t.refresh()
    assert {(r["repo"], r["path"]): r["v"] for r in t.read().collect()} == before


def test_merge_complete_post_image_replaces_buckets(spark, tmp_base):
    """merge(complete=True, affected_buckets=...) treats changes as the
    full post-image of the affected buckets: present keys are the new
    contents (no winner resolution against old rows), omitted keys in
    those buckets are gone, and UNaffected buckets are untouched."""
    t = _mk(spark, tmp_base, "cmp")
    t.merge(_changes(spark, [("a", "1", 1, False), ("b", "2", 2, False)]))
    b_a = _bucket_of(spark, "a", "1", 8)
    b_b = _bucket_of(spark, "b", "2", 8)
    assert b_a != b_b
    # post-image for a's bucket: a with a LOWER seq than the old row —
    # still wins (no seq resolution: the caller's image is the truth)
    t.merge(
        _changes(spark, [("a", "1", 0, False)]),
        affected_buckets=[b_a], complete=True,
    )
    got = {(r["repo"], r["path"]): r["v"] for r in t.read().collect()}
    assert got == {("a", "1"): 0, ("b", "2"): 2}
    # empty post-image empties the bucket; b untouched
    t.merge(
        _changes(spark, [("a", "1", 9, True)]),  # delete marker filtered out
        affected_buckets=[b_a], complete=True,
    )
    got = {(r["repo"], r["path"]): r["v"] for r in t.read().collect()}
    assert got == {("b", "2"): 2}


def test_timehash_placement_session_tz_independent(spark, tmp_base):
    """ADVICE r3 (medium): two sessions with different
    spark.sql.session.timeZone must place the same row in the same
    bucket, or a table written from one zone and merged from another
    duplicates keys / misses deletes. Placement now derives the coarse
    unit from the UTC epoch value with pure date arithmetic."""
    from milvus_cdc_spark.functions.hashing import placement_expr

    df = spark.createDataFrame(
        [(23 * 3600 + 1800, 7), (946_598_400 + 600, 8)], "sec bigint, k int"
    ).select(F.col("sec").cast("timestamp").alias("ts"), "k")

    def place(unit):
        return [
            r[0]
            for r in df.select(
                placement_expr(f"timehash:{unit}", ["ts", "k"], 8).alias("b")
            ).collect()
        ]

    base = {u: place(u) for u in ("day", "month")}
    old_tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        for tz in ("Asia/Kolkata", "America/Los_Angeles"):
            spark.conf.set("spark.sql.session.timeZone", tz)
            for u in ("day", "month"):
                assert place(u) == base[u], (tz, u)
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)


def test_timehash_null_leading_key_raises_descriptively(spark, tmp_base):
    """ADVICE r3: a NULL leading time key must fail LOUDLY with a
    descriptive error instead of staging a __HIVE_DEFAULT_PARTITION__
    poison-pill file that wedges every later merge."""
    t = _mk_timehash(spark, tmp_base, "tnull")
    rows = _tchanges(spark, [(0, 1, 10, False)]).unionByName(
        spark.createDataFrame([(None, 2, 20, False)], TSCHEMA + ", __deleted boolean")
    )
    with pytest.raises(Exception, match="NULL leading time key"):
        t.merge(rows)
    # the failed merge committed nothing and did not wedge the table
    t.refresh()
    assert t.snap.snapshot_id == 0
    t.merge(_tchanges(spark, [(0, 1, 10, False)]))
    assert {r["v"] for r in t.read().collect()} == {10}


def test_merge_complete_refused_on_mor(spark, tmp_base):
    """ADVICE r3: complete=True asserts post-image semantics, which the
    MoR path (append-delta + seq resolution) does not implement — it
    must refuse, not silently degrade."""
    t = IceboxTable.create(
        spark, os.path.join(tmp_base, "morc"), SCHEMA, ["repo", "path"],
        num_buckets=4, seq_col="v", write_mode="mor",
    )
    with pytest.raises(ValueError, match="complete=True"):
        t.merge(
            _changes(spark, [("a", "1", 1, False)]),
            affected_buckets=[0], complete=True,
        )


def _commit_worker(root: str, wid: str, n: int) -> None:
    # runs in a separate PROCESS: no SparkSession — commit machinery is
    # pure file ops
    from milvus_cdc_spark.sources.icebox import IceboxTable

    t = IceboxTable(None, root)
    for i in range(n):
        marker = {f"m_{wid}_{i}": 1}
        t._commit_retrying(
            lambda cur: t._child_snapshot(cur, dict(cur.buckets), marker),
            attempts=200, backoff=0.002,
        )


def test_cross_process_commit_serializes(spark, tmp_base):
    """VERDICT r3 #5: two PROCESSES committing to one table. Without the
    fcntl.flock in _commit_lock, the orphan-replace branch of
    _write_snapshot_exclusive can interleave so the loser replaces the
    winner's just-committed manifest — a lost update visible here as a
    missing properties marker (properties accumulate through the
    child-snapshot chain, so the final snapshot must carry every
    worker's every marker)."""
    import multiprocessing as mp

    t = _mk(spark, tmp_base, "xproc")
    n = 20
    ctx = mp.get_context("spawn")
    ps = [
        ctx.Process(target=_commit_worker, args=(t.root, wid, n))
        for wid in ("a", "b")
    ]
    for p in ps:
        p.start()
    for p in ps:
        p.join(timeout=120)
        assert p.exitcode == 0
    t.refresh()
    assert t.snap.snapshot_id == 2 * n
    markers = {k for k in t.snap.properties if k.startswith("m_")}
    assert markers == {f"m_{w}_{i}" for w in ("a", "b") for i in range(n)}
    sids = t.snapshots()
    assert sids == list(range(2 * n + 1))  # gapless: no clobbered manifests
