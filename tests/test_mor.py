"""Merge-on-read mode tests: delta resolution, compaction, cow/mor
equivalence (the write path that sustains 10^10-event upsert throughput)."""

import os

from pyspark.sql import functions as F

from milvus_cdc_spark.sources.icebox import IceboxTable

SCHEMA = "repo string, path string, v bigint, seq bigint"


def _mk(spark, tmp, name, mode):
    return IceboxTable.create(
        spark, os.path.join(tmp, name), SCHEMA, ["repo", "path"],
        num_buckets=4, seq_col="seq", write_mode=mode,
    )


def _ch(spark, rows):
    return spark.createDataFrame(rows, SCHEMA + ", __deleted boolean")


def test_mor_upsert_update_delete(spark, tmp_base):
    t = _mk(spark, tmp_base, "m", "mor")
    t.merge(_ch(spark, [("a", "1", 1, 10, False), ("b", "2", 2, 11, False)]))
    t.merge(_ch(spark, [("a", "1", 9, 20, False), ("b", "2", 0, 21, True),
                        ("c", "3", 3, 22, False)]))
    got = {(r["repo"], r["path"]): r["v"] for r in t.read().collect()}
    assert got == {("a", "1"): 9, ("c", "3"): 3}
    # physical layout: only delta files so far
    kinds = {f.get("kind") for fs in t.snap.buckets.values() for f in fs}
    assert kinds == {"delta"}


def test_mor_stale_replay_loses(spark, tmp_base):
    """A replayed change with a lower seq than the stored row must lose —
    seq-resolved idempotence without any fence."""
    t = _mk(spark, tmp_base, "m", "mor")
    t.merge(_ch(spark, [("a", "1", 5, 50, False)]))
    t.merge(_ch(spark, [("a", "1", 1, 10, False)]))  # stale replay
    assert t.read().collect()[0]["v"] == 5


def test_mor_compaction_resolves_and_bounds_deltas(spark, tmp_base):
    t = _mk(spark, tmp_base, "m", "mor")
    for i in range(6):
        t.merge(
            _ch(spark, [("a", "1", i, 100 + i, False), ("b", str(i), i, 200 + i, False)]),
            compact_threshold=3,
        )
    # merges beyond the threshold triggered MINOR compaction: delta-file
    # count stays bounded, base files are untouched (O(delta) cost)
    per_bucket = {
        b: [f.get("kind") for f in fs] for b, fs in t.snap.buckets.items()
    }
    assert all(k.count("delta") <= 3 for k in per_bucket.values())
    got = {(r["repo"], r["path"]): r["v"] for r in t.read().collect()}
    assert got[("a", "1")] == 5 and len(got) == 7

    # explicit full compaction → all base, state unchanged
    before = {(r["repo"], r["path"]): r["v"] for r in t.read().collect()}
    t.compact(threshold=0)
    kinds = {f.get("kind") for fs in t.snap.buckets.values() for f in fs}
    assert kinds == {"base"}
    after = {(r["repo"], r["path"]): r["v"] for r in t.read().collect()}
    assert before == after


def test_mor_delete_survives_compaction(spark, tmp_base):
    """Compacting a bucket whose latest version is a delete must drop the
    key for good (not resurrect the base row)."""
    t = _mk(spark, tmp_base, "m", "mor")
    t.merge(_ch(spark, [("a", "1", 1, 10, False)]))
    t.compact(threshold=0)  # base row on disk
    t.merge(_ch(spark, [("a", "1", 0, 20, True)]))  # delete marker in delta
    assert t.read().count() == 0
    t.compact(threshold=0)
    assert t.read().count() == 0
    # re-insert after compacted delete
    t.merge(_ch(spark, [("a", "1", 7, 30, False)]))
    assert t.read().collect()[0]["v"] == 7


def test_cow_and_mor_agree(spark, tmp_base):
    cow = _mk(spark, tmp_base, "c", "cow")
    mor = _mk(spark, tmp_base, "m", "mor")
    batches = [
        [("a", "1", 1, 10, False), ("b", "2", 2, 11, False)],
        [("a", "1", 9, 20, False), ("c", "3", 3, 21, False)],
        [("b", "2", 0, 30, True), ("d", "4", 4, 31, False)],
        [("b", "2", 8, 40, False)],
    ]
    for rows in batches:
        cow.merge(_ch(spark, rows))
        mor.merge(_ch(spark, rows), compact_threshold=2)
    k = lambda t: sorted(tuple(r) for r in t.read().collect())
    assert k(cow) == k(mor)


def test_mor_schema_evolution_across_deltas(spark, tmp_base):
    t = _mk(spark, tmp_base, "m", "mor")
    t.merge(_ch(spark, [("a", "1", 1, 10, False)]))
    t.add_column("stars", "int")
    ch = spark.createDataFrame(
        [("b", "2", 2, 20, 5, False)], SCHEMA + ", stars int, __deleted boolean"
    )
    t.merge(ch)
    got = {r["path"]: r["stars"] for r in t.read().collect()}
    assert got == {"1": None, "2": 5}
    t.compact(threshold=0)
    got = {r["path"]: r["stars"] for r in t.read().collect()}
    assert got == {"1": None, "2": 5}


def test_minor_compaction_keeps_tombstones_and_winners(spark, tmp_base):
    """Minor squash resolves among deltas only: the max-seq version per
    key survives INCLUDING delete markers (they must still mask base)."""
    t = _mk(spark, tmp_base, "m", "mor")
    t.merge(_ch(spark, [("a", "1", 1, 10, False), ("b", "2", 2, 11, False)]))
    t.compact(threshold=0, mode="major")  # base rows on disk
    t.merge(_ch(spark, [("a", "1", 5, 20, False)]))
    t.merge(_ch(spark, [("a", "1", 0, 30, True)]))   # delete, higher seq
    t.merge(_ch(spark, [("b", "2", 9, 31, False)]))
    t.compact(threshold=0, mode="minor")
    kinds = [f.get("kind") for fs in t.snap.buckets.values() for f in fs]
    assert kinds.count("delta") <= 2  # one squashed delta per touched bucket
    assert "base" in kinds            # base untouched by minor
    got = {(r["repo"], r["path"]): r["v"] for r in t.read().collect()}
    assert got == {("b", "2"): 9}     # a/1 masked by the squashed tombstone
    t.compact(threshold=0, mode="major")
    got = {(r["repo"], r["path"]): r["v"] for r in t.read().collect()}
    assert got == {("b", "2"): 9}


def test_rebucket_preserves_state(spark, tmp_base):
    """O6 channel-remap analog: changing bucket count rewrites placement
    in one shuffle, state identical, merges keep working after."""
    t = _mk(spark, tmp_base, "m", "mor")
    t.merge(_ch(spark, [(f"r{i}", "p", i, 100 + i, False) for i in range(40)]))
    before = sorted(tuple(r) for r in t.read().collect())
    t.rebucket(16)
    assert t.snap.num_buckets == 16
    assert len(t.snap.buckets) > 4  # spread over the new bucket space
    assert sorted(tuple(r) for r in t.read().collect()) == before
    # post-rebucket merges route by the new formula
    t.merge(_ch(spark, [("r1", "p", 999, 500, False)]))
    got = {(r["repo"], r["path"]): r["v"] for r in t.read().collect()}
    assert got[("r1", "p")] == 999 and len(got) == 40


def test_expire_snapshots_gc(spark, tmp_base):
    """expire_snapshots removes old manifests AND every data file no
    kept snapshot references (superseded by compaction rewrites), while
    the live state stays byte-identical and kept snapshots stay readable.
    Without GC a 10^10-event table's storage grows O(ever-written)."""
    import os

    from pyspark.sql import functions as F

    from milvus_cdc_spark.sources.icebox import IceboxTable

    root = os.path.join(tmp_base, "gc")
    t = IceboxTable.create(
        spark, root, "repo string, path string, v bigint", ["repo", "path"],
        num_buckets=4, seq_col="v", write_mode="mor",
    )
    for i in range(6):
        ch = spark.range(50).select(
            F.concat(F.lit("r"), F.col("id") % 10).alias("repo"),
            F.col("id").cast("string").alias("path"),
            (F.col("id") + i * 1000).alias("v"),
            F.lit(False).alias("__deleted"),
        )
        t.merge(ch, compact_threshold=2)
    before_state = {(r["repo"], r["path"]): r["v"] for r in t.read().collect()}

    def count_parquet():
        return sum(
            1 for dp, _, fns in os.walk(os.path.join(root, "data"))
            for f in fns if f.endswith(".parquet")
        )

    files_before = count_parquet()
    res = t.expire_snapshots(keep_last=2)
    assert res["removed_snapshots"] > 0 and res["removed_files"] > 0
    assert count_parquet() < files_before
    # live state untouched
    t.refresh()
    assert {(r["repo"], r["path"]): r["v"] for r in t.read().collect()} == before_state
    # every kept snapshot still fully readable
    for sid in t.snapshots():
        t.read(sid).count()


def test_expire_never_deletes_inflight_staging(spark, tmp_base):
    """expire_snapshots racing a same-process concurrent merge must never
    delete the merge's staged-but-uncommitted files (ADVICE r2): staged
    files are young orphans, protected by the grace window; expired
    files are only those a REMOVED snapshot referenced. The writer
    thread's commits must all survive a GC loop running throughout."""
    import os
    import threading

    from pyspark.sql import functions as F

    from milvus_cdc_spark.sources.icebox import IceboxTable

    root = os.path.join(tmp_base, "gcrace")
    t = IceboxTable.create(
        spark, root, "repo string, path string, v bigint", ["repo", "path"],
        num_buckets=4, seq_col="v", write_mode="mor",
    )
    errs = []
    done = threading.Event()

    def writer():
        try:
            h = IceboxTable(spark, root)
            for i in range(5):
                h.refresh()
                ch = spark.range(30).select(
                    F.concat(F.lit("r"), F.col("id") % 6).alias("repo"),
                    F.col("id").cast("string").alias("path"),
                    (F.col("id") + i * 1000).alias("v"),
                    F.lit(False).alias("__deleted"),
                )
                h.merge(ch, compact_threshold=2)
        except Exception as e:  # pragma: no cover
            errs.append(e)
        finally:
            done.set()

    th = threading.Thread(target=writer)
    th.start()
    gcs = 0
    while not done.is_set():
        t.refresh()
        if t.snap is not None and t.snapshots():
            t.expire_snapshots(keep_last=1)
            gcs += 1
    th.join()
    assert not errs, errs
    assert gcs > 0  # the race actually happened
    t.refresh()
    got = {(r["repo"], r["path"]): r["v"] for r in t.read().collect()}
    # last writer round (i=4) wins per key: v = id + 4000
    assert got == {(f"r{k % 6}", str(k)): k + 4000 for k in range(30)}


def test_expire_orphan_grace_window(spark, tmp_base):
    """Files referenced by NO manifest (crashed-writer staging leftovers)
    are deleted only past the mtime grace window; fresh orphans — an
    in-flight merge's staging — survive."""
    import os
    import time as _time

    from pyspark.sql import functions as F

    from milvus_cdc_spark.sources.icebox import IceboxTable

    root = os.path.join(tmp_base, "gcorph")
    t = IceboxTable.create(
        spark, root, "repo string, path string, v bigint", ["repo", "path"],
        num_buckets=4, seq_col="v", write_mode="mor",
    )
    t.merge(spark.createDataFrame(
        [("a", "1", 1, False)], "repo string, path string, v bigint, __deleted boolean"
    ))
    stage = os.path.join(root, "data", "snap-99-deadbeef", "__bucket=0")
    os.makedirs(stage)
    old = os.path.join(stage, "part-old.parquet")
    fresh = os.path.join(stage, "part-fresh.parquet")
    for p in (old, fresh):
        with open(p, "wb") as f:
            f.write(b"x")
    past = _time.time() - 7200
    os.utime(old, (past, past))
    res = t.expire_snapshots(keep_last=10, orphan_grace_seconds=3600)
    assert res["removed_orphans"] == 1
    assert not os.path.exists(old) and os.path.exists(fresh)
    # live data untouched
    assert [r["v"] for r in t.read().collect()] == [1]
