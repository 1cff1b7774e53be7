"""MoR dedup-skip fast path (``ReplicateJob.dedup="auto"``).

The reference serializes per-channel applies and sorts within packs so
the LAST writer wins at the sink (``core/writer/replicate_message_manager.go:84-109``,
``core/reader/replicate_channel_manager.go:1451-1454``). This engine gets
the same guarantee from seq-resolved MoR reads (``icebox._resolve``) and
minor compaction — so for a MoR sink fed by a unique-seq log (the O2
contract), the pre-merge ``max_by`` aggregation is a redundant second
resolution. ``dedup="auto"`` therefore skips it on MoR: these tests pin
(a) final-state equivalence with the agg path, batch-by-batch, deletes
included, and (b) the plan shape — no sort aggregation on the hot path,
still exactly one exchange.
"""

import os

from pyspark.sql import functions as F

from milvus_cdc_spark.plans.apply import ReplicateJob, generated_source
from milvus_cdc_spark.plans.metastore import Metastore

N_EVENTS = 9000
N_KEYS = 700  # ~13 events/key: heavy duplication + deletes + re-inserts


def _run(spark, tmp, name, **kw):
    job = ReplicateJob(
        spark=spark,
        source=generated_source(num_keys=N_KEYS, content_repeat=2),
        table_root=os.path.join(tmp, name, "tbl"),
        metastore=Metastore(os.path.join(tmp, name, "meta")),
        batch_size=3000,
        num_buckets=4,
        log_max_seq=N_EVENTS - 1,
        **kw,
    )
    job.run(until_seq=N_EVENTS - 1)
    return job


def test_skip_final_state_equals_agg(spark, tmp_base):
    """agg-dedup and skip (auto on MoR) must produce the identical final
    table — every column of every row, content_sha256 included."""
    agg = _run(spark, tmp_base, "agg", dedup="agg")
    auto = _run(spark, tmp_base, "auto", dedup="auto")
    a = agg.table().read().orderBy("repo", "path").collect()
    b = auto.table().read().orderBy("repo", "path").collect()
    assert len(a) == len(b) > 0
    assert a == b


def test_auto_resolves_by_write_mode(spark, tmp_base):
    """auto → skip on MoR (no sort agg / max_by in the changes plan, one
    exchange), and → agg on CoW (the CoW merge contract requires ≤1
    change row per key, so the winner agg must stay)."""
    for mode, wants_agg in (("mor", False), ("cow", True)):
        job = ReplicateJob(
            spark=spark,
            source=generated_source(num_keys=50, content_repeat=2),
            table_root=os.path.join(tmp_base, mode, "tbl"),
            metastore=Metastore(os.path.join(tmp_base, mode, "meta")),
            num_buckets=4,
            write_mode=mode,
        )
        job.table()
        dml = generated_source(num_keys=50, content_repeat=2)(
            spark, -1, 999
        ).filter(F.col("event_type").isin("insert", "update", "delete"))
        plan = job._build_changes(dml)._jdf.queryExecution().executedPlan().toString()
        assert ("max_by" in plan) == wants_agg, (mode, plan)
        if not wants_agg:
            assert "SortAggregate" not in plan, plan
        assert plan.count("Exchange") == 1, (mode, plan)


def test_forced_skip_keeps_delete_markers(spark, tmp_base):
    """skip mode writes every event into the delta — the read must still
    fold a key whose LAST event is a delete to absent, and a re-inserted
    key back to present."""
    job = _run(spark, tmp_base, "skipdel", dedup="skip")
    table = job.table().read()
    # the generator's event mix contains deletes (FIXTURES.md §2): the
    # final table must be strictly smaller than the key universe and
    # carry no duplicate keys
    n = table.count()
    assert 0 < n < N_KEYS
    assert table.groupBy("repo", "path").count().filter("count > 1").count() == 0
