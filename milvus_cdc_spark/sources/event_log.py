"""The ordered, partitioned change-event log — the engine's streaming input.

This is the analog of the reference's MQ pchannels + dedicated replicate
channel (``core/msgdispatcher/dispatcher.go:82-148`` consume+seek;
``server/configs/cdc.yaml:35`` the op channel). Design decisions:

- ``event_seq`` is globally unique and strictly increasing within a
  partition. This single schema invariant replaces the reference's entire
  hybrid-timestamp machinery: the ts-monotonicity rewrite
  (``replicate_channel_manager.go:1846-1913``), the per-channel max-ts
  tracker (``core/reader/ts_manager.go``), and TimeTick generation.
- DDL / schema-evolution events live ONLY in partition 0 (the analog of
  the dedicated replicate channel), which makes the reference's N-channel
  drop barrier (``core/reader/data_barrier.go``) structurally unnecessary.
- Generation is 100% lazy Spark column expressions over ``spark.range`` —
  zero Python per row — so the benchmark can replay 10^8..10^10 events
  without ever materializing the log.

Determinism: every column is a pure function of (event_seq, seed) via
xxhash64/md5, so two runs — or a run at local[8] vs local[32] — see the
exact same log.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("event_seq", T.LongType(), False),
        T.StructField("event_type", T.StringType(), False),
        T.StructField("repo", T.StringType(), True),
        T.StructField("path", T.StringType(), True),
        T.StructField("commit", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("content", T.StringType(), True),
        T.StructField("schema_change", T.StringType(), True),
        T.StructField("event_ts", T.TimestampType(), True),
    ]
)

DML_TYPES = ("insert", "update", "delete")
DDL_TYPES = ("create_table", "add_column", "type_widen", "drop_table")
# Barrier events are applied in their own commit, in seq order, between
# DML sub-ranges: schema DDL plus bulk "import" (the analog of Milvus's
# Import msg type, reference replicate_channel_manager.go:1447,1699 —
# the first event a user attaching CDC to an existing corpus replays).
BARRIER_TYPES = DDL_TYPES + ("import",)

_LANGS = ["py", "go", "java", "md", "rs", "c", "ts"]

# Column-expression memo for the generator. Every generated column is a
# pure expression over the ``event_seq`` column (never over the range
# bounds), so the whole select list is REUSABLE across batches. Building
# it costs hundreds of py4j round trips (~0.6 s per batch at 1 pinned
# core — measured; the largest single slice of the replay loop's fixed
# per-batch cost); with the memo a batch slice pays 3 py4j calls
# (range + rename + select). Keyed on every parameter the expressions
# close over.
_GEN_COLS_CACHE: dict[tuple, list] = {}


def stable_seq_range(
    spark: SparkSession, lo: int, hi: int, max_batch: int,
    num_slices: int | None = None,
) -> DataFrame:
    """``event_seq`` in (lo, hi] as a DataFrame whose generated code is
    IDENTICAL for every (lo, hi] window with hi-lo <= max_batch.

    The only codegen-inlined literal is ``max_batch`` (constant for the
    job's life); the actual bounds travel as a broadcast one-row relation,
    which whole-stage codegen reads through the broadcast variable rather
    than inlining into source text. The width filter sits directly above
    Range, BEFORE the generator's expensive projections, so a narrower
    window (the warm-up batch, the final partial batch) costs only the
    discarded raw longs (~5 ns each), not discarded md5/concat work.

    Why it matters: Catalyst inlines primitive literals into generated
    Java (``Literal.doGenCode``), so per-batch ``range(lo, hi)`` defeats
    the codegen cache — every micro-batch pays Janino compilation plus
    ~8-12 s of JVM JIT (measured: BENCH/r5b slice/headline diagnostics,
    jit_ms per 2M-event batch at both 1 and 4 cores). At deployment batch
    sizes (10^8 events) that is noise; at high batch rates it is the
    dominant per-batch fixed cost. This helper makes the plan a true
    PREPARED statement: compile once, bind bounds per batch.

    ``num_slices``: Range partition count (default None: Spark's own
    defaultParallelism). The generator's per-event work (hash + md5
    payload synthesis) happens in this stage, so with one task per core
    the stage barrier waits on the SLOWEST core — per-core speed
    variance and scheduling jitter idle the rest at the barrier. 4-8
    tasks per core keeps the stage tail one small task wide instead of
    a quarter of the stage; per-task overhead is ~ms against
    multi-second tasks.
    """
    n = hi - lo
    if n > max_batch:
        raise ValueError(f"window {n} exceeds stable max_batch {max_batch}")
    bounds = F.broadcast(
        spark.createDataFrame([(lo + 1, n)], "__start long, __n long")
    )
    return (
        spark.range(0, max_batch, numPartitions=num_slices)
        .join(bounds)
        .filter(F.col("id") < F.col("__n"))
        .select((F.col("id") + F.col("__start")).alias("event_seq"))
    )


def generate_events(
    spark: SparkSession,
    n_events: int,
    *,
    num_partitions: int = 8,
    num_keys: int = 10_000,
    seed: int = 42,
    ddl_every: int | None = None,
    hot_repo_pct: int = 30,
    content_repeat: int = 8,
    start_seq: int = 0,
    seq_df: DataFrame | None = None,
) -> DataFrame:
    """Deterministic synthetic change-event log as a lazy DataFrame.

    Event mix follows FIXTURES.md §2: ~70% insert/update, ~25% delete,
    ~5% re-insert of a (possibly) deleted key; one hot repo (repo id 0)
    owns ``hot_repo_pct``% of keys — the skew/salting test case.

    ``ddl_every`` interleaves an ``add_column`` event every N seqs
    (partition 0), exercising the DDL-before-DML ordering rule.

    ``seq_df`` (optional) supplies the ``event_seq`` column from a caller-
    built DataFrame instead of ``spark.range(start_seq, ...)``. Callers use
    it to keep the range bounds OUT of the generated code: Spark inlines
    primitive literals into whole-stage-codegen source, so a per-batch
    ``range(lo, hi)`` yields a brand-new Janino class every batch whose JIT
    warm-up (~8-12 s of compiler CPU, measured in BENCH/r5b slice diags)
    recurs for the life of the job. With bounds carried as DATA (broadcast
    one-row join — see :func:`stable_seq_range`) the source text is
    byte-identical across batches and the first batch's compilation is the
    last. ``n_events``/``start_seq`` are ignored when ``seq_df`` is given.
    """
    if seq_df is not None:
        df = seq_df
    else:
        df = spark.range(start_seq, start_seq + n_events).withColumnRenamed("id", "event_seq")
    # applicationId in the key: cached Columns wrap JVM expression
    # objects, which die with the JVM — a fresh session must not reuse a
    # dead gateway's references
    key = (spark.sparkContext.applicationId, num_partitions, num_keys,
           seed, ddl_every, hot_repo_pct, content_repeat)
    cached = _GEN_COLS_CACHE.get(key)
    if cached is not None:
        cols1, cols2 = cached
        out = df.select(*cols1)
        return out.select(*cols2) if cols2 is not None else out
    s = F.lit(seed)

    # -- key identity: key_id -> (repo, path, lang), Zipf-ish hot repo.
    key_id = F.pmod(F.xxhash64("event_seq", s, F.lit("key")), F.lit(num_keys))
    is_hot = F.pmod(key_id, F.lit(100)) < F.lit(hot_repo_pct)
    repo_id = F.when(is_hot, F.lit(0)).otherwise(F.pmod(key_id, F.lit(997)) + 1)
    repo = F.concat(F.lit("org"), F.pmod(repo_id, F.lit(10)), F.lit("/repo"), repo_id)
    lang = F.element_at(
        F.array(*[F.lit(x) for x in _LANGS]), (F.pmod(key_id, F.lit(len(_LANGS))) + 1).cast("int")
    )
    path = F.concat(
        F.lit("src/dir"), F.pmod(key_id, F.lit(100)), F.lit("/file_"), key_id,
        F.lit("."), lang,
    )

    # -- event type mix (pure function of seq+seed).
    r = F.pmod(F.xxhash64("event_seq", s, F.lit("type")), F.lit(100))
    event_type = (
        F.when(r < 40, F.lit("insert"))
        .when(r < 70, F.lit("update"))
        .when(r < 95, F.lit("delete"))
        .otherwise(F.lit("insert"))  # re-insert slot (resurrection test)
    )

    # -- payload: 40-hex commit + pseudo-source content, all JVM-side.
    commit = F.substring(
        F.concat(F.md5(F.concat(repo, path, F.col("event_seq").cast("string"))),
                 F.md5(F.concat(F.col("event_seq").cast("string"), s.cast("string")))),
        1, 40,
    )
    body_line = F.md5(F.concat(F.lit("body"), F.col("event_seq").cast("string"), repo))
    content = F.concat(
        F.lit("// "), repo, F.lit("/"), path, F.lit(" @ "), commit, F.lit("\n"),
        F.repeat(F.concat(body_line, F.lit("\n")), content_repeat),
    )

    is_delete = event_type == "delete"
    partition_id = F.pmod(F.xxhash64(repo), F.lit(num_partitions)).cast("int")
    event_ts = F.timestamp_seconds(F.lit(1_700_000_000) + F.col("event_seq"))

    cols1 = [
        partition_id.alias("partition_id"),
        F.col("event_seq"),
        event_type.alias("event_type"),
        repo.alias("repo"),
        path.alias("path"),
        F.when(~is_delete, commit).alias("commit"),
        lang.alias("lang"),
        F.when(~is_delete, content).alias("content"),
        F.lit(None).cast("string").alias("schema_change"),
        event_ts.alias("event_ts"),
    ]
    cols2 = None
    out = df.select(*cols1)

    if ddl_every:
        # Rewrite every ddl_every-th event into an add_column DDL event in
        # partition 0 (the replicate-channel analog). Column name varies by
        # seq so repeated DDLs are distinct.
        is_ddl = F.pmod(F.col("event_seq"), F.lit(ddl_every)) == F.lit(ddl_every - 1)
        col_ix = (F.col("event_seq") / F.lit(ddl_every)).cast("long")
        schema_change = F.concat(
            F.lit('{"table":"code_files","op":"add_column","name":"extra_'),
            col_ix,
            F.lit('","type":"string"}'),
        )
        cols2 = [
            F.when(is_ddl, F.lit(0)).otherwise(F.col("partition_id")).alias("partition_id"),
            F.col("event_seq"),
            F.when(is_ddl, F.lit("add_column")).otherwise(F.col("event_type")).alias("event_type"),
            F.when(is_ddl, F.lit(None)).otherwise(F.col("repo")).alias("repo"),
            F.when(is_ddl, F.lit(None)).otherwise(F.col("path")).alias("path"),
            F.when(is_ddl, F.lit(None)).otherwise(F.col("commit")).alias("commit"),
            F.when(is_ddl, F.lit(None)).otherwise(F.col("lang")).alias("lang"),
            F.when(is_ddl, F.lit(None)).otherwise(F.col("content")).alias("content"),
            F.when(is_ddl, schema_change).otherwise(F.lit(None)).alias("schema_change"),
            F.col("event_ts"),
        ]
        out = out.select(*cols2)

    _GEN_COLS_CACHE[key] = (cols1, cols2)
    return out


def write_event_log(df: DataFrame, path: str) -> None:
    """Materialize a log for resumability tests: parquet sorted by
    event_seq so min/max row-group stats prune range scans."""
    df.repartitionByRange(8, "event_seq").sortWithinPartitions("event_seq").write.mode(
        "overwrite"
    ).parquet(path)


def read_event_range(
    spark: SparkSession, path: str, lo: int, hi: int
) -> DataFrame:
    """Seek + tail: events with lo < event_seq <= hi.

    The range predicate reaches the parquet scan (PushedFilters) so only
    row groups overlapping the offset window are read — the Spark analog
    of the reference's MQ seek (``dispatcher.go:120-140``).
    """
    df = spark.read.schema(EVENT_SCHEMA).parquet(path)
    return df.filter((F.col("event_seq") > lo) & (F.col("event_seq") <= hi))
