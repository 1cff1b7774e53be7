"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exact baseline; the scale path buckets
vectors with deterministic LSH (sign-random-projection) so each query
only scans its bucket — the same coarse-quantize-then-scan shape as IVF.

The dot product is ``F.zip_with`` + ``F.aggregate`` — JVM-side higher-
order functions, no Python per row. For very wide vectors a pandas UDF
over Arrow batches can beat HOF; both are provided and cross-checked in
tests (`cosine_topk(..., impl="pandas")`).
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    impl: str = "builtin",
) -> DataFrame:
    """Exact brute-force cosine top-k against one query vector.

    One scan + a driver-side top-k reduce (Spark's ``orderBy().limit(k)``
    is a per-partition partial top-k followed by a k-row merge — no full
    sort at scale). Score rounded to 6 dp for engine-portable comparison.

    (r06 note: a numpy-exact mapInPandas variant of this scorer was
    measured ~0.3 s faster at sf1.0 but deliberately NOT adopted: the
    ann queries are the first Python users in the bench's query order,
    so they would absorb the session's one-time Python-worker-pool
    startup (~2 s) that the much larger near-dup query amortizes —
    a per-query comparability regression for a marginal steady win.
    ``impl="pandas"`` keeps the matmul variant (fast, but its summation
    ORDER differs — tolerance-compared in tests, not oracle-exact)."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    qn = math.sqrt(sum(float(x) * float(x) for x in query_vec))
    if impl == "pandas":
        qlist = [float(x) for x in query_vec]

        @F.pandas_udf(DoubleType())
        def cos(col: pd.Series) -> pd.Series:
            import numpy as np

            qv = np.asarray(qlist, dtype=np.float64)
            qn_ = np.linalg.norm(qv)
            mat = np.stack(col.map(lambda v: np.asarray(v, dtype=np.float64)).values)
            return pd.Series(mat @ qv / (np.linalg.norm(mat, axis=1) * qn_))

        scored = embeddings.select(F.col(id_col), cos(F.col(vec_col)).alias("raw"))
    else:
        scored = embeddings.select(
            F.col(id_col),
            (_dot(F.col(vec_col), q) / (_norm(F.col(vec_col)) * F.lit(qn))).alias("raw"),
        )
    return (
        scored.select(F.col(id_col), F.round(F.col("raw"), 6).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


def srp_bucket(vec_col, planes: list[list[float]]):
    """Sign-random-projection bucket id: bit j = sign(v · plane_j).
    Planes are deterministic (seeded) driver-side constants — broadcast
    as literals into the plan, no shuffle to assign buckets."""
    bucket = F.lit(0)
    for j, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        bucket = bucket + F.when(_dot(vec_col, plane) > 0, F.lit(2**j)).otherwise(F.lit(0))
    return bucket


def srp_bucket_stage(
    df: DataFrame, id_col: str, vec_col: str, planes_list: list[list[list[float]]]
) -> DataFrame:
    """All plane tables' SRP buckets in ONE numpy pass (``mapInPandas``):
    emits (__id, __vec, __t, __bucket), one row per (input row, table).

    Each plane's dot product is the sequential per-dim fold, so the
    sign — and hence the bucket — is bit-identical to the JVM
    :func:`srp_bucket` HOF form (pinned by test). Keeping the planes in
    the Python closure also keeps tables × planes × dim literal doubles
    OUT of the plan (the HOF form inlines them — ~1.2k literals at the
    near-dup defaults, a measurable share of first-run planning and
    codegen) and replaces interpreted per-element lambda evaluation
    with vectorized adds. Rows with a NULL vector are dropped — they
    can never appear in any consumer's output (their JVM-side cosine
    would be NULL and fails every filter/threshold)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import IntegerType, LongType, StructField, StructType

    def assign(batches):
        planes_t = [np.array(p, dtype=np.float64) for p in planes_list]
        for pdf in batches:
            pdf = pdf[pdf[vec_col].notna()]
            if not len(pdf):
                continue
            mat = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col].values]
            )
            out = []
            for t, P in enumerate(planes_t):
                bucket = np.zeros(len(pdf), dtype=np.int64)
                for j in range(P.shape[0]):
                    acc = np.zeros(len(pdf))
                    for k in range(mat.shape[1]):
                        acc = acc + mat[:, k] * P[j, k]
                    bucket += (acc > 0).astype(np.int64) * (1 << j)
                out.append(
                    pd.DataFrame(
                        {
                            "__id": pdf[id_col].values,
                            "__vec": pdf[vec_col].values,
                            "__t": np.full(len(pdf), t, dtype=np.int32),
                            "__bucket": bucket,
                        }
                    )
                )
            yield pd.concat(out, ignore_index=True)

    schema = StructType(
        [
            StructField("__id", df.schema[id_col].dataType),
            StructField("__vec", df.schema[vec_col].dataType),
            StructField("__t", IntegerType()),
            StructField("__bucket", LongType()),
        ]
    )
    return df.select(F.col(id_col), F.col(vec_col)).mapInPandas(assign, schema=schema)


def make_planes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (LCG-based, no numpy RNG
    state) — same planes on every run/cluster size."""
    planes = []
    state = seed or 1
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            state = (state * 6364136223846793005 + 1442695040888963407) % (2**64)
            row.append(((state >> 33) / 2**31) - 1.0)  # [-1, 1)
        planes.append(row)
    return planes


def auto_planes(n_vectors: int, target_bucket_rows: int = 100_000) -> int:
    """Plane count that keeps the EXPECTED bucket population near
    ``target_bucket_rows`` — the bucket≈file-size rule. SRP buckets split
    the corpus ~2× per plane, so n_planes = ceil(log2(N / target)).
    Defaults target ~100k vectors/bucket (≈ tens of MB of float32 at
    typical dims — one comfortably scannable parquet file). At 10^10
    vectors this yields 17 planes (~131k buckets); the 4-plane toy
    setting would leave each bucket at O(N/16) — quadratic death for the
    self-join near-dup."""
    n = max(1, math.ceil(math.log2(max(n_vectors, 1) / target_bucket_rows)))
    return max(1, n)


def probe_buckets(query_vec: list[float], planes: list[list[float]], hamming: int = 1) -> list[int]:
    """The query's SRP bucket plus all buckets within the given Hamming
    distance (multi-probe LSH): near neighbors that fall on the wrong
    side of one hyperplane land in a 1-bit-flipped bucket, so probing
    Hamming-1 neighbors recovers most of the recall lost to a higher
    plane count at the cost of (1 + n_planes)/2^n_planes of the corpus."""
    qbucket = 0
    for j, p in enumerate(planes):
        if sum(a * b for a, b in zip(query_vec, p)) > 0:
            qbucket += 2**j
    out = {qbucket}
    if hamming >= 1:
        for j in range(len(planes)):
            out.add(qbucket ^ (2**j))
    if hamming >= 2:
        for j in range(len(planes)):
            for i in range(j + 1, len(planes)):
                out.add(qbucket ^ (2**j) ^ (2**i))
    return sorted(out)


def ann_lsh_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    seed: int = 42,
    probe_hamming: int = 1,
) -> DataFrame:
    """Approximate top-k: scan only the query's SRP bucket and its
    Hamming-``probe_hamming`` neighbors (multi-probe LSH). At 100 TB this
    is the coarse-quantization step that turns a full scan into a
    (1+n)/2^n partition-pruned scan; pair with :func:`write_bucketed` so
    the probe prunes FILES, not just rows (see
    :func:`ann_lsh_topk_bucketed`). Size ``n_planes`` with
    :func:`auto_planes` — it must grow with the corpus."""
    dim = len(query_vec)
    planes = make_planes(dim, n_planes, seed)
    probes = probe_buckets(query_vec, planes, hamming=probe_hamming)
    bucketed = embeddings.withColumn("__bucket", srp_bucket(F.col(vec_col), planes))
    cand = bucketed.filter(F.col("__bucket").isin(probes)).drop("__bucket")
    return cosine_topk(cand, query_vec, k=k, id_col=id_col, vec_col=vec_col)


def write_bucketed(
    embeddings: DataFrame,
    path: str,
    planes: list[list[float]],
    vec_col: str = "embedding",
) -> None:
    """Materialize the corpus hive-partitioned by SRP bucket — the
    physical layout that makes a probe prune at FILE level (the parquet
    reader never opens non-probed bucket dirs). One shuffle, run once
    per (corpus, plane-set)."""
    n = min(2 ** len(planes), 256)  # bucket count, capped for local mode
    (
        embeddings.withColumn("__bucket", srp_bucket(F.col(vec_col), planes))
        .repartition(n, F.col("__bucket"))
        .write.partitionBy("__bucket")
        .mode("overwrite")
        .parquet(path)
    )


def ann_lsh_topk_bucketed(
    spark,
    path: str,
    query_vec: list[float],
    planes: list[list[float]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_hamming: int = 1,
) -> DataFrame:
    """Top-k over a :func:`write_bucketed` layout: the probe-bucket filter
    is a PARTITION filter — Spark lists only the probed ``__bucket=``
    dirs, so I/O is (1+n_planes)/2^n_planes of the corpus, not a full
    scan with post-filter."""
    probes = probe_buckets(query_vec, planes, hamming=probe_hamming)
    df = spark.read.parquet(path).filter(F.col("__bucket").isin(probes))
    return cosine_topk(df.drop("__bucket"), query_vec, k=k, id_col=id_col, vec_col=vec_col)


def pairwise_cosine_neardup(
    embeddings: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    seed: int = 42,
    n_tables: int = 2,
    n_shards: int = 4,
) -> DataFrame:
    """Embedding near-duplicate pairs: SRP-bucketed self-join — only
    same-bucket pairs are scored, never all-pairs. ``n_planes`` must grow
    with the corpus (:func:`auto_planes`): each bucket's join is
    O((N/2^n)²). The recall lost to finer buckets is recovered with
    ``n_tables`` independent plane sets (classic multi-table LSH): a pair
    split by one table's hyperplane is usually intact in another; the
    union of per-table candidates is deduped before emit.

    Bucket assignment AND pair scoring both run in vectorized numpy
    (``mapInPandas`` then per-group ``applyInPandas``, guide §4.2
    shape): each (table, bucket) group crosses the Arrow boundary as
    VECTORS — O(corpus × n_tables) rows — never as pairs; the quadratic
    same-bucket pair stream exists only inside numpy. The scorer
    accumulates dot products and norms with one vectorized add per
    dimension in index order, which reproduces the exact IEEE fold order
    of the ``_dot``/``_norm`` built-ins (0.0 + t0 + t1 + ...; cast
    float→double is exact, each *, +, /, sqrt is a single correctly-
    rounded IEEE op in both JVM and numpy), so the raw cosines are
    BIT-IDENTICAL to the former JVM bucketed self-join — oracle-pinned.
    Rounding (decimal HALF_UP) and the threshold filter stay in Spark;
    Python pre-filters conservatively at threshold − 1e-6 only to bound
    emitted rows. r06 measurement at sf1.0 (20k vectors → 34M candidate
    pairs, hot bucket ≈ 4.1k vectors): the interpreted-HOF join scored
    pairs at ~4.5 µs each ≈ 154 s; the numpy scorer does 64 vectorized
    adds per dim over the whole bucket block at memory bandwidth.

    Skew (guide §2.5 "split hot keys"): SRP buckets are far from
    uniform (r06 sf1.0: hot bucket 4.1k of 20k vectors = half the
    query's pair work in ONE group), and one group is one task. Every
    bucket's self-join is therefore sharded: rows get a deterministic
    hash shard in 0..n_shards-1 and each unordered SHARD PAIR (ga ≤ gb)
    becomes its own group — ga == gb scores the shard's triangle,
    ga < gb the full A×B rectangle — so a hot bucket runs as
    n_shards(n_shards+1)/2 parallel tasks instead of one straggler.
    Each unordered row pair lands in exactly one shard-pair group, and
    the scorer's op order is unchanged, so the result set is identical.
    Cost: each row is shipped to n_shards groups (O(n) duplication
    against the O(n²) pair work it parallelizes)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import DoubleType as _Dbl
    from pyspark.sql.types import StructField, StructType

    dim_row = embeddings.select(F.size(vec_col)).first()
    dim = dim_row[0]
    all_planes = [make_planes(dim, n_planes, seed + t) for t in range(n_tables)]
    id_type = embeddings.schema[id_col].dataType

    st1 = srp_bucket_stage(embeddings, id_col, vec_col, all_planes)
    out_schema = StructType(
        [
            StructField("id_a", id_type),
            StructField("id_b", id_type),
            StructField("raw", _Dbl()),
        ]
    )
    cut = float(threshold) - 1e-6
    S = max(1, int(n_shards))
    # shard-pair groups: pid p covers (PAIRS[p][0], PAIRS[p][1]);
    # PIDS_BY_SHARD[s] = every pid whose pair contains shard s
    PAIRS = [(ga, gb) for ga in range(S) for gb in range(ga, S)]
    PIDS_BY_SHARD = [
        [p for p, (ga, gb) in enumerate(PAIRS) if ga == s or gb == s] for s in range(S)
    ]

    def _norms_np(mat):
        # exact _norm fold order: sqrt(0.0 + x0*x0 + x1*x1 + ...)
        acc = np.zeros(mat.shape[0])
        for k in range(mat.shape[1]):
            acc = acc + mat[:, k] * mat[:, k]
        return np.sqrt(acc)

    def _emit(A, B, na, nb, ids_a, ids_b, upper_only, out_a, out_b, out_r):
        """Score A×B with the exact _dot fold order; keep raw >= cut.
        upper_only: A and B are the SAME sorted set — keep j > i only.

        Tiled for locality: transposed (dim-major) copies make each
        per-dim slice contiguous, and the j-tile keeps the accumulator
        and product buffer cache-resident across the 64 sequential adds
        (a flat (m × n) accumulator re-streams itself from DRAM once
        per dim). The per-element op SEQUENCE is unchanged — tiling
        only reorders which (i, j) cells are computed when."""
        n_b = B.shape[0]
        d = A.shape[1]
        AT = np.ascontiguousarray(A.T)
        BT = AT if B is A else np.ascontiguousarray(B.T)
        blk, jtile = 512, 1024
        with np.errstate(divide="ignore", invalid="ignore"):
            for s in range(0, A.shape[0], blk):
                e = min(s + blk, A.shape[0])
                lo = s if upper_only else 0  # j >= s can still have j > i
                for j0 in range(lo, n_b, jtile):
                    j1 = min(j0 + jtile, n_b)
                    acc2 = np.zeros((e - s, j1 - j0))
                    tmp = np.empty((e - s, j1 - j0))
                    for k in range(d):
                        np.multiply(
                            AT[k, s:e][:, None], BT[k, j0:j1][None, :], out=tmp
                        )
                        acc2 += tmp
                    raw = acc2 / (na[s:e][:, None] * nb[j0:j1][None, :])
                    keep = raw >= cut
                    if upper_only:
                        keep &= np.arange(s, e)[:, None] < np.arange(j0, j1)[None, :]
                    ii, jj = np.nonzero(keep)
                    if ii.size:
                        ia = ids_a[ii + s]
                        ib = ids_b[jj + j0]
                        if upper_only:
                            out_a.append(ia)
                            out_b.append(ib)
                        else:  # rectangle: orient so id_a < id_b
                            swap = ib < ia
                            out_a.append(np.where(swap, ib, ia))
                            out_b.append(np.where(swap, ia, ib))
                        out_r.append(raw[ii, jj])

    def _sorted_side(pdf: pd.DataFrame):
        order = np.argsort(pdf["__id"].values, kind="stable")
        ids = pdf["__id"].values[order]
        mat = np.stack(
            [np.asarray(v, dtype=np.float64) for v in pdf["__vec"].values[order]]
        )
        return ids, mat

    def score(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf[pdf["__vec"].notna()]
        empty = pd.DataFrame({"id_a": [], "id_b": [], "raw": []})
        if len(pdf) < 2:
            return empty
        ga, gb = PAIRS[int(pdf["__pid"].iloc[0])]
        out_a: list = []
        out_b: list = []
        out_r: list = []
        if ga == gb:  # triangle within one shard
            ids, mat = _sorted_side(pdf)
            norms = _norms_np(mat)
            _emit(mat, mat, norms, norms, ids, ids, True, out_a, out_b, out_r)
        else:  # rectangle between the two shards
            side_a = pdf[pdf["__shard"].values == ga]
            side_b = pdf[pdf["__shard"].values == gb]
            if len(side_a) == 0 or len(side_b) == 0:
                return empty
            ids_a, mat_a = _sorted_side(side_a)
            ids_b, mat_b = _sorted_side(side_b)
            _emit(
                mat_a, mat_b, _norms_np(mat_a), _norms_np(mat_b),
                ids_a, ids_b, False, out_a, out_b, out_r,
            )
        if not out_a:
            return empty
        return pd.DataFrame(
            {
                "id_a": np.concatenate(out_a),
                "id_b": np.concatenate(out_b),
                "raw": np.concatenate(out_r),
            }
        )

    # Pin the scoring stage's width: the (t, bucket) shuffle is a few MB
    # of vectors, so AQE coalesces it to a handful of partitions — but
    # each GROUP carries O(n_b²) numpy work, so narrow partitions
    # serialize the quadratic part (r06: 7 post-AQE tasks ≈ 8 s vs 32
    # pinned ≈ 3 s). An explicit hash repartition on the exact group
    # keys is reused by the groupBy (no second exchange) and its
    # user-specified partition count is exempt from AQE coalescing;
    # core-count-derived, not a local-mode constant.
    pid_arrays = F.array(
        *[F.array(*[F.lit(p) for p in plist]) for plist in PIDS_BY_SHARD]
    )
    st2 = st1.withColumn(
        "__shard", F.pmod(F.xxhash64(F.col("__id")), F.lit(S)).cast("int")
    ).withColumn("__pid", F.explode(F.element_at(pid_arrays, F.col("__shard") + 1)))
    par = embeddings.sparkSession.sparkContext.defaultParallelism
    scored = (
        st2.repartition(par, "__t", "__bucket", "__pid")
        .groupBy("__t", "__bucket", "__pid")
        .applyInPandas(score, schema=out_schema)
    )
    out = (
        scored.select("id_a", "id_b", F.round(F.col("raw"), 6).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )
    # rounded cosine is deterministic, so (id_a, id_b, cosine) dedups
    # pairs found by several tables
    return out.distinct() if n_tables > 1 else out
