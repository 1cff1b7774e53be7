"""Document deduplication operators for large-scale training-data pipelines.

All hot-path logic is built-in Spark SQL functions (JVM-side, codegen) —
no Python in the per-row path. Hash primitives are md5/sha2 so results
are bit-identical across engines (the DuckDB oracle uses the same md5),
unlike xxhash64/murmur which are Spark-specific.

Scale notes (100 TB):
- exact dedup: one shuffle on the 32-hex digest — the digest (not the
  document) is the shuffle payload if you select early; Catalyst prunes
  `text` after the hash is computed.
- MinHash+LSH: shingling explodes ~L words per doc, but the per-doc
  signature aggregation is a partial (map-side) min — the shuffle
  carries (doc_id, 16 minima), i.e. O(docs), not O(shingles).
- band join: self-join on (band_id, band_hash) — only docs sharing a
  bucket meet; with b bands of r rows the candidate set is the classic
  (1-(1-s^r)^b) curve, and the join key is high-cardinality so the
  shuffle is well spread. Hot buckets (boilerplate docs) are handled by
  AQE skew-join splitting (enabled in session.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from milvus_cdc_spark.operators.salting import spread_scan


def exact_dedup(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact duplicate groups by content hash; keeps the min-id doc as
    the canonical representative. Returns (md5 string, keep_id, n_dups)."""
    return (
        docs.select(F.md5(F.col(text_col)).alias("content_md5"), F.col(id_col))
        .groupBy("content_md5")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_docs"),
        )
    )


def _shingle_parts(docs: DataFrame, id_col: str, text_col: str, n: int, distinct: bool):
    """(tokenized df, shingle-array EXPRESSION over it).

    The token array lives in its OWN projection: the shingle lambda
    captures it, and a captured *expression* (vs. an attribute) is
    re-evaluated per lambda invocation — the text would be re-split once
    per shingle. As a multiply-referenced non-cheap column it survives
    CollapseProject, so each element_at reads the split array.

    The shingle array itself is returned as an EXPRESSION and consumers
    must NOT stage it as a column before exploding: with an attribute
    child, the optimizer's InferFiltersFromGenerate adds a
    ``size(col) > 0`` filter that predicate-pushdown shoves below the
    projection, re-expanding the whole split→transform tree inline —
    re-evaluated per lambda element, a measured 10× regression.
    ``explode(<expression>)`` triggers no such inference.
    """
    tok = docs.select(
        F.col(id_col), F.split(F.trim(F.col(text_col)), r"\s+").alias("__w")
    )
    words = F.col("__w")
    # guard: sequence(1, 0) would be DESCENDING in Spark; short docs get []
    idx = F.when(
        F.size(words) >= n, F.sequence(F.lit(1), F.size(words) - (n - 1))
    ).otherwise(F.array().cast("array<int>"))
    shingle = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(words, i + j) for j in range(n)]
        ),
    )
    if distinct:
        shingle = F.array_distinct(shingle)
    return tok, shingle


def shingle_arrays(
    docs: DataFrame, id_col: str, text_col: str, n: int = 3, distinct: bool = True
) -> DataFrame:
    """Word n-gram shingles per doc as an ARRAY column: (id, shingles).

    Zero-shuffle building block: per-doc set operations (dedup via
    ``array_distinct``, set size via ``size``) stay inside the row and
    never shuffle just to dedup or count.
    """
    tok, shingle = _shingle_parts(docs, id_col, text_col, n, distinct)
    return tok.select(F.col(id_col), shingle.alias("shingles"))


def word_shingles(
    docs: DataFrame, id_col: str, text_col: str, n: int = 3, distinct: bool = True
) -> DataFrame:
    """Word n-gram shingles per doc: (id, shingle), distinct per doc by
    default.

    Split on whitespace; shingle = n consecutive words joined by one
    space. Docs shorter than n words produce no shingles (they can only
    be exact dups). All array ops are Catalyst built-ins.

    Scale note: shingle dedup is PER-DOCUMENT, so it is done with
    ``array_distinct`` on the shingle array *before* the explode — zero
    shuffle. A post-explode ``.distinct()`` would exchange O(corpus
    tokens) rows just to dedup within each doc. Consumers whose
    aggregation is duplicate-insensitive (MinHash: min) pass
    ``distinct=False`` and skip even the array scan. The explode target
    is an EXPRESSION on purpose — see :func:`_shingle_parts`.

    Contract: ``id_col`` is a KEY — one row per document. Rows sharing an
    id each emit their own shingles (dedup is per-row); exact-dedup the
    corpus first if ids can repeat.
    """
    tok, shingle = _shingle_parts(docs, id_col, text_col, n, distinct)
    return tok.select(F.col(id_col), F.explode(shingle).alias("shingle"))


def minhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """MinHash signature per doc: num_hashes columns ``mh_i``.

    Hash family i is ``md5(i || ':' || shingle)`` — engine-portable and
    deterministic. ZERO-shuffle: each ``mh_i`` is
    ``array_min(transform(shingles, s -> md5(i:s)))`` computed INSIDE
    the row — the signature is a pure projection over the per-doc
    shingle array. The former explode → groupBy(min) formulation
    planned as a two-level SortAggregate (min over *strings* has a
    var-length buffer, so it cannot hash-aggregate) that sorted the
    O(corpus-shingles) exploded rows twice and exchanged O(docs) rows;
    the array form does the identical md5 work with no explode, no
    sort, no exchange (r06: the LSH pair query over these signatures
    dropped 11.6 s → ~3 s at sf1.0). Shingle dedup is still skipped
    (``distinct=False``): min is duplicate-insensitive. Docs with fewer
    than ``shingle_n`` words have no shingles and are excluded (same
    rows as the explode form, where they vanished at the explode); the
    word-count filter is a per-ROW predicate on the token array — cheap
    next to the per-SHINGLE md5 work even where pushdown re-expands the
    split.
    """
    tok, shingle = _shingle_parts(
        spread_scan(docs), id_col, text_col, shingle_n, distinct=False
    )
    staged = tok.filter(F.size(F.col("__w")) >= shingle_n).select(
        F.col(id_col), shingle.alias("__sh")
    )
    cols = [
        F.array_min(
            F.transform(F.col("__sh"), lambda s: F.md5(F.concat(F.lit(f"{i}:"), s)))
        ).alias(f"mh_{i}")
        for i in range(num_hashes)
    ]
    return staged.select(F.col(id_col), *cols)


def lsh_candidate_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """MinHash-LSH near-duplicate candidate pairs (id_a < id_b, band hit
    count). bands × rows = num_hashes; a pair is a candidate if any band's
    sub-signature matches exactly.

    The signature table — the O(docs)-row lightweight proxy of the
    corpus (guide §8) — is materialized once with ``localCheckpoint``:
    the band self-join's two sides would otherwise each re-run the
    whole scan → shingle → 8×md5 pipeline (its cost is per-SHINGLE; the
    checkpoint is per-DOC and a few hundred bytes/row)."""
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(docs, id_col, text_col, num_hashes, shingle_n).localCheckpoint()
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_id"),
                F.md5(
                    F.concat_ws(
                        "|", *[F.col(f"mh_{b * rows_per_band + r}") for r in range(rows_per_band)]
                    )
                ).alias("band_hash"),
            )
            for b in range(bands)
        ]
    )
    banded = sig.select(F.col(id_col), F.explode(band_structs).alias("band")).select(
        F.col(id_col), F.col("band.band_id"), F.col("band.band_hash")
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("band_hits"))
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    threshold: float = 0.0,
) -> DataFrame:
    """Exact Jaccard similarity on word-shingle sets for candidate pairs.

    ``pairs`` has (id_a, id_b), assumed distinct (each pair is verified
    once). Runs only over LSH candidates — the classic two-stage
    near-dup pipeline (cheap filter, exact verify).

    The intersection is computed INSIDE the pair row with
    ``array_intersect`` on the two docs' distinct-shingle ARRAYS: the
    pair list is joined to one shingle-array row per side and the set
    ops (|A∩B|, |A|, |B|) never leave the row. The former formulation
    exploded every shingle of both sides, shuffled O(corpus-shingles)
    rows through two joins, and re-grouped the join output; now the
    only shuffled payload is one array per doc per side — O(pairs)
    rows, the candidates-only contract made literal (r06: 5.7 s →
    ~1 s at sf1.0, 16-node plan → 2 joins). Pairs with zero shared
    shingles are dropped (``n_inter >= 1``), exactly where the explode
    form dropped them structurally; so are pairs whose doc has no
    shingles at all.
    """
    tok, shingle = _shingle_parts(
        spread_scan(docs), id_col, text_col, shingle_n, distinct=True
    )
    sets_ = tok.select(F.col(id_col), shingle.alias("__sh"))
    a = sets_.select(F.col(id_col).alias("id_a"), F.col("__sh").alias("__sha"))
    b = sets_.select(F.col(id_col).alias("id_b"), F.col("__sh").alias("__shb"))
    out = (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            F.size(F.array_intersect("__sha", "__shb")).cast("long").alias("n_inter"),
            F.size("__sha").cast("long").alias("n_a"),
            F.size("__shb").cast("long").alias("n_b"),
        )
        .filter(F.col("n_inter") >= 1)
        .withColumn(
            "jaccard",
            F.round(F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 6),
        )
    )
    if threshold > 0:
        out = out.filter(F.col("jaccard") >= threshold)
    return out.select("id_a", "id_b", "n_inter", "n_a", "n_b", "jaccard")


def simhash(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 32,
) -> DataFrame:
    """SimHash fingerprint per doc over word features.

    Bit i of a word's hash = high bit of hex digit i of md5(word)
    (digit in 8..f) — pure string ops, bit-identical in any engine with
    md5. Fingerprint bit i = sign of sum(±1) over words. The bit loop is
    an unrolled aggregation — one shuffle, map-side partials, no UDF.
    """
    words = spread_scan(docs).select(
        F.col(id_col),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("w"),
    ).withColumn("h", F.md5("w"))
    # "hex digit has its high bit set" ⇔ digit in 8..f ⇔ char >= '8'
    # ('0'-'7' sort below '8'; 'a'-'f' above) — one comparison instead
    # of an 8-literal IN list, same predicate bit-for-bit
    aggs = [
        F.sum(
            F.when(F.substring(F.col("h"), i + 1, 1) >= "8", 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(bits)
    ]
    per_doc = words.groupBy(id_col).agg(*aggs)
    fp = None
    for i in range(bits):
        term = F.when(F.col(f"b{i}") > 0, F.lit(2**i).cast("long")).otherwise(F.lit(0).cast("long"))
        fp = term if fp is None else (fp + term)
    return per_doc.select(F.col(id_col), fp.alias("simhash"))


def simhash_near_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 32,
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance ≤ max_hamming.

    Scale path: block on the high 16 bits (near-dups almost always share
    them at distance ≤3 over 32 bits — a standard simhash banding
    approximation) so the join is band-bucketed, not all-pairs.

    The fingerprint table (id, simhash, block — 3 scalars/doc) is
    materialized ONCE with ``localCheckpoint`` and the probe side
    round-robin-repartitioned to the session's core count before the
    self-join: without this the aggregation output AQE-coalesces to a
    couple of partitions and the quadratic-in-block pair GENERATION —
    the query's real work, 25M output pairs at sf1.0 — runs on 2 tasks
    (r06 measurement: 14.6 s → ~3 s). The checkpoint also stops the
    whole scan→md5→agg pipeline being computed once per join side
    (broadcast and probe sides cannot share a stage).
    """
    fp = simhash(docs, id_col, text_col, bits)
    fp = fp.withColumn(
        "block", F.floor(F.col("simhash") / F.lit(float(2 ** (bits // 2)))).cast("long")
    ).localCheckpoint()
    par = docs.sparkSession.sparkContext.defaultParallelism
    a = fp.repartition(par).select(
        F.col(id_col).alias("id_a"), F.col("simhash").alias("sh_a"), "block"
    )
    b = fp.select(F.col(id_col).alias("id_b"), F.col("simhash").alias("sh_b"), "block")
    return (
        a.join(b, ["block"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
