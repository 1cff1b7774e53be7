"""Text-analysis operators for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

Everything is built-in Spark SQL expressions (regexp/string/array
functions) — whole-stage-codegen'd, engine-portable (the DuckDB oracle
mirrors each formula), no UDFs in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_CJK_LO, _CJK_HI = "\u4e00", "\u9fff"

# tiny per-language stopword lists for the n-gram/stopword-hit heuristic
STOPWORDS = {
    "en": ["the", "and", "of", "to", "is"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "la", "los", "que", "y"],
    "de": ["der", "die", "und", "das", "ist"],
    "zh": ["的", "是", "了", "在", "和"],
}


def _word_hits(text_col, words: list[str]):
    """Count of whitespace-delimited tokens equal to any of ``words`` —
    implemented as filter(split(...)) size, portable to ANSI SQL."""
    toks = F.split(F.lower(F.trim(text_col)), r"\s+")
    return F.size(F.filter(toks, lambda t: t.isin([w for w in words])))


def _cjk_chars(text_col):
    """Count of CJK-unified-ideograph characters. Chinese has no word
    separators, so stopword-token matching can never fire on unsegmented
    text — the zh signal must be character-level."""
    return F.length(
        F.regexp_replace(text_col, "[^" + _CJK_LO + "-" + _CJK_HI + "]", "")
    )


def language_id(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Heuristic language ID: argmax of stopword hits per language;
    'und' (undetermined) when no list scores > 0. Deterministic tie
    break by language code order."""
    text = F.col(text_col)
    hit_cols = {lang: _word_hits(text, ws) for lang, ws in sorted(STOPWORDS.items())}
    hit_cols["zh"] = _cjk_chars(text)  # character-level (no word separators)
    # argmax via greatest + chained when (stable, SQL-portable)
    best_score = F.greatest(*hit_cols.values())
    pred = F.lit("und")
    for lang in sorted(STOPWORDS.keys(), reverse=True):
        pred = F.when(
            (hit_cols[lang] == best_score) & (best_score > 0), F.lit(lang)
        ).otherwise(pred)
    out = docs.select(
        F.col(id_col),
        *[c.alias(f"hits_{lang}") for lang, c in hit_cols.items()],
        pred.alias("lang_pred"),
    )
    return out


def quality_score(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Document quality features + a composite score in [0, 1]:

    - n_chars, n_words (0 for whitespace-only text), mean word length
      (single-space-separation approximation: (chars − (words−1))/words)
    - punctuation ratio (ASCII-centric: chars outside [A-Za-z0-9\\s] —
      counts non-Latin letters too; a crude heuristic, mirrored verbatim
      by the oracle)
    - stopword ratio (english list — boilerplate/natural-language signal)
    - score = clamp(words/200)·0.4 + (1−punct_ratio)·0.3 + clamp(stop·5)·0.3;
      empty docs score 0 with all ratios 0 (never NULL — a NULL score
      silently passes threshold filters)
    """
    text = F.col(text_col)
    n_chars = F.length(text)
    words = F.split(F.trim(text), r"\s+")
    # split(trim('')) yields [''] — size 1; whitespace-only text has 0 words
    n_words = F.when(F.length(F.trim(text)) == 0, 0).otherwise(F.size(words))
    mean_wlen = F.when(
        n_words > 0, F.round((n_chars - (n_words - 1)) / n_words, 6)
    ).otherwise(F.lit(0.0))
    n_punct = F.length(F.regexp_replace(text, r"[A-Za-z0-9\s]", ""))
    punct_raw = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    stop_raw = F.when(
        n_words > 0, _word_hits(text, STOPWORDS["en"]) / n_words
    ).otherwise(F.lit(0.0))
    punct_ratio = F.round(punct_raw, 6)
    stop_ratio = F.round(stop_raw, 6)
    # compose the score from RAW ratios and round once — rounding rounded
    # values can land exactly on a .5 ulp boundary where engines disagree
    score = F.round(
        F.least(n_words / F.lit(200.0), F.lit(1.0)) * 0.4
        + (1 - punct_raw) * 0.3
        + F.least(stop_raw * 5, F.lit(1.0)) * 0.3,
        6,
    )
    return docs.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_words.alias("n_words"),
        mean_wlen.alias("mean_word_len"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stopword_ratio"),
        score.alias("quality_score"),
    )


def token_count(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Token counting: whitespace tokens and a BPE-ish regex token count
    (letter runs / digit runs / single non-space symbols) plus the
    ~4-chars-per-token heuristic estimate."""
    text = F.col(text_col)
    ws_tokens = F.size(F.split(F.trim(text), r"\s+"))
    bpe_ish = F.size(F.regexp_extract_all(text, F.lit(r"([A-Za-z]+|[0-9]+|[^A-Za-z0-9\s])"), 1))
    est = F.round(F.length(text) / 4.0, 6)
    return docs.select(
        F.col(id_col),
        ws_tokens.alias("ws_tokens"),
        bpe_ish.alias("regex_tokens"),
        est.alias("est_tokens_len4"),
    )


def doc_fingerprint(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    window: int = 4,
) -> DataFrame:
    """Winnowing-style fingerprint: hash word shingles, take the min hash
    in every sliding window of ``window`` consecutive shingles, output
    the distinct set size + overall min (a compact per-doc sketch).

    Shuffle-free: the sliding-window minima are computed with array
    higher-order functions (``transform`` over positions +
    ``array_min(slice(...))``) entirely inside the row that holds the
    doc, so the whole operator is a projection — no posexplode, no
    window-by-doc exchange. Trailing windows shorter than ``window``
    still emit their min (slice clamps at the array end), matching a
    ROWS BETWEEN CURRENT ROW AND k FOLLOWING frame. The shingle hash is
    the md5 hex string itself (lexicographic min), engine-portable.
    """
    raw_words = F.split(F.trim(F.col(text_col)), r"\s+")
    # Docs too short to shingle emitted no rows under the old explode
    # path. Filter HERE, on the raw text: a later filter on the computed
    # wmins array gets predicate-pushed below the projections, where it
    # re-expands the whole shingle→md5→window-min tree inline — measured
    # as an 8× blowup (the filter copy is evaluated per lambda element).
    # Each intermediate array (words, hashes) is then materialized in its
    # OWN projection: lambdas below capture them, and a captured
    # *expression* (vs. an attribute) re-evaluates per lambda element —
    # O(n²) md5s / re-splits per doc. Multiply-referenced non-cheap
    # columns survive CollapseProject, so lambdas read computed arrays.
    tok = docs.filter(F.size(raw_words) >= shingle_n).select(
        F.col(id_col), raw_words.alias("__w")
    )
    words = F.col("__w")
    idx = F.sequence(F.lit(1), F.size(words) - (shingle_n - 1))
    shingle = F.transform(
        idx, lambda i: F.concat_ws(" ", *[F.element_at(words, i + j) for j in range(shingle_n)])
    )
    hashed = tok.select(
        F.col(id_col), F.transform(shingle, lambda s: F.md5(s)).alias("__h")
    )
    h = F.col("__h")
    wmins = F.transform(
        F.sequence(F.lit(1), F.size(h)),  # 1-based positions for slice()
        lambda i: F.array_min(F.slice(h, i, window)),
    )
    return hashed.select(
        F.col(id_col),
        F.size(F.array_distinct(wmins)).cast("long").alias("n_fingerprints"),
        F.array_min(wmins).alias("min_fingerprint"),
    )
