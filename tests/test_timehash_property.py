"""Property test for timehash placement (VERDICT r4 #4): identical,
oracle-checked bucket ids across session timezones for BOTH granularities
(day / month) and all THREE leading-key types (timestamp instant,
timestamp_ntz, date), including negative / pre-1970 epochs and exact
midnight / month-first boundaries. Placement is the one formula where a
silent mismatch corrupts a table with no per-batch test failing
(functions/hashing.py:bucket_expr documents the bug class), so the
expected value is recomputed by a pure-Python oracle, not just compared
between zones."""

from datetime import date, datetime, timedelta

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from milvus_cdc_spark.functions.hashing import placement_expr

N = 8  # sub-bucket count; single-key placement → bucket = coarse * N

# exact boundaries the generator is unlikely to hit: epoch zero and its
# neighbors, midnight edges, month firsts/lasts (incl. leap February),
# a pre-1970 century mark, and a far-future year boundary
EDGE_EPOCHS = [
    0, 1, -1,
    86_400, 86_399, -86_400, -86_401,
    2_678_400, 2_678_399,            # 1970-02-01 00:00:00 / -01-31 23:59:59
    5_097_600 - 1, 5_097_600,        # 1970-02-28 → 03-01 (non-leap)
    68_256_000, 68_255_999,          # 1972-02-29 24:00 → 03-01 (leap)
    -2_208_988_800,                  # 1900-01-01 00:00:00
    951_868_800, 951_868_799,        # 2000-03-01 boundary (leap century)
    4_102_444_800, 4_102_444_799,    # 2100-01-01 boundary
]

ZONES = ["UTC", "Asia/Kolkata", "America/Los_Angeles"]


def _civil(e: int) -> datetime:
    """UTC civil rendering of an epoch second (works pre-1970)."""
    return datetime(1970, 1, 1) + timedelta(seconds=e)


def _oracle_coarse(e: int, unit: str) -> int:
    days = e // 86_400  # floor division: pre-1970 rounds toward -inf
    if unit == "day":
        return days
    d = date(1970, 1, 1) + timedelta(days=days)
    return (d.year - 1970) * 12 + (d.month - 1)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        # years ~1336..2603 — comfortably inside both Spark's and
        # datetime's domains, crossing 1970 with plenty of margin
        st.integers(min_value=-20_000_000_000, max_value=20_000_000_000),
        min_size=1,
        max_size=12,
    )
)
def test_timehash_buckets_match_oracle_across_zones_types_units(spark, epochs):
    epochs = sorted(set(epochs) | set(EDGE_EPOCHS))
    rows = [(e, _civil(e).strftime("%Y-%m-%d %H:%M:%S")) for e in epochs]
    df = (
        spark.createDataFrame(rows, "e long, s string")
        .select(
            "e",
            # all three constructions are session-tz-independent BY
            # CONSTRUCTION: the instant from the epoch long, the ntz and
            # date from the civil string's calendar fields
            F.timestamp_seconds("e").alias("ts"),
            F.col("s").cast("timestamp_ntz").alias("ntz"),
            F.to_date("s").alias("d"),
        )
    )
    sel = df.select(
        "e",
        *[
            placement_expr(f"timehash:{unit}", [col], N, time_type=tt)
            .alias(f"{col}_{unit}")
            for col, tt in (("ts", "timestamp"), ("ntz", "timestamp_ntz"), ("d", "date"))
            for unit in ("day", "month")
        ],
    )
    old_tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        per_zone = {}
        for tz in ZONES:
            spark.conf.set("spark.sql.session.timeZone", tz)
            per_zone[tz] = {r["e"]: r.asDict() for r in sel.collect()}
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)

    for e in epochs:
        for unit in ("day", "month"):
            want = _oracle_coarse(e, unit) * N
            for col in ("ts", "ntz", "d"):
                for tz in ZONES:
                    got = per_zone[tz][e][f"{col}_{unit}"]
                    assert got == want, (
                        f"epoch={e} ({_civil(e)}) type={col} unit={unit} "
                        f"tz={tz}: bucket {got} != oracle {want}"
                    )
