"""Local replica of the driver's correctness gate: run each queries()
entry on Spark and its oracle_sql() on DuckDB at a given sf dir, compare
row count + column names + order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import decimal
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entry  # noqa: E402
from milvus_cdc_spark.session import get_spark  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canon(v):
    # Type-tagged on purpose: the driver's value hash distinguishes
    # Decimal('123') (DuckDB HUGEINT/DECIMAL sums) from int 123 (Spark
    # BIGINT), so an uncast integer sum() in an oracle must fail HERE,
    # not only in CORRECTNESS_r{N}.json.
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    if isinstance(v, decimal.Decimal):
        return f"dec:{v}"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return str(v)


def rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = {}
    for r in rows:
        key = tuple(canon(r[i]) for i in order)
        out[key] = out.get(key, 0) + 1
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    # derived oracle constants (LSH plane counts) must follow the corpus
    # under test, not the driver's pinned sf0.01 (ADVICE r3)
    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = sf_dir
    spark = get_spark(master="local[8]")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    fails = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"{name:28s} SPARK-ERROR {str(e).splitlines()[0][:120]}")
            fails.append(name)
            continue
        if name not in oracles:
            print(f"{name:28s} rows-only ({len(srows)} rows, no oracle)")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            print(f"{name:28s} ORACLE-ERROR {str(e).splitlines()[0][:120]}")
            fails.append(name)
            continue
        problems = []
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols {sorted(scols)} vs {sorted(ocols)}")
        if len(srows) != len(orows):
            problems.append(f"rowcount {len(srows)} vs {len(orows)}")
        if not problems:
            s, o = rowset(scols, srows), rowset(ocols, orows)
            if s != o:
                diff = [k for k in s if s[k] != o.get(k)][:3]
                diffo = [k for k in o if o[k] != s.get(k)][:3]
                problems.append(f"values differ; spark-only={diff} oracle-only={diffo}")
        if problems:
            print(f"{name:28s} MISMATCH: {'; '.join(p[:400] for p in problems)}")
            fails.append(name)
        else:
            print(f"{name:28s} OK ({len(srows)} rows)")
    print(f"\n{len(fails)} failures: {fails}" if fails else "\nALL MATCH")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
