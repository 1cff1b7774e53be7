"""Extra benchmarks for optimization work (bench.py is FROZEN for the
driver's measurement; this file holds the guide §1 instrumentation).

Times each `__spark_entry__.queries()` entry two ways:
  - `.count()`  — exactly what bench.py charges the query for
  - noop sink   — computes every column of every row (guide §1.4),
                  isolating the computation from count()'s pruning
and optionally dumps `.explain("formatted")` to plans/<tag>/<name>.txt.

Usage:
  python bench_extra.py [--sf DIR] [--plans TAG] [--reps N] [query ...]

Env: SPARK_GRAFT_CPUS (default 32) — same master parameterization as
bench.py.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf1.0")
    ap.add_argument("--plans", default=None, help="dump plans to plans/<TAG>/")
    ap.add_argument("--suffix", default="", help="plan file suffix, e.g. _before")
    ap.add_argument("--reps", type=int, default=1)
    ap.add_argument("--mode", choices=["count", "noop", "both"], default="both")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    from milvus_cdc_spark.session import get_spark

    spark = get_spark(app_name="bench_extra", master=f"local[{cpus}]")

    import __spark_entry__ as entry

    qs = entry.queries()
    only = set(args.queries)

    # JVM/codegen warm-up, matching bench.py
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    out: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        rec: dict = {}
        if args.plans:
            pdir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", args.plans)
            os.makedirs(pdir, exist_ok=True)
            df = fn(spark, args.sf)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(pdir, f"{name}{args.suffix}.txt"), "w") as f:
                f.write(buf.getvalue())
        for mode in ("count", "noop"):
            if args.mode != "both" and mode != args.mode:
                continue
            times = []
            for _ in range(args.reps):
                spark.sparkContext.setJobDescription(f"{name} [{mode}]")
                t0 = time.time()
                df = fn(spark, args.sf)
                if mode == "count":
                    n = df.count()
                    rec["rows"] = n
                else:
                    df.write.format("noop").mode("overwrite").save()
                times.append(round(time.time() - t0, 3))
                spark.sparkContext.setJobDescription(None)
            if times:
                rec[mode] = min(times)
                rec[f"{mode}_all"] = times
        out[name] = rec
        print(f"{name:32s} " + " ".join(f"{k}={v}" for k, v in rec.items()), flush=True)

    print(json.dumps({"sf": args.sf, "cpus": cpus, "results": out}))


if __name__ == "__main__":
    main()
