"""Round-11 per-query profiling harness.

Replays bench.py's exact session (confs, warmups), then times the named
queries with the noop sink, N reps each (first rep = cold-in-session,
later reps = warm).  Optionally dumps ``explain("formatted")`` to
``plans/r11/<query>_<tag>.txt``.

Usage:
    python tools/prof_r11.py [--reps 3] [--explain TAG] [--sf DIR] q1 q2 ...

The timing methodology matches bench.py (construction + noop action in
one timed span) so numbers are directly comparable; reps beyond the
first quantify warm steady-state per OPTIMIZATION_r10.md's lesson that
cold single-task profiles can be JIT artifacts.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from fink_broker_spark.core.session import get_session  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--explain", default=None, metavar="TAG",
                    help="dump plans/r11/<q>_<TAG>.txt for each query")
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    args = ap.parse_args()

    spark = get_session(
        app_name="fbs-prof-r11",
        master=f"local[{args.cpus}]",
        shuffle_partitions=int(args.cpus),
    )
    # bench.py warmups, abridged: JVM/codegen/arrow-daemon
    spark.range(100000).repartition(4).count()
    spark.read.parquet(os.path.join(args.sf, "region.parquet")).count()
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _warm(s: pd.Series) -> pd.Series:
        return s

    spark.range(10000).repartition(int(args.cpus)).select(
        _warm("id")).write.format("noop").mode("overwrite").save()
    try:
        entrymod.entry(spark).write.format("noop").mode("overwrite").save()
    except Exception:
        pass

    qs = entrymod.queries()
    for name in args.queries:
        fn = qs[name]
        if args.explain:
            df = fn(spark, args.sf)
            os.makedirs("plans/r11", exist_ok=True)
            with open(f"plans/r11/{name}_{args.explain}.txt", "w") as fh:
                fh.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution
                    .ExplainMode.fromString("formatted")))
        times = []
        for rep in range(args.reps):
            spark.sparkContext.setJobDescription(f"{name} rep{rep}")
            t0 = time.perf_counter()
            df = fn(spark, args.sf)
            t_build = time.perf_counter() - t0
            df.write.format("noop").mode("overwrite").save()
            t_all = time.perf_counter() - t0
            times.append(t_all)
            print(f"{name} rep{rep}: total={t_all:.2f}s build={t_build:.2f}s",
                  flush=True)
        print(f"{name} SUMMARY min={min(times):.2f} med="
              f"{sorted(times)[len(times)//2]:.2f}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
