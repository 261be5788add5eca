"""Isolate and time registered queries exactly like bench.py does.

Usage: python tools/profile_one.py [--sf DIR] [--runs N] [--plan SUFFIX] q1 q2 ...

Per query: noop-sink materialization (guide §1.4), job-description
labels (§1.5), N timed runs after the same JVM warmup bench.py uses,
and per-run shuffle/spill/read metrics from the SQL metrics store.
With --plan SUFFIX, also writes plans/r10/<q>_<SUFFIX>.txt
(.explain("formatted")).
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

REPO = Path(__file__).resolve().parents[1]


def main() -> int:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    runs = 2
    plan_suffix = None
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--sf":
            sf_dir = args[i + 1]
            i += 2
        elif args[i] == "--runs":
            runs = int(args[i + 1])
            i += 2
        elif args[i] == "--plan":
            plan_suffix = args[i + 1]
            i += 2
        else:
            names.append(args[i])
            i += 1

    import bench
    from appsflyer_to_clickhouse_spark.plans import QUERIES
    from appsflyer_to_clickhouse_spark.session import get_spark

    spark = get_spark(app_name="profile")
    # same JVM warmup as bench.py so cold-start isn't charged to run 1
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(5000)
    (
        li.groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            F.sum("l_quantity").alias("q"),
            F.countDistinct("l_partkey").alias("d"),
            F.approx_count_distinct("l_suppkey").alias("ad"),
        )
        .join(li.select("l_returnflag").distinct(), "l_returnflag")
        .write.format("noop")
        .mode("overwrite")
        .save()
    )

    last_eid, _ = bench._metrics_since(spark, -1)
    out_dir = REPO / "plans" / "r11"
    out_dir.mkdir(parents=True, exist_ok=True)
    for name in names:
        for r in range(runs):
            spark.sparkContext.setJobDescription(f"{name} run{r}")
            t0 = time.perf_counter()
            df = QUERIES[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            last_eid, m = bench._metrics_since(spark, last_eid)
            m = m or {}
            print(
                f"[profile] {name} run{r}: {dt:.3f}s "
                f"shw={m.get('shuffle_write_bytes', 0) / 1e6:.1f}MB "
                f"rec={m.get('shuffle_records', 0)} "
                f"read={m.get('files_read_bytes', 0) / 1e6:.1f}MB "
                f"spill={m.get('spill_bytes', 0) / 1e6:.1f}MB",
                flush=True,
            )
        if plan_suffix:
            df = QUERIES[name](spark, sf_dir)
            jvm = spark.sparkContext._jvm
            plan = jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            (out_dir / f"{name}_{plan_suffix}.txt").write_text(plan)
            print(f"[profile] wrote plans/r11/{name}_{plan_suffix}.txt")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
