"""Build a scaled-up copy of a testdata SF dir for SCALING evidence.

Usage: python tools/make_scaled_sf.py [--base DIR] [--out DIR] [--k N]

Replicates every table K times with per-replica key offsets (the TPC-H
scaling shape): each replica shifts every key column by i * 10^8, so
foreign-key relationships hold WITHIN a replica and join/group
cardinalities scale linearly instead of exploding quadratically the
way naive row duplication would. Dimension-only tables (nation,
region) are copied as-is. Output is written with multiple row groups
(`repartition(32)` + row-group-sized files), so scans plan real
parallel splits — the point is to measure 8-vs-32-core scaling of the
registered queries on data big enough that per-query fixed overhead
stops dominating (the sf0.1 bench cannot show this; r10 verdict's
scaling block / next-round task 8).

This directory is for timing only — no DuckDB oracle is run against
it (the registered differentials stay on the canonical SFs).
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

OFF = 100_000_000  # per-replica key offset, far above any base key

# key columns to shift per table; every other column is copied
KEYS = {
    "customer": ["c_custkey"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "events": ["event_id", "user_id"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "nation": [],  # dims: copied once, not replicated
    "region": [],
}


def main() -> int:
    args = sys.argv[1:]
    base, out, k = "/root/testdata/sf0.1", "/root/testdata_scaled/sf1.6", 16
    i = 0
    while i < len(args):
        if args[i] == "--base":
            base = args[i + 1]
            i += 2
        elif args[i] == "--out":
            out = args[i + 1]
            i += 2
        elif args[i] == "--k":
            k = int(args[i + 1])
            i += 2
        else:
            raise SystemExit(f"unknown arg {args[i]}")

    from pyspark.sql import functions as F

    from appsflyer_to_clickhouse_spark.session import get_spark

    spark = get_spark(app_name="make_scaled_sf")
    Path(out).mkdir(parents=True, exist_ok=True)
    for table, keys in KEYS.items():
        src = spark.read.parquet(f"{base}/{table}.parquet")
        if not keys:  # pure dimension: one copy
            scaled = src
        else:
            reps = spark.range(k).withColumnRenamed("id", "_rep")
            scaled = src.crossJoin(F.broadcast(reps))
            for c in keys:
                scaled = scaled.withColumn(
                    c, (F.col(c) + F.col("_rep") * F.lit(OFF)).cast("long")
                )
            scaled = scaled.drop("_rep").repartition(32)
        scaled.write.mode("overwrite").parquet(f"{out}/{table}.parquet")
        print(f"[scale] {table}: x{max(1, len(keys) and k)} -> {out}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
