"""Dump ``.explain("formatted")`` for named queries to plans/r10/.

Usage: python tools/explain_query.py <suffix> <query> [<query> ...]

Writes ``plans/r10/<query>_<suffix>.txt`` for each named query (suffix
is ``before`` / ``after``). Plans are captured at sf0.01 (structure is
SF-independent; 0.01 keeps any eager sub-jobs quick). Queries whose
build runs eager side-effects (streaming runs, sink mutations) still
produce the FINAL returned frame's plan, which is what the read path
executes.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

REPO = Path(__file__).resolve().parents[1]


def main() -> int:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = "/root/testdata/sf0.01"
    from appsflyer_to_clickhouse_spark.plans import QUERIES
    from appsflyer_to_clickhouse_spark.session import get_spark

    spark = get_spark(app_name="explain")
    out_dir = REPO / "plans" / "r10"
    out_dir.mkdir(parents=True, exist_ok=True)
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        jvm = spark.sparkContext._jvm
        plan = jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        (out_dir / f"{name}_{suffix}.txt").write_text(plan)
        print(f"wrote {name}_{suffix}.txt ({len(plan)} bytes)")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
