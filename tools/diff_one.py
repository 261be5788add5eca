"""Oracle-differential a few queries at a chosen SF (driver's t2 gate).

Usage: python tools/diff_one.py [--sf DIR] q1 q2 ...
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tests"))


def main() -> int:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--sf":
            sf_dir = args[i + 1]
            i += 2
        else:
            names.append(args[i])
            i += 1
    from oracle_harness import compare

    from appsflyer_to_clickhouse_spark.plans import ORACLE, QUERIES
    from appsflyer_to_clickhouse_spark.session import get_spark

    spark = get_spark(app_name="diff")
    rc = 0
    for name in names:
        try:
            df = QUERIES[name](spark, sf_dir)
            if name in ORACLE:
                compare(df, ORACLE[name], sf_dir)
                print(f"[diff] {name}: OK (exact)", flush=True)
            else:
                n = df.count()
                assert n > 0
                print(f"[diff] {name}: OK (rows-only, {n})", flush=True)
        except Exception as exc:  # noqa: BLE001
            rc = 1
            print(f"[diff] {name}: FAIL {exc}", flush=True)
    spark.stop()
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
