"""Sink connectors (SURVEY.md §2 Part A ``sink_batch_insert``):
Parquet (offline/test stand-in, partitioned for window pruning) and
ClickHouse (gated JDBC path matching reference main.py:183-187)."""

from .parquet_sink import read_sink, scan_sink_keys_pruned, write_sink  # noqa: F401
from .clickhouse_sink import write_clickhouse  # noqa: F401
from .datasource_sink import (  # noqa: F401
    ClickHouseArrowDataSource,
    ClickHouseBatchDataSource,
    optimize_sink,
    prune_files,
    read_committed,
    read_committed_parquet,
    read_committed_pruned,
    sink_versions,
    truncate_history,
    vacuum_sink,
)
