"""ETL parity operators (SURVEY.md §2 Part A), Spark-first.

Every operator here is a DataFrame->DataFrame function built from
declarative expressions, so Catalyst gets full visibility: the rename
is a Project (collapsed with the casts by ``CollapseProject``), the time
filter pushes down to the scan, and the dedup is a broadcast-hash
LeftAnti join — the physical shape the reference hand-codes with Python
sets (main.py:172-180), but shuffle-free and scale-out here.
"""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.kernels import null_sentinel_normalize, parse_datetime_lenient
from ..schemas import APPSFLYER_TO_CH, DATETIME_CH_COLS


def reorder_campaignid(cols: list[str]) -> list[str]:
    """Move ``campaignid`` to immediately after ``media_source``.

    This is the *intended* semantics of reference main.py:144-154. The
    reference implementation is buggy (it duplicates every column before
    ``media_source`` and raises ValueError on the AppsFlyer-name list) —
    verified by execution, documented in SURVEY.md §2. We implement the
    intent: column order is just the select-list order.
    """
    if "campaignid" not in cols or "media_source" not in cols:
        return list(cols)
    out = [c for c in cols if c != "campaignid"]
    out.insert(out.index("media_source") + 1, "campaignid")
    return out


def project_rename(
    df: DataFrame, mapping: dict[str, str] | None = None
) -> DataFrame:
    """Keep exactly the mapped columns, renamed src->dst; unmapped input
    columns are dropped; missing sources become NULL strings
    (reference main.py:19-69, 157-166: ``row.get(af_col)`` -> None).

    A single Project node — Catalyst prunes the parquet scan to the
    mapped source columns (ReadSchema), so at 100 TB only the 49 needed
    columns are read.
    """
    mapping = mapping or APPSFLYER_TO_CH
    present = set(df.columns)
    return df.select(
        *[
            (F.col(f"`{src}`") if src in present else F.lit(None).cast("string")).alias(
                dst
            )
            for src, dst in mapping.items()
        ]
    )


def normalize_batch(df: DataFrame, datetime_cols: frozenset[str] = DATETIME_CH_COLS) -> DataFrame:
    """Apply the two scalar kernels column-wise (reference main.py:157-166):
    datetime columns through the lenient parser, everything else through
    exact-case sentinel normalization. One Project, fully codegen'd."""
    return df.select(
        *[
            (
                parse_datetime_lenient(F.col(c))
                if c in datetime_cols
                else null_sentinel_normalize(F.col(c))
            ).alias(c)
            for c in df.columns
        ]
    )


def time_window_utc7(
    hours: int = 2, now_utc: datetime | None = None
) -> tuple[str, str]:
    """[now+7h − hours, now+7h] as naive '%Y-%m-%d %H:%M:%S' strings
    (reference main.py:107-112). ``now_utc`` injectable for determinism;
    the UTC+7 shift is window *computation* only — never a cast applied
    to data values (SURVEY.md §7)."""
    now = now_utc or datetime.now(timezone.utc)
    to_time = now + timedelta(hours=7)
    from_time = to_time - timedelta(hours=hours)
    fmt = "%Y-%m-%d %H:%M:%S"
    return from_time.strftime(fmt), to_time.strftime(fmt)


def filter_time_range(
    df: DataFrame, col: str, from_time: str, to_time: str
) -> DataFrame:
    """Inclusive-both-bounds window predicate (reference main.py:116-118,
    172-174). Expressed declaratively so Catalyst pushes it into the
    scan (parquet row-group pruning / JDBC pushdown) — the Spark
    equivalent of the reference pushing ``from=&to=`` into the API URL."""
    c = F.col(col)
    return df.filter((c >= F.lit(from_time)) & (c <= F.lit(to_time)))


def scan_sink_keys(
    sink_df: DataFrame, from_time: str, to_time: str, key: str = "appsflyer_id"
) -> DataFrame:
    """Existing keys within the window: select one column, drop
    NULL/empty, DISTINCT (reference main.py:169-176 collects this to a
    driver-side ``set`` — here it stays distributed and becomes the
    build side of the anti-join; never collected)."""
    keyed = filter_time_range(sink_df, "install_time", from_time, to_time).select(
        F.col(key).cast("string").alias(key)
    )
    return keyed.filter(F.col(key).isNotNull() & (F.col(key) != "")).distinct()


def dedup_anti_join(
    batch_df: DataFrame,
    existing_keys: DataFrame,
    key: str = "appsflyer_id",
    broadcast_hint: bool | None = None,
) -> DataFrame:
    """Keep batch rows whose key is non-falsy AND absent from
    ``existing_keys`` — a left ANTI join (reference main.py:175-181).

    Join strategy (VERDICT r1: never force-broadcast an unbounded
    side): by default (``broadcast_hint=None``) the planner + AQE
    decide — a windowed, partition-pruned key scan
    (sinks.parquet_sink.scan_sink_keys_pruned) is usually under the
    broadcast threshold and AQE converts to BroadcastHashJoin LeftAnti
    at runtime from *observed* size; a wide window over a 100 TB sink
    falls back to a shuffled hash join instead of OOMing every
    executor. Pass ``broadcast_hint=True`` only when the caller
    guarantees the key side is small.

    Quirk preserved: duplicates *within* the incoming batch are NOT
    deduped (two same-ID rows in one batch both survive) — use
    ``operators.dedup.dedup_exact`` / ``dedup_first_by_time`` to opt
    into the fix.
    """
    k = F.col(key)
    # compare the '' sentinel on a STRING view of the key: against a
    # numeric key column, Spark coerces '' to the numeric type, which
    # is NULL under non-ANSI casts — `k != NULL` is NULL and the
    # filter would silently drop EVERY row of the batch
    filtered = batch_df.filter(k.isNotNull() & (k.cast("string") != ""))
    right = F.broadcast(existing_keys) if broadcast_hint else existing_keys
    return filtered.join(right, on=key, how="left_anti")


def run_installs_pipeline(
    raw_df: DataFrame,
    sink_df: DataFrame,
    from_time: str,
    to_time: str,
) -> DataFrame:
    """The reference's entire main() (main.py:132-192) as one lazy
    DataFrame lineage: project+rename -> kernels -> sink key scan ->
    anti-join. Returns the rows that would be inserted; the caller
    appends them via ``sinks``."""
    mapped = project_rename(raw_df)
    ordered = mapped.select(*reorder_campaignid(mapped.columns))
    normalized = normalize_batch(ordered)
    existing = scan_sink_keys(sink_df, from_time, to_time)
    return dedup_anti_join(normalized, existing)
