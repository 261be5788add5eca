"""SURVEY.md §2 Part A source-side ops, oracle-checked with no network:
``csv_parse_header_bom``, ``source_http_csv``, ``config_env``, plus the
full ETL pipeline fed from a CSV file (VERDICT r1 item 6).

Fixtures are deterministic byte-for-byte and written to /tmp by the
query itself before reading (idempotent), so the driver can run these
in any order; oracles are VALUES literals generated from the SAME
Python constants the fixture/fake-fetcher use — the two sides cannot
drift.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..config import resolve_config
from ..operators.etl import run_installs_pipeline
from ..schemas import APPSFLYER_TO_CH, DATETIME_CH_COLS, af_raw_schema, sink_columns
from ..sources.csv_source import read_af_csv, write_fixture_csv
from ..sources.http_source import fetch_installs_distributed, split_window
from .registry import register

import itertools

_NAME_SEQ = itertools.count()

_FIXTURE_PATH = "/tmp/spark_graft_fixtures/af_batch.csv"

_FIXTURE_HEADER = [
    "Attributed Touch Type",
    "Install Time",
    "Event Time",
    "Media Source",
    "Campaign",
    "Campaign ID",
    "AppsFlyer ID",
]

# Rows exercise: fractional-second truncation, single-digit-hour pad,
# sentinel sets (datetime vs string asymmetry), ISO-T rejection, a
# within-batch duplicate id (the reference quirk), and a falsy id.
_FIXTURE_ROWS = [
    ["click", "2024-01-05 10:00:00", "2024-01-05 10:01:02.999", "meta", "camp-a", "c1", "af-001"],
    ["impression", "2024-01-05 4:03:22", "2024-01-05 10:02:00", "google", "null", "c2", "af-002"],
    ["click", "", "not a date", "None", "", "c3", "af-003"],
    ["click", "2024-01-05 11:00:00", "2024-01-05T11:00:00", "organic", "camp-b", "c4", "af-002"],
    ["click", "2024-01-05 12:00:00", "2024-01-05 12:00:00", "meta", "camp-c", "c5", ""],
]


def _sql_str(v: str | None) -> str:
    if v is None:
        return "CAST(NULL AS VARCHAR)"
    return "'" + v.replace("'", "''") + "'"


# ---------------------------------------------------------------------------
# csv_parse_header_bom
# ---------------------------------------------------------------------------


def _csv_oracle() -> str:
    rows = ",\n      ".join(
        "(" + ", ".join(_sql_str(v if v != "" else "") for v in r) + ")"
        for r in _FIXTURE_ROWS
    )
    cols = ", ".join(f'"{h}"' for h in _FIXTURE_HEADER)
    return f"SELECT * FROM (VALUES\n      {rows}) AS t({cols})"


@register("csv_parse_header_bom", _csv_oracle())
def q_csv_parse_header_bom(spark, sf_dir):
    """CSV source with header + UTF-8 BOM on the first header cell
    (reference main.py:125-129): the returned column must be
    'Attributed Touch Type', not '\\ufeffAttributed Touch Type' — the
    oracle's column-name comparison fails if the BOM survives. All
    values strings; '' preserved (not nulled — that's the kernels'
    job)."""
    write_fixture_csv(_FIXTURE_PATH, _FIXTURE_HEADER, _FIXTURE_ROWS, bom=True)
    return read_af_csv(spark, _FIXTURE_PATH)


# ---------------------------------------------------------------------------
# source_http_csv — partitioned fetch with an injected fetcher
# ---------------------------------------------------------------------------

_HTTP_FROM = "2024-01-05 00:00:00"
_HTTP_TO = "2024-01-05 08:00:00"
_HTTP_SPLITS = 4
_ROWS_PER_WINDOW = 3


def _window_rows(i: int, from_time: str) -> list[list[str]]:
    """Deterministic fake API payload for sub-window i — shared by the
    executor-side fake fetcher and the oracle generator."""
    return [
        [f"af-{i}-{j}", from_time, f"src-{(i + j) % 3}"]
        for j in range(_ROWS_PER_WINDOW)
    ]


_HTTP_HEADER = ["AppsFlyer ID", "Install Time", "Media Source"]
_WINDOWS = split_window(_HTTP_FROM, _HTTP_TO, _HTTP_SPLITS)


def csv_export_text(rows) -> str:
    """Assemble fake AppsFlyer export CSV text: BOM'd header line +
    comma-joined rows + trailing newline. ONE definition shared by
    every fetch fixture (batch, streaming, dup-feed, tests) so a
    format change cannot silently drift them apart."""
    lines = ["﻿" + ",".join(_HTTP_HEADER)]
    lines += [",".join(r) for r in rows]
    return "\n".join(lines) + "\n"


def _fake_fetch(from_time: str, to_time: str) -> str:
    """CSV text for a sub-window, BOM'd like the real export. Pure
    function of the window — picklable, runs on executors."""
    idx = next(i for i, (f, _) in enumerate(_WINDOWS) if f == from_time)
    return csv_export_text(_window_rows(idx, from_time))


def _http_oracle() -> str:
    af_cols = list(APPSFLYER_TO_CH)
    expected = []
    for i, (f, _) in enumerate(_WINDOWS):
        for row in _window_rows(i, f):
            by_name = dict(zip(_HTTP_HEADER, row))
            expected.append([by_name.get(c) for c in af_cols])
    rows = ",\n      ".join(
        "(" + ", ".join(_sql_str(v) for v in r) + ")" for r in expected
    )
    cols = ", ".join(f'"{c}"' for c in af_cols)
    return f"SELECT * FROM (VALUES\n      {rows}) AS t({cols})"


@register("source_http_csv", _http_oracle())
def q_source_http_csv(spark, sf_dir):
    """Windowed HTTP-CSV source, partitioned: the 8-hour window splits
    into {_HTTP_SPLITS} sub-ranges fetched+parsed per-executor inside
    mapInPandas (reference main.py:114-130 does ONE blocking driver-RAM
    GET — this is the scale-out re-design, SURVEY.md §7). The fetcher
    is injected (no network); BOM stripping and missing-column->NULL
    tolerance are exercised end-to-end."""
    return fetch_installs_distributed(
        spark, _HTTP_FROM, _HTTP_TO, _fake_fetch, _HTTP_SPLITS
    )


# ---------------------------------------------------------------------------
# file-format sources: JSON-lines and ORC round-trips
# ---------------------------------------------------------------------------

_FMT_ORACLE = """
    SELECT event_id, event_type, round(value, 4) AS value
    FROM events WHERE event_id % 10 = 0
    """


def _events_slice(spark, sf_dir):
    from .registry import load

    ev = load(spark, sf_dir, "events")
    return ev.filter(F.col("event_id") % 10 == 0).select(
        "event_id", "event_type", F.round("value", 4).alias("value")
    )


@register("source_jsonl", _FMT_ORACLE)
def q_source_jsonl(spark, sf_dir):
    """JSON-lines round trip: write an events slice as JSONL, read it
    back with an EXPLICIT schema (never inferSchema — nondeterministic
    at scale). Spark's JSON reader is splittable per line, so a 100 TB
    JSONL drop parallelizes by block like CSV."""
    import tempfile

    path = tempfile.mkdtemp(prefix="spark_graft_jsonl_")
    sl = _events_slice(spark, sf_dir)
    sl.write.mode("overwrite").json(path)
    return spark.read.schema(sl.schema).json(path)


@register("source_orc", _FMT_ORACLE)
def q_source_orc(spark, sf_dir):
    """ORC round trip: columnar-format sibling of the parquet path
    (predicate pushdown + column pruning work identically). The oracle
    compares against the originating events slice, proving lossless
    round-trip through the format."""
    import tempfile

    path = tempfile.mkdtemp(prefix="spark_graft_orc_")
    sl = _events_slice(spark, sf_dir)
    sl.write.mode("overwrite").orc(path)
    return spark.read.orc(path)


# ---------------------------------------------------------------------------
# config_env
# ---------------------------------------------------------------------------

_CFG_ENV = {
    "APPSFLYER_TOKEN": "tok-x",
    "APP_ID": "app.test",
    "CH_HOST": "ch.local",
    # CH_PORT deliberately unset -> default 9000 (reference main.py:13)
    "CH_USER": "u1",
    "CH_PASSWORD": "p1",
    "CH_DATABASE": "db1",
    "CH_TABLE": "installs",
}


@register(
    "config_env",
    """
    SELECT 'tok-x' AS appsflyer_token, 'app.test' AS app_id,
           'ch.local' AS ch_host, 9000 AS ch_port, 'u1' AS ch_user,
           'db1' AS ch_database, 'installs' AS ch_table,
           'jdbc:clickhouse://ch.local:9000/db1' AS jdbc_url
    """,
)
def q_config_env(spark, sf_dir):
    """Env-var config resolution with the reference's defaulting
    (main.py:10-17): only CH_PORT has a default. Resolved driver-side
    from an injected mapping (deterministic; never reads executor
    env)."""
    cfg = resolve_config(_CFG_ENV)
    # literals on range(1), not createDataFrame: the resolved config is
    # driver-side scalars, and building the row JVM-side skips the
    # Python->JVM serialization machinery entirely (whose one-time
    # session init was the entire measured cost of this query)
    return spark.range(1).select(
        F.lit(cfg.appsflyer_token).alias("appsflyer_token"),
        F.lit(cfg.app_id).alias("app_id"),
        F.lit(cfg.ch_host).alias("ch_host"),
        F.lit(cfg.ch_port).cast("int").alias("ch_port"),
        F.lit(cfg.ch_user).alias("ch_user"),
        F.lit(cfg.ch_database).alias("ch_database"),
        F.lit(cfg.ch_table).alias("ch_table"),
        F.lit(cfg.jdbc_url).alias("jdbc_url"),
    )


# ---------------------------------------------------------------------------
# etl_pipeline_from_csv — the flagship pipeline fed from the CSV source
# ---------------------------------------------------------------------------


def _pipeline_csv_oracle() -> str:
    """Expected pipeline output for the fixture, with the kernel
    semantics applied by hand (reference main.py:87-105, 165,
    157-181): fractional truncation, hour pad, sentinel asymmetry,
    ISO-T rejection, within-batch dup kept, falsy id dropped."""
    populated: list[dict[str, str | None]] = [
        {
            "attributed_touch_type": "click",
            "install_time": "2024-01-05 10:00:00",
            "event_time": "2024-01-05 10:01:02",
            "media_source": "meta",
            "campaign": "camp-a",
            "campaignid": "c1",
            "appsflyer_id": "af-001",
        },
        {
            "attributed_touch_type": "impression",
            "install_time": "2024-01-05 04:03:22",
            "event_time": "2024-01-05 10:02:00",
            "media_source": "google",
            "campaign": None,  # 'null' string sentinel
            "campaignid": "c2",
            "appsflyer_id": "af-002",
        },
        {
            "attributed_touch_type": "click",
            "install_time": None,  # '' datetime sentinel
            "event_time": None,  # 'not a date' fails strict gate
            "media_source": None,  # 'None' string sentinel
            "campaign": None,  # '' string sentinel
            "campaignid": "c3",
            "appsflyer_id": "af-003",
        },
        {
            "attributed_touch_type": "click",
            "install_time": "2024-01-05 11:00:00",
            "event_time": None,  # ISO-T rejected by strict regex
            "media_source": "organic",
            "campaign": "camp-b",
            "campaignid": "c4",
            "appsflyer_id": "af-002",  # within-batch dup survives
        },
    ]
    out_cols = sink_columns()
    value_rows = []
    for row in populated:
        cells = []
        for c in out_cols:
            v = row.get(c)
            if c in DATETIME_CH_COLS:
                cells.append(
                    f"TIMESTAMP '{v}'" if v else "CAST(NULL AS TIMESTAMP)"
                )
            else:
                cells.append(_sql_str(v))
        value_rows.append("(" + ", ".join(cells) + ")")
    cols = ", ".join(out_cols)
    return (
        "SELECT * FROM (VALUES\n      "
        + ",\n      ".join(value_rows)
        + f") AS t({cols})"
    )


@register("etl_pipeline_from_csv", _pipeline_csv_oracle())
def q_etl_pipeline_from_csv(spark, sf_dir):
    """The reference's entire main() fed from the CSV source: BOM'd
    fixture -> read_af_csv -> project/rename (43 missing sources ->
    NULL) -> kernels -> anti-join vs an empty sink. Golden-row oracle
    derived by hand from the reference semantics."""
    write_fixture_csv(_FIXTURE_PATH, _FIXTURE_HEADER, _FIXTURE_ROWS, bom=True)
    raw = read_af_csv(spark, _FIXTURE_PATH)
    empty_sink = spark.createDataFrame(
        [],
        T.StructType(
            [
                T.StructField("install_time", T.TimestampType()),
                T.StructField("appsflyer_id", T.StringType()),
            ]
        ),
    )
    return run_installs_pipeline(
        raw, empty_sink, "2020-01-01 00:00:00", "2030-01-01 00:00:00"
    )


@register("source_http_datasource", _http_oracle())
def q_source_http_datasource(spark, sf_dir):
    """The SAME windowed AppsFlyer export surfaced through the PySpark
    4 Python Data Source API (sources/datasource.py): registration +
    ``spark.read.format("appsflyer")`` with the window as options; each
    InputPartition is one sub-window fetched executor-side. Identical
    oracle to source_http_csv — the two source plumbings must agree
    byte-for-byte. The injectable fetcher arrives as a module:attr
    option so executors resolve it without network or pickled
    closures."""
    from ..sources.datasource import AppsFlyerDataSource

    spark.dataSource.register(AppsFlyerDataSource)
    return (
        spark.read.format("appsflyer")
        .option("from_time", _HTTP_FROM)
        .option("to_time", _HTTP_TO)
        .option("num_splits", str(_HTTP_SPLITS))
        .option(
            "fetcher",
            "appsflyer_to_clickhouse_spark.plans.source_queries:_fake_fetch",
        )
        .load()
    )


# ---------------------------------------------------------------------------
# csv_corrupt_records — PERMISSIVE parse with raw-line quarantine
# ---------------------------------------------------------------------------

_CORRUPT_LINES = [
    "1,alice,10.5",
    "2,bob,notanum",
    "3,carol",
    "4,dave,1.0,EXTRA",
    '"5,eve,2.0',
]

# expected PERMISSIVE results (pinned from Spark's documented contract:
# any row whose tokens don't fully parse keeps its parseable typed
# fields and lands its RAW LINE in the corrupt column; a structural
# break like the unclosed quote nulls every field)
_CORRUPT_EXPECTED: list[tuple[object, object, object, object]] = [
    (1, "alice", 10.5, None),
    (2, "bob", None, "2,bob,notanum"),
    (3, "carol", None, "3,carol"),
    (4, "dave", 1.0, "4,dave,1.0,EXTRA"),
    (None, None, None, '"5,eve,2.0'),
]


def _corrupt_oracle() -> str:
    def lit(v):
        if v is None:
            return "NULL"
        if isinstance(v, str):
            return _sql_str(v)
        return repr(v)

    rows = ",\n      ".join(
        "(" + ", ".join(lit(v) for v in r) + ")" for r in _CORRUPT_EXPECTED
    )
    return f"""
    SELECT CAST(id AS INTEGER) AS id, CAST(name AS VARCHAR) AS name,
           CAST(amount AS DOUBLE) AS amount,
           CAST(corrupt_record AS VARCHAR) AS corrupt_record
    FROM (VALUES\n      {rows}) AS t(id, name, amount, corrupt_record)
    """


@register("csv_corrupt_records", _corrupt_oracle())
def q_csv_corrupt_records(spark, sf_dir):
    """Malformed-row quarantine: PERMISSIVE CSV parse with
    columnNameOfCorruptRecord — typed fields parse where they can, and
    every row that doesn't fully conform (bad numeric, wrong arity,
    broken quoting) carries its raw line in the corrupt column instead
    of killing the job. This is the ingest posture for a 100 TB drop of
    third-party CSV: the clean split feeds the pipeline, the quarantine
    split is re-processed or reported, and neither requires a second
    scan (one pass splits both). FAILFAST is the validation mode;
    DROPMALFORMED silently loses data and is never used."""
    import tempfile

    path = tempfile.mkdtemp(prefix="spark_graft_corrupt_") + "/f.csv"
    with open(path, "w") as f:
        f.write("id,name,amount\n" + "\n".join(_CORRUPT_LINES) + "\n")
    schema = T.StructType(
        [
            T.StructField("id", T.IntegerType()),
            T.StructField("name", T.StringType()),
            T.StructField("amount", T.DoubleType()),
            T.StructField("corrupt_record", T.StringType()),
        ]
    )
    return (
        spark.read.schema(schema)
        .option("header", True)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "corrupt_record")
        .csv(path)
    )


# ---------------------------------------------------------------------------
# stream_http_datasource — the cron pull as an offset-tracked stream
# ---------------------------------------------------------------------------

_STREAM_WINDOW_S = 7200  # the reference's 2-hour pull window


def _stream_rows(from_time: str) -> list[list[str]]:
    """Deterministic per-window payload, a pure function of the window
    START (unlike _fake_fetch's index lookup, so any [start, end)
    regrouping of the time axis yields the same rows)."""
    stamp = from_time[:13].replace(" ", "T")
    return [[f"af-s-{stamp}-{j}", from_time, f"src-{j}"] for j in range(2)]


def _stream_fake_fetch(from_time: str, to_time: str) -> str:
    return csv_export_text(_stream_rows(from_time))


def _stream_http_oracle() -> str:
    from ..sources.datasource import _stream_windows

    af_cols = list(APPSFLYER_TO_CH)
    expected = []
    for f, _t in _stream_windows(_HTTP_FROM, _HTTP_TO, _STREAM_WINDOW_S):
        for row in _stream_rows(f):
            by_name = dict(zip(_HTTP_HEADER, row))
            expected.append([by_name.get(c) for c in af_cols])
    rows = ",\n      ".join(
        "(" + ", ".join(_sql_str(v) for v in r) + ")" for r in expected
    )
    cols = ", ".join(f'"{c}"' for c in af_cols)
    return f"SELECT * FROM (VALUES\n      {rows}) AS t({cols})"


@register("stream_http_datasource", _stream_http_oracle())
def q_stream_http_datasource(spark, sf_dir):
    """The reference's cron loop as a STREAMING source
    (sources/datasource.py:_AppsFlyerStreamReader): the time axis is
    the offset, each run's horizon is latestOffset, and each 2-hour
    window is one executor-side InputPartition. Here one run drains
    the whole [from, to) backfill; the restart contract — a second
    run resumes from the COMMITTED offset and re-fetches nothing —
    is pinned in tests/test_stream_datasource.py. Exactly-once
    replaces the reference's re-pull + sink anti-join idempotency
    machinery at the source layer."""
    import tempfile as _tf

    from ..sources.datasource import AppsFlyerDataSource

    spark.dataSource.register(AppsFlyerDataSource)
    stream = (
        spark.readStream.format("appsflyer")
        .option("from_time", _HTTP_FROM)
        .option("to_time", _HTTP_TO)
        .option("window_seconds", str(_STREAM_WINDOW_S))
        .option(
            "fetcher",
            "appsflyer_to_clickhouse_spark.plans.source_queries:_stream_fake_fetch",
        )
        .load()
    )
    name = f"stream_http_ds_{next(_NAME_SEQ)}"
    ckpt = _tf.mkdtemp(prefix="spark_graft_ckpt_httpstream_")
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.table(name)


# ---------------------------------------------------------------------------
# stream_etl_pipeline — the reference pipeline, fully streaming
# ---------------------------------------------------------------------------

_DUP_ROW = ["af-dup", "2024-01-05 02:00:00", "src-d"]


def _stream_dup_rows(from_time: str) -> list[list[str]]:
    """Per-window payload with a cross-window duplicate: windows
    starting 02:00 and 04:00 both carry the IDENTICAL ``af-dup`` row
    (full-row identical, so whichever copy the dedup keeps, the output
    is byte-equal — survivor choice can stay engine-internal)."""
    rows = [r[:] for r in _stream_rows(from_time)]
    if from_time[11:13] in ("02", "04"):
        rows.append(_DUP_ROW[:])
    return rows


def _stream_dup_fetch(from_time: str, to_time: str) -> str:
    return csv_export_text(_stream_dup_rows(from_time))


def _stream_etl_oracle() -> str:
    from ..sources.datasource import _stream_windows

    by_af = {h: i for i, h in enumerate(_HTTP_HEADER)}
    seen, expected = set(), []
    for f, _t in _stream_windows(_HTTP_FROM, _HTTP_TO, _STREAM_WINDOW_S):
        for row in _stream_dup_rows(f):
            key = tuple(row)
            if row[0] == "af-dup" and key in seen:
                continue  # the watermark dedup keeps one copy
            seen.add(key)
            expected.append(row)
    cols = list(APPSFLYER_TO_CH.values())
    rows_sql = []
    for row in expected:
        cells = []
        for af, ch in APPSFLYER_TO_CH.items():
            v = row[by_af[af]] if af in by_af else None
            if ch == "install_time" and v is not None:
                cells.append(f"TIMESTAMP '{v}'")
            elif ch == "install_time":
                cells.append("CAST(NULL AS TIMESTAMP)")
            else:
                cells.append(_sql_str(v))
        rows_sql.append("(" + ", ".join(cells) + ")")
    col_sql = ", ".join(f'"{c}"' for c in cols)
    return (
        "SELECT * FROM (VALUES\n      "
        + ",\n      ".join(rows_sql)
        + f") AS t({col_sql})"
    )


@register("stream_etl_pipeline", _stream_etl_oracle())
def q_stream_etl_pipeline(spark, sf_dir):
    """The ENTIRE reference pipeline as one streaming job: the
    offset-tracked AppsFlyer source -> the SAME batch operators
    (project_rename, normalize_batch — streaming DataFrames take
    unmodified batch Projects) -> watermarked key dedup (the
    reference's window+anti-join idempotency as engine state) -> file
    sink. A cross-window duplicate planted in the feed comes out
    exactly once; full-row-identical copies make the survivor choice
    invisible. This is the end-state architecture the round-1 survey
    sketched: cron + re-pull + sink-scan replaced by offsets +
    watermark state, with every transform literally shared with the
    batch path."""
    import tempfile as _tf

    from ..operators.etl import normalize_batch, project_rename
    from ..sources.datasource import AppsFlyerDataSource

    spark.dataSource.register(AppsFlyerDataSource)
    stream = (
        spark.readStream.format("appsflyer")
        .option("from_time", _HTTP_FROM)
        .option("to_time", _HTTP_TO)
        .option("window_seconds", str(_STREAM_WINDOW_S))
        .option(
            "fetcher",
            "appsflyer_to_clickhouse_spark.plans.source_queries:_stream_dup_fetch",
        )
        .load()
    )
    mapped = normalize_batch(project_rename(stream))
    deduped = mapped.withWatermark(
        "install_time", "4 hours"
    ).dropDuplicatesWithinWatermark(["appsflyer_id"])
    out = _tf.mkdtemp(prefix="spark_graft_stream_etl_") + "/sink"
    ckpt = _tf.mkdtemp(prefix="spark_graft_stream_etl_ckpt_")
    # state-store count = shuffle partitions; scope it to the dedup
    # keyspace like every stateful query in streaming_queries does
    # (each store pays open+commit+maintenance per micro-batch)
    from .streaming_queries import stream_shuffle_partitions

    with stream_shuffle_partitions(spark):
        q = (
            deduped.writeStream.format("parquet")
            .outputMode("append")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.processAllAvailable()
        q.stop()
    return spark.read.parquet(out)
