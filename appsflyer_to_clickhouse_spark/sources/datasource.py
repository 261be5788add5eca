"""AppsFlyer Pull API as a first-class Spark DataSource (PySpark 4
Python Data Source API) — reference main.py:114-130 re-expressed as a
pluggable ``spark.read.format("appsflyer")``.

Where ``sources/http_source.py`` drives the partitioned fetch through
``mapInPandas`` over a ranges frame, this wraps the SAME window-split +
CSV-parse kernels in the engine's own source contract: Catalyst sees a
real scan node, each ``InputPartition`` is one API sub-window fetched
executor-side, and downstream ops compose like any other source. The
time predicate stays pushed into the API as ``from=&to=`` params —
partition construction IS the pushdown.

The fetcher is injectable as a ``fetcher`` option holding a
``module:attribute`` dotted path (resolved on the EXECUTOR, so the
DataSource stays picklable and tests run without network); unset, it
builds the real requests-backed fetcher from ``config.resolve_config``.

Scale: partitions = num_splits independent HTTP ranges, so a
1000-executor cluster fans one export window into 1000 concurrent
bounded fetches with zero driver materialization — the reference's
single blocking driver-RAM GET is the ceiling this removes.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from ..schemas import af_raw_schema
from .http_source import FetchFn, parse_af_csv_text, split_window


class _WindowPartition(InputPartition):
    """One API sub-window = one input split."""

    def __init__(self, from_time: str, to_time: str):
        self.from_time = from_time
        self.to_time = to_time


def _resolve_fetcher(spec: str) -> FetchFn:
    if not spec:
        from ..config import resolve_config
        from .http_source import http_fetch_fn

        return http_fetch_fn(resolve_config())
    mod_name, _, attr = spec.partition(":")
    import importlib

    return getattr(importlib.import_module(mod_name), attr)


class AppsFlyerDataSource(DataSource):
    """``spark.read.format("appsflyer")`` — options: ``from_time``,
    ``to_time`` ('%Y-%m-%d %H:%M:%S'), ``num_splits`` (default 8),
    ``fetcher`` (``module:attr`` override for tests).

    Window contract differs by mode (both at 1-second API granularity):

    * **batch** (``spark.read``): INCLUSIVE ``[from_time, to_time]`` —
      the reference's one-shot pull semantics (main.py:107-112).
    * **streaming** (``spark.readStream``): HALF-OPEN
      ``[from_time, to_time)`` — ``to_time`` is the offset horizon, so
      the boundary second belongs to the NEXT micro-batch/run and is
      fetched exactly once across restarts (see ``_stream_windows``).

    A batch and a streaming read of identical options therefore differ
    by exactly the final boundary second; a streaming backfill chained
    into a batch tail should hand off at the same instant
    (batch ``from_time`` = streaming ``to_time``)."""

    @classmethod
    def name(cls) -> str:
        return "appsflyer"

    def schema(self):
        return af_raw_schema()

    def reader(self, schema) -> "_AppsFlyerReader":
        return _AppsFlyerReader(schema, self.options)

    def streamReader(self, schema) -> "_AppsFlyerStreamReader":
        return _AppsFlyerStreamReader(schema, self.options)


def _read_window(
    fetcher_spec: str, cols: list[str], partition: "_WindowPartition"
) -> Iterator[tuple]:
    """Fetch + parse + materialize one window's rows. The SINGLE
    row-materialization path for both the batch and streaming readers
    — a coercion fix here reaches both source tiers by construction."""
    fetch = _resolve_fetcher(fetcher_spec)
    for row in parse_af_csv_text(
        fetch(partition.from_time, partition.to_time)
    ):
        yield tuple(row.get(c) for c in cols)


class _AppsFlyerReader(DataSourceReader):
    def __init__(self, schema, options):
        self._cols = [f.name for f in schema.fields]
        self._from = options["from_time"]
        self._to = options["to_time"]
        self._splits = int(options.get("num_splits", "8"))
        self._fetcher_spec = options.get("fetcher", "")

    def partitions(self) -> list[_WindowPartition]:
        return [
            _WindowPartition(f, t)
            for f, t in split_window(self._from, self._to, self._splits)
        ]

    def read(self, partition: _WindowPartition) -> Iterator[tuple]:
        return _read_window(self._fetcher_spec, self._cols, partition)


# ---------------------------------------------------------------------------
# streaming reader — the reference's cron loop as an offset-tracked source
# ---------------------------------------------------------------------------

from datetime import datetime, timedelta  # noqa: E402

from pyspark.sql.datasource import DataSourceStreamReader  # noqa: E402

_TS_FMT = "%Y-%m-%d %H:%M:%S"


def _stream_windows(
    start: str, end: str, window_seconds: int
) -> list[tuple[str, str]]:
    """FETCH windows covering the half-open offset range [start, end):
    the offset axis advances in [t, t+w) steps, but the AppsFlyer API
    is INCLUSIVE on both bounds (split_window's docstring pins this),
    so each window's fetch `to` is its offset end minus 1 s —
    otherwise the boundary second is returned by BOTH abutting
    windows, and also re-fetched by the NEXT micro-batch (whose first
    window starts at this batch's committed end). At 1-second API
    granularity, inclusive [t, t+w-1s] == half-open [t, t+w) exactly.
    Window boundaries are a pure function of (start, w), so
    replanning a batch after restart yields identical partitions."""
    s = datetime.strptime(start, _TS_FMT)
    e = datetime.strptime(end, _TS_FMT)
    out = []
    while s < e:
        nxt = min(s + timedelta(seconds=window_seconds), e)
        fetch_to = max(nxt - timedelta(seconds=1), s)
        out.append((s.strftime(_TS_FMT), fetch_to.strftime(_TS_FMT)))
        s = nxt
    return out


class _AppsFlyerStreamReader(DataSourceStreamReader):
    """The reference's operating model — a cron job re-pulling a
    2-hour window every run and anti-joining the sink to stay
    idempotent (main.py:107-112, 172-180) — re-expressed as a
    Structured Streaming SOURCE: the time axis IS the offset. Each
    run's horizon (``to_time``, "now" in production) becomes
    ``latestOffset``; Spark's offset log records what was committed,
    so the next run plans partitions(committed, now) and fetches ONLY
    the new windows — exactly-once across restarts with NO sink
    re-scan at all (the anti-join devolves to a safety net for
    API-side restatement). Each window is one InputPartition fetched
    executor-side; a 1000-executor cluster drains a long backfill
    window-parallel."""

    def __init__(self, schema, options):
        self._cols = [f.name for f in schema.fields]
        self._from = options["from_time"]
        self._to = options["to_time"]
        self._window_s = int(options.get("window_seconds", "7200"))
        self._fetcher_spec = options.get("fetcher", "")

    def initialOffset(self) -> dict:
        return {"t": self._from}

    def latestOffset(self) -> dict:
        return {"t": self._to}

    def partitions(self, start: dict, end: dict) -> list[_WindowPartition]:
        return [
            _WindowPartition(f, t)
            for f, t in _stream_windows(start["t"], end["t"], self._window_s)
        ]

    def read(self, partition: _WindowPartition) -> Iterator[tuple]:
        return _read_window(self._fetcher_spec, self._cols, partition)

    def commit(self, end: dict) -> None:
        pass  # the engine's offset log is the source of truth
