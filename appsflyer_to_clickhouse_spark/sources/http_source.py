"""Partitioned AppsFlyer Pull-API fetch (SURVEY.md §2 Part A
``source_http_csv``; reference main.py:114-130).

The reference fetches one 2-hour window in a single blocking GET and
materializes the whole response in driver RAM — its scalability
ceiling. Here the window is split into N sub-ranges and each executor
fetches + parses its own sub-range inside ``mapInPandas``, so the data
never transits the driver and N fetches run concurrently. The time
predicate stays pushed down to the API as ``from=&to=`` query params,
exactly like the reference.

No network in tests: ``fetch_fn`` is injectable; the default is a
``requests``-backed fetcher built lazily (import gated) from
``config.PipelineConfig``.
"""

from __future__ import annotations

import csv
import io
from collections.abc import Callable, Iterator
from datetime import datetime
from urllib.parse import quote

from pyspark.sql import DataFrame, SparkSession

from ..config import PipelineConfig
from ..schemas import ADDITIONAL_FIELDS, af_raw_schema

_FMT = "%Y-%m-%d %H:%M:%S"

FetchFn = Callable[[str, str], str]
"""(from_time, to_time) -> CSV text for that sub-window."""


def build_url(cfg: PipelineConfig, from_time: str, to_time: str) -> str:
    """The reference's URL shape (main.py:115-119): v5 installs_report,
    window + timezone + additional_fields as query params."""
    return (
        f"https://hq1.appsflyer.com/api/raw-data/export/app/{cfg.app_id}"
        f"/installs_report/v5"
        f"?from={quote(from_time)}&to={quote(to_time)}"
        f"&timezone=Asia%2FHo_Chi_Minh"
        f"&additional_fields={','.join(ADDITIONAL_FIELDS)}"
    )


def http_fetch_fn(cfg: PipelineConfig) -> FetchFn:
    """Default fetcher: bearer-style auth header, text/csv accept;
    non-200 -> empty result, matching the reference's silent-failure
    semantic (main.py:122-124) but logged. Import of ``requests`` is
    gated so offline environments never pay it."""

    url_of = lambda f, t: build_url(cfg, f, t)  # noqa: E731 — closure must pickle
    token = cfg.appsflyer_token

    def fetch(from_time: str, to_time: str) -> str:
        import requests  # gated: executors only, and only on the HTTP path

        resp = requests.get(
            url_of(from_time, to_time),
            headers={"Authorization": token, "accept": "text/csv"},
            # no-timeout default would hang the executor task (hence
            # the whole job/micro-batch) forever on a stalled
            # connection; generous read budget for a large CSV window
            timeout=(10, 300),
        )
        if resp.status_code != 200:
            import sys

            print(f"appsflyer fetch error {resp.status_code}", file=sys.stderr)
            return ""
        return resp.text

    return fetch


def split_window(from_time: str, to_time: str, n: int) -> list[tuple[str, str]]:
    """Split [from, to] into n contiguous sub-windows (driver-side,
    pure). Sub-windows are [start, next_start - 1s] so the inclusive
    API semantics (SURVEY.md §2 filter_time_range_pushdown) never
    double-count a boundary second; the last window ends at ``to``."""
    from datetime import timedelta

    f = datetime.strptime(from_time, _FMT)
    t = datetime.strptime(to_time, _FMT)
    # fewer seconds than splits -> the -1s interior adjustment would
    # invert sub-windows (end < start); fall back to a single window
    if (t - f).total_seconds() < n or n <= 1:
        return [(from_time, to_time)]
    bounds = [f + (t - f) * i / n for i in range(n)] + [t]
    result = []
    for i in range(n):
        start = bounds[i]
        end = bounds[i + 1] if i == n - 1 else bounds[i + 1] - timedelta(seconds=1)
        result.append((start.strftime(_FMT), end.strftime(_FMT)))
    return result


def parse_af_csv_text(text: str) -> list[dict[str, str]]:
    """Reference-parity CSV parse (main.py:125-129): DictReader, BOM
    stripped from field names, rows as string dicts."""
    if not text.strip():
        return []
    reader = csv.DictReader(io.StringIO(text))
    if reader.fieldnames:
        reader.fieldnames = [h.strip("﻿") for h in reader.fieldnames]
    return list(reader)


def fetch_installs_distributed(
    spark: SparkSession,
    from_time: str,
    to_time: str,
    fetch_fn: FetchFn,
    num_splits: int = 8,
) -> DataFrame:
    """Distributed windowed fetch: one task per sub-window, each
    fetching and parsing its own CSV via ``mapInPandas`` (Arrow-batched;
    the per-partition imperative logic Spark's built-ins can't express).
    Returns the 49-column raw string frame (af_raw_schema); columns the
    API didn't send come back NULL, extra API columns are dropped —
    the reference's mapping-loop tolerance (main.py:160-161)."""
    import pandas as pd  # local import: executors re-import cheaply

    # round-robin repartition, NOT hash-by-split_id: pmod(hash(id), n)
    # over n ids is not a permutation, so hash partitioning co-locates
    # 2+ windows on one task (sequential fetches) while other slots
    # sit empty — round-robin places exactly one window per task,
    # which IS the claimed N-way fetch concurrency
    ranges = spark.createDataFrame(
        [(i, f, t) for i, (f, t) in enumerate(split_window(from_time, to_time, num_splits))],
        "split_id int, from_time string, to_time string",
    ).repartition(num_splits)

    schema = af_raw_schema()
    cols = [f.name for f in schema.fields]

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            frames = []
            for row in pdf.itertuples(index=False):
                rows = parse_af_csv_text(fetch_fn(row.from_time, row.to_time))
                frames.append(
                    pd.DataFrame(
                        {c: [r.get(c) for r in rows] for c in cols}, dtype=object
                    )
                )
            yield (
                pd.concat(frames, ignore_index=True)
                if frames
                else pd.DataFrame({c: [] for c in cols}, dtype=object)
            )

    return ranges.mapInPandas(gen, schema)
