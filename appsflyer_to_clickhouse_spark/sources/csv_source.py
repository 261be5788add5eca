"""Local CSV source with the reference's header semantics
(reference main.py:125-129): header row, all values strings, UTF-8 BOM
stripped from the first header cell.

Spark's CSV reader is distributed and splittable — a 100 TB CSV drop
parallelizes by file block, unlike the reference's single
``StringIO``-in-RAM parse.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_af_csv(spark: SparkSession, path: str) -> DataFrame:
    """Read an AppsFlyer-shaped CSV: header=True, every column a
    nullable string (no inferSchema — nondeterministic at scale,
    SURVEY.md §1.2), empty string kept as empty (the reference
    distinguishes '' from missing; sentinel handling is the kernels'
    job, not the reader's).

    BOM: Spark's UTF-8 text reader does not strip a BOM from the first
    header cell, so we replicate reference main.py:128 explicitly —
    ``h.strip('\\ufeff')`` on field names — by renaming any
    BOM-prefixed first column."""
    df = (
        spark.read.option("header", True)
        .option("inferSchema", False)
        # Spark's default nullValue is "" (empty -> NULL); the reference's
        # DictReader yields '' for empty cells. Point nullValue at a
        # sentinel that never occurs so '' survives the read.
        .option("nullValue", "\u0001")
        .option("emptyValue", "")
        .csv(path)
    )
    renames = {c: c.strip("﻿") for c in df.columns if c != c.strip("﻿")}
    for old, new in renames.items():
        df = df.withColumnRenamed(old, new)
    return df


def write_fixture_csv(path: str, header: list[str], rows: list[list[str]],
                      bom: bool = True) -> str:
    """Write a small deterministic CSV fixture (driver-side; test/demo
    only — engine code never collects data to write CSVs). ``bom``
    prepends U+FEFF to the first header cell like the AppsFlyer export
    does."""
    p = Path(path)
    p.parent.mkdir(parents=True, exist_ok=True)
    head = ",".join(header)
    if bom:
        head = "﻿" + head
    # Empty cells are written quoted ("") so every CSV parser —
    # Spark's univocity (via emptyValue) and the reference's
    # DictReader alike — reads them as '', not NULL.
    body = "\n".join(
        ",".join('""' if v == "" else v for v in r) for r in rows
    )
    p.write_text(head + "\n" + body + "\n", encoding="utf-8")
    return str(p)


def strip_bom_header(df: DataFrame) -> DataFrame:
    """Standalone header-BOM normalizer (reference main.py:128) for
    frames read elsewhere."""
    out = df
    for c in df.columns:
        clean = c.strip("﻿")
        if clean != c:
            out = out.withColumnRenamed(c, clean)
    return out


def column_as_string(df: DataFrame) -> DataFrame:
    """Defensive cast-to-string of every column (the reference's
    stringly-typed contract, SURVEY.md §1.2)."""
    return df.select(*[F.col(f"`{c}`").cast("string").alias(c) for c in df.columns])
