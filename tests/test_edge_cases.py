"""Edge-case pins: empty-batch short-circuit, falsy-key drops, column
reorder corners — the reference behaviors that only show up on unusual
inputs (SURVEY.md §5 item 2).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F
from pyspark.sql import types as T

from appsflyer_to_clickhouse_spark.operators.etl import (
    dedup_anti_join,
    reorder_campaignid,
)
from appsflyer_to_clickhouse_spark.schemas import ch_sink_schema
from appsflyer_to_clickhouse_spark.sinks.parquet_sink import write_sink


def test_reorder_campaignid_moves_after_media_source():
    assert reorder_campaignid(["a", "media_source", "b", "campaignid"]) == [
        "a", "media_source", "campaignid", "b",
    ]


def test_reorder_campaignid_noop_without_either_column():
    assert reorder_campaignid(["a", "b"]) == ["a", "b"]
    # campaignid present but media_source missing: unchanged, no crash
    # (the reference would raise ValueError here — main.py:148-154)
    assert reorder_campaignid(["a", "campaignid"]) == ["a", "campaignid"]


def test_write_sink_skips_empty_batch(spark):
    """Reference main.py:183 skips the INSERT when 0 rows survive; the
    parquet sink must not create files for an empty frame."""
    empty = spark.createDataFrame([], ch_sink_schema())
    path = tempfile.mkdtemp(prefix="empty_sink_")
    write_sink(empty, path, mode="append")
    assert os.listdir(path) == []


def test_anti_join_drops_falsy_keys(spark):
    batch = spark.createDataFrame(
        [("a", 1), ("", 2), (None, 3), ("b", 4)],
        T.StructType(
            [
                T.StructField("appsflyer_id", T.StringType()),
                T.StructField("n", T.IntegerType()),
            ]
        ),
    )
    existing = spark.createDataFrame([("b",)], "appsflyer_id string")
    out = dedup_anti_join(batch, existing)
    assert [r["appsflyer_id"] for r in out.collect()] == ["a"]


def test_anti_join_keeps_within_batch_duplicates(spark):
    """The reference quirk (main.py:179-180): two same-ID rows in one
    batch BOTH survive the sink anti-join."""
    batch = spark.createDataFrame(
        [("x", 1), ("x", 2)], "appsflyer_id string, n int"
    )
    existing = spark.createDataFrame([], "appsflyer_id string")
    assert dedup_anti_join(batch, existing).count() == 2


def test_sentinel_asymmetry_between_kernels(spark):
    """'NULL' (exact-case miss) survives string normalization but the
    datetime kernel nulls it case-insensitively (SURVEY.md §7)."""
    from appsflyer_to_clickhouse_spark.functions.kernels import (
        null_sentinel_normalize,
        parse_datetime_lenient,
    )

    df = spark.createDataFrame([("NULL",), (" null ",)], "raw string")
    out = df.select(
        null_sentinel_normalize(F.col("raw")).alias("s"),
        parse_datetime_lenient(F.col("raw")).alias("d"),
    ).collect()
    assert [r["s"] for r in out] == ["NULL", " null "]  # strings pass through
    assert [r["d"] for r in out] == [None, None]  # datetimes null out


def test_text_repetition_degenerate_docs(spark):
    """Empty / single-token / all-identical docs: fractions must hit
    their closed-form values, never NULL or divide-by-zero."""
    from appsflyer_to_clickhouse_spark.plans.text_queries import (
        q_text_repetition,
    )

    docs = spark.createDataFrame(
        [
            (1, "", "en", "s", 0),
            (2, "word", "en", "s", 4),
            (3, "spam spam spam spam", "en", "s", 19),
            (4, "all words differ here", "en", "s", 21),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.createOrReplaceTempView("__rep_docs")

    # call the kernel directly on a substitute frame
    import appsflyer_to_clickhouse_spark.plans.text_queries as tq
    from unittest import mock

    with mock.patch.object(tq, "load", lambda s, d, t: docs):
        out = {r["doc_id"]: r for r in q_text_repetition(spark, "unused").collect()}

    assert out[1]["n_bigrams"] == 0 and out[1]["dup_bigram_frac"] == 0.0
    assert out[2]["n_bigrams"] == 0 and out[2]["top_bigram_frac"] == 0.0
    # "spam spam spam spam": 3 bigrams all identical
    assert out[3]["n_bigrams"] == 3
    assert out[3]["dup_bigram_frac"] == round(1 - 1 / 3, 6)
    assert out[3]["top_bigram_frac"] == 1.0
    # fully distinct bigrams
    assert out[4]["dup_bigram_frac"] == 0.0
    assert out[4]["top_bigram_frac"] == round(1 / 3, 6)


def test_dedup_exact_normalized_collapses_variants(spark):
    """Case / punctuation / whitespace variants map to one key; the
    survivor is the min doc_id."""
    from unittest import mock

    import appsflyer_to_clickhouse_spark.plans.dedup_queries as dq

    docs = spark.createDataFrame(
        [
            (10, "Hello,   World!"),
            (11, "hello world"),
            (12, "HELLO-WORLD"),
            (13, "different text"),
        ],
        "doc_id long, text string",
    )
    with mock.patch.object(dq, "load", lambda s, d, t: docs):
        rows = dq.q_dedup_exact_normalized(spark, "unused").collect()
    by_keep = {r["keep_doc_id"]: r["n_copies"] for r in rows}
    assert by_keep == {10: 3, 13: 1}


def test_group_fingerprint_all_null_group_yields_null(spark):
    """SQL aggregate NULL semantics (ADVICE r4): a group whose payloads
    are ALL NULL must return NULL total_bytes/group_md5 — matching the
    oracle's sum(octet_length)/string_agg, which skip NULLs and yield
    NULL over an empty input set. Mixed groups skip the NULLs."""
    import hashlib

    from appsflyer_to_clickhouse_spark.multimodal.columns import (
        group_binary_fingerprint,
    )

    df = spark.createDataFrame(
        [
            (1, "a", bytearray(b"x")),
            (2, "a", None),
            (3, "b", None),
            (4, "b", None),
        ],
        "doc_id long, source string, payload binary",
    )
    out = {r["source"]: r for r in group_binary_fingerprint(df).collect()}
    # all-NULL group: NULL aggregates, count still 2
    assert out["b"]["n_docs"] == 2
    assert out["b"]["total_bytes"] is None
    assert out["b"]["group_md5"] is None
    # mixed group: NULL payload skipped from sum and digest
    assert out["a"]["total_bytes"] == 1
    expect = hashlib.md5(hashlib.md5(b"x").hexdigest().encode()).hexdigest()
    assert out["a"]["group_md5"] == expect
