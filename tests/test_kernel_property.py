"""Property-based differential test (SURVEY.md §5 item 4): the Spark
``parse_datetime_lenient`` kernel vs a direct Python port of the
reference's parse_datetime (main.py:87-105), over hypothesis-generated
inputs — random garbage plus structured datetime-ish strings.

Documented divergence (pinned, not hidden): on regex-valid but
calendar-invalid values the reference RAISES from strptime
(main.py:101-103); this engine returns NULL. The Python port below
returns None where the reference would crash, and the test asserts the
crash set is exactly the regex-valid/strptime-invalid set.
"""

from __future__ import annotations

import re
from datetime import datetime

from hypothesis import given, settings
from hypothesis import strategies as st

from appsflyer_to_clickhouse_spark.functions.kernels import parse_datetime_lenient

_VALID_RE = re.compile(r"^\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}$")


def reference_parse(val):
    """Python port of reference main.py:87-105 (verified semantics:
    strip -> ci sentinel -> fraction truncate -> hour zfill -> strict
    regex -> strptime). Returns (result, would_crash)."""
    if val is None:
        return None, False
    s = str(val).strip()
    if s.lower() in ("", "null", "none", "n/a"):
        return None, False
    s = s.split(".")[0]
    m = re.match(r"^(\d{4}-\d{2}-\d{2}) (\d{1,2}):(\d{2}):(\d{2})$", s)
    if m:
        s = f"{m.group(1)} {m.group(2).zfill(2)}:{m.group(3)}:{m.group(4)}"
    if not _VALID_RE.match(s):
        return None, False
    try:
        return datetime.strptime(s, "%Y-%m-%d %H:%M:%S"), False
    except ValueError:
        return None, True  # the reference would crash here


_dt_like = st.one_of(
    st.none(),
    st.text(max_size=25),
    st.sampled_from(["", "null", " NULL ", "None", "n/a", " N/A "]),
    st.builds(
        lambda y, mo, d, h, mi, s, frac: (
            f"{y:04d}-{mo:02d}-{d:02d} {h}:{mi:02d}:{s:02d}{frac}"
        ),
        st.integers(1900, 2100),
        st.integers(0, 19),
        st.integers(0, 39),
        st.integers(0, 30),
        st.integers(0, 65),
        st.integers(0, 65),
        st.sampled_from(["", ".0", ".999", ".999999", "Z", " extra"]),
    ),
)


@settings(max_examples=30, deadline=None)
@given(st.lists(_dt_like, min_size=1, max_size=40))
def test_kernel_matches_reference_port(spark, vals):
    import pyspark.sql.functions as F

    df = spark.createDataFrame([(v,) for v in vals], "raw string")
    got = [
        r["parsed"]
        for r in df.select(
            parse_datetime_lenient(F.col("raw")).alias("parsed")
        ).collect()
    ]
    for v, g in zip(vals, got):
        expected, would_crash = reference_parse(v)
        if would_crash:
            # divergence: reference crashes, we return NULL
            assert g is None, f"{v!r}: expected NULL on calendar-invalid"
        else:
            assert g == expected, f"{v!r}: spark={g!r} reference={expected!r}"


# ---------------------------------------------------------------------------
# text_repetition's sorted-run fold vs the naive per-distinct recount
# ---------------------------------------------------------------------------

_tokens = st.lists(
    st.sampled_from(["a", "b", "c", "ab", "x1", "the"]), min_size=0, max_size=30
)


@settings(max_examples=20, deadline=None)
@given(st.lists(_tokens, min_size=1, max_size=8))
def test_repetition_fold_equals_naive_count(spark, docs):
    """The O(n) sorted-run fold that computes the top-bigram count must
    agree with the naive 'count occurrences of every distinct bigram,
    take the max' definition on arbitrary token streams."""
    from unittest import mock

    import appsflyer_to_clickhouse_spark.plans.text_queries as tq

    rows = [(i, " ".join(toks), "en", "s", len(" ".join(toks))) for i, toks in enumerate(docs)]
    frame = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    with mock.patch.object(tq, "load", lambda s, d, t: frame):
        got = {
            r["doc_id"]: r
            for r in tq.q_text_repetition(spark, "unused").collect()
        }
    for i, toks in enumerate(docs):
        bigrams = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        n = len(bigrams)
        top = max((bigrams.count(g) for g in set(bigrams)), default=0)
        assert got[i]["n_bigrams"] == n
        expect_top = round(top / n, 6) if n else 0.0
        assert got[i]["top_bigram_frac"] == expect_top, (toks, bigrams)
        expect_dup = round(1 - len(set(bigrams)) / n, 6) if n else 0.0
        assert got[i]["dup_bigram_frac"] == expect_dup
