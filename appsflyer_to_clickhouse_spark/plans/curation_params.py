"""Shared curation constants, registration-free.

Lives apart from ``curation_queries`` so modules that register earlier
(``pipeline_queries``) can import the parameters without importing the
query module — importing a query module registers its queries, and
registration ORDER is load-bearing (see ``plans/__init__``).
"""

from __future__ import annotations

# per-language keep rates: the standard corpus-mixing move (keep all of
# the low-resource strata, downsample the dominant one)
RATES = {"en": 0.5, "de": 1.0, "es": 1.0, "fr": 1.0, "zh": 0.25}

RATE_SQL = (
    "CASE lang "
    + " ".join(f"WHEN '{k}' THEN {v}" for k, v in RATES.items())
    + " ELSE 1.0 END"
)


def rate_column():
    """The Spark twin of ``RATE_SQL``: per-language keep rate as a
    when() chain over ``lang``. ONE definition beside the SQL text so
    the standalone sample (curation_queries) and the composite
    pipeline (pipeline_queries) cannot drift — they previously built
    this chain independently."""
    from pyspark.sql import functions as F

    rate = F.lit(1.0)
    for k, v in RATES.items():
        rate = F.when(F.col("lang") == k, F.lit(v)).otherwise(rate)
    return rate

# 2^60 as a double is exact; hash60 < 2^60, so u = hash/2^60 is the
# same IEEE-754 quotient in both engines (no rounding slop to paper
# over with round()).
TWO60 = float(1 << 60)
