"""Join utilities for skewed keys (the salting pattern the 100 TB
brief calls out; AQE's skew-join split handles sort-merge skew at
runtime, salting is the explicit form that also works for the
build-side explosion of a hot broadcast key).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    fact_salt: Column,
    num_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``fact`` is heavily skewed on ``key``: the dim
    side is replicated once per salt (explode of a literal sequence —
    dim is small, so num_salts copies are cheap), the fact side tags
    each row with a deterministic salt in [0, num_salts), and the join
    key becomes (key, salt). A hot key's rows now spread over
    ``num_salts`` shuffle partitions instead of one straggler task.

    ``fact_salt`` must be deterministic per row (e.g.
    ``F.crc32(F.col("id").cast("string"))``) so the result is
    reproducible; the function pmods it into [0, num_salts) itself —
    a signed ``%`` here would map negative salts (``F.hash``,
    ``F.xxhash64`` — the common choices — are signed) outside the
    replicated dim range, silently DROPPING those fact rows from an
    inner join. Every fact row then matches exactly one dim replica,
    so the result set equals the unsalted join."""
    salted_dim = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1)))
    )
    salted_fact = fact.withColumn(
        "__salt", F.pmod(fact_salt.cast("int"), F.lit(num_salts))
    )
    out = salted_fact.join(salted_dim, on=[key, "__salt"], how=how)
    return out.drop("__salt")
